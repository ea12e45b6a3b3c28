"""Mixup / CutMix, in-jit (reference uses timm.data.Mixup, engines.py:135-141).

Returns mixed inputs and *soft* targets; pair with the soft-target
cross-entropy (train/losses.py), mirroring the reference's
SoftTargetCrossEntropy path (engines.py:183-189).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _one_hot_smoothed(labels, num_classes, smoothing):
    off = smoothing / num_classes
    on = 1.0 - smoothing + off
    return jax.nn.one_hot(labels, num_classes) * (on - off) + off


def mixup_cutmix(x, labels, key, *, num_classes: int, mixup_alpha: float = 0.0,
                 cutmix_alpha: float = 0.0, switch_prob: float = 0.5,
                 smoothing: float = 0.0):
    """Batch-mode mixup/cutmix (timm 'batch' mode): one lambda per batch,
    partner is the flipped batch. Either augmentation may be disabled by
    a zero alpha. Returns (x_mixed, soft_targets)."""
    y = _one_hot_smoothed(labels, num_classes, smoothing)
    if mixup_alpha <= 0.0 and cutmix_alpha <= 0.0:
        return x, y
    k_lam, k_switch, k_box = jax.random.split(key, 3)
    use_cutmix_possible = cutmix_alpha > 0.0
    use_mixup_possible = mixup_alpha > 0.0
    if use_cutmix_possible and use_mixup_possible:
        use_cutmix = jax.random.bernoulli(k_switch, switch_prob)
    else:
        use_cutmix = jnp.asarray(use_cutmix_possible)

    a_mix = max(mixup_alpha, 1e-6)
    a_cut = max(cutmix_alpha, 1e-6)
    lam_mix = jax.random.beta(k_lam, a_mix, a_mix)
    lam_cut = jax.random.beta(k_lam, a_cut, a_cut)

    x_flip = x[::-1]
    y_flip = y[::-1]

    # mixup branch
    x_mixup = lam_mix * x + (1 - lam_mix) * x_flip

    # cutmix branch: random box with area (1 - lam)
    b, h, w, c = x.shape
    ratio = jnp.sqrt(1.0 - lam_cut)
    cut_h = (h * ratio).astype(jnp.int32)
    cut_w = (w * ratio).astype(jnp.int32)
    ky, kx = jax.random.split(k_box)
    cy = jax.random.randint(ky, (), 0, h)
    cx = jax.random.randint(kx, (), 0, w)
    y0 = jnp.clip(cy - cut_h // 2, 0, h)
    y1 = jnp.clip(cy + cut_h // 2, 0, h)
    x0 = jnp.clip(cx - cut_w // 2, 0, w)
    x1 = jnp.clip(cx + cut_w // 2, 0, w)
    rows = jnp.arange(h)[None, :, None, None]
    cols = jnp.arange(w)[None, None, :, None]
    in_box = (rows >= y0) & (rows < y1) & (cols >= x0) & (cols < x1)
    x_cutmix = jnp.where(in_box, x_flip, x)
    lam_cut_eff = 1.0 - ((y1 - y0) * (x1 - x0)) / (h * w)

    x_out = jnp.where(use_cutmix, x_cutmix, x_mixup)
    lam = jnp.where(use_cutmix, lam_cut_eff, lam_mix)
    y_out = lam * y + (1 - lam) * y_flip
    return x_out, y_out
