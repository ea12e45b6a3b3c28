"""In-jit batch augmentations: Mixup/CutMix, RandAugment, RandomErasing.

The reference gets these from timm: `Mixup` (engines.py:135-141) and
`create_transform(auto_augment='rand-m9-mstd0.5-inc1',
re_prob=...)` (datasets.py:43-81, the DeiT recipe). Host-side
per-sample PIL transforms would serialize the input pipeline on TPU;
here every augmentation is vectorized over the batch inside the jitted
train step.

RandAugment design: each sample draws `num_ops` (op, magnitude) rounds.
Every op is expressed as (affine matrix, color function); per round one
bilinear warp applies the selected geometry and a `lax.switch` applies
the selected color transform, so the cost per round is one gather-warp
plus one fused pointwise op regardless of which op was drawn.

Returns mixed inputs and *soft* targets for mixup/cutmix; pair with the
soft-target cross-entropy (train/losses.py), mirroring the reference's
SoftTargetCrossEntropy path (engines.py:183-189).
"""

from __future__ import annotations

from functools import partial

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


# ---------------------------------------------------------------------------
# RandAugment (timm 'rand-mN-mstdS' policy, in-jit)

_MAX_LEVEL = 10.0
_FILL = 0.5  # grey fill for out-of-bounds warp samples (timm fill=128)


def _affine_warp(img, mat):
    """Bilinear-sample one image [H, W, C] through a 2x3 inverse affine
    matrix mapping output pixel -> source pixel, grey fill outside."""
    h, w, c = img.shape
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    sx = mat[0, 0] * (xx - cx) + mat[0, 1] * (yy - cy) + mat[0, 2] + cx
    sy = mat[1, 0] * (xx - cx) + mat[1, 1] * (yy - cy) + mat[1, 2] + cy
    x0 = jnp.floor(sx); y0 = jnp.floor(sy)
    fx = sx - x0; fy = sy - y0
    x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        v = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(inside[..., None], v, _FILL)

    out = ((1 - fx) * (1 - fy))[..., None] * tap(y0i, x0i) \
        + (fx * (1 - fy))[..., None] * tap(y0i, x0i + 1) \
        + ((1 - fx) * fy)[..., None] * tap(y0i + 1, x0i) \
        + (fx * fy)[..., None] * tap(y0i + 1, x0i + 1)
    return out


def _blend(a, b, factor):
    return jnp.clip(b + factor * (a - b), 0.0, 1.0)


def _identity_mat(_):
    return jnp.eye(2, 3)


def _rotate_mat(level):
    deg = (level / _MAX_LEVEL) * 30.0
    th = -deg * jnp.pi / 180.0  # inverse map
    return jnp.array([[jnp.cos(th), -jnp.sin(th), 0.0],
                      [jnp.sin(th), jnp.cos(th), 0.0]])


def _shear_x_mat(level):
    s = (level / _MAX_LEVEL) * 0.3
    return jnp.array([[1.0, -s, 0.0], [0.0, 1.0, 0.0]])


def _shear_y_mat(level):
    s = (level / _MAX_LEVEL) * 0.3
    return jnp.array([[1.0, 0.0, 0.0], [-s, 1.0, 0.0]])


def _translate_x_mat(level):
    t = (level / _MAX_LEVEL) * 0.45
    return jnp.array([[1.0, 0.0, -t], [0.0, 1.0, 0.0]])


def _translate_y_mat(level):
    t = (level / _MAX_LEVEL) * 0.45
    return jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, -t]])


def _autocontrast(img, _):
    lo = jnp.min(img, axis=(0, 1), keepdims=True)
    hi = jnp.max(img, axis=(0, 1), keepdims=True)
    scale = jnp.where(hi > lo, 1.0 / jnp.maximum(hi - lo, 1e-6), 1.0)
    return jnp.clip((img - lo) * scale, 0.0, 1.0)


def _posterize(img, level):
    # 'inc1' direction: more magnitude removes more bits (4 -> 0 kept of 8)
    bits = 8 - (level / _MAX_LEVEL) * 4.0
    q = 2.0 ** (8.0 - jnp.floor(bits))  # quantization step in /255 units
    return jnp.floor(img * 255.0 / q) * q / 255.0


def _solarize(img, level):
    thr = 1.0 - (level / _MAX_LEVEL)
    return jnp.where(img >= thr, 1.0 - img, img)


def _solarize_add(img, level):
    add = (level / _MAX_LEVEL) * (110.0 / 255.0)
    return jnp.where(img < 0.5, jnp.clip(img + add, 0.0, 1.0), img)


def _enhance_factor(level):
    return 1.0 + (level / _MAX_LEVEL) * 0.9  # timm inc1: 1.0 -> 1.9


def _color(img, level):
    grey = jnp.mean(img, axis=-1, keepdims=True) * jnp.ones_like(img)
    return _blend(img, grey, _enhance_factor(level))


def _contrast(img, level):
    mean = jnp.mean(img, axis=(0, 1, 2), keepdims=True)
    return _blend(img, mean * jnp.ones_like(img), _enhance_factor(level))


def _brightness(img, level):
    return _blend(img, jnp.zeros_like(img), _enhance_factor(level))


def _sharpness(img, level):
    k = jnp.array([[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]]) / 13.0
    c = img.shape[-1]
    blur = jax.lax.conv_general_dilated(
        img[None], jnp.tile(k[:, :, None, None], (1, 1, 1, c)),
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)[0]
    return _blend(img, blur, _enhance_factor(level))


def _nocolor(img, _):
    return img

# op table: (matrix_fn, color_fn); geometric ops have identity color and
# color ops identity geometry — one warp + one switch per round.
_RA_OPS = (
    (_identity_mat, _autocontrast),   # AutoContrast
    (_identity_mat, _posterize),      # Posterize
    (_identity_mat, _solarize),       # Solarize
    (_identity_mat, _solarize_add),   # SolarizeAdd
    (_identity_mat, _color),          # Color/saturation
    (_identity_mat, _contrast),       # Contrast
    (_identity_mat, _brightness),     # Brightness
    (_identity_mat, _sharpness),      # Sharpness
    (_rotate_mat, _nocolor),          # Rotate
    (_shear_x_mat, _nocolor),         # ShearX
    (_shear_y_mat, _nocolor),         # ShearY
    (_translate_x_mat, _nocolor),     # TranslateX
    (_translate_y_mat, _nocolor),     # TranslateY
)


def rand_augment(x, key, *, num_ops: int = 2, magnitude: float = 9.0,
                 mag_std: float = 0.5):
    """timm-style RandAugment on a float batch [B, H, W, C] in [0, 1]
    (reference recipe 'rand-m9-mstd0.5-inc1', datasets.py:52-60)."""
    b = x.shape[0]
    n_ops = len(_RA_OPS)
    color_fns = [f for _, f in _RA_OPS]
    mat_fns = [m for m, _ in _RA_OPS]

    def one_round(img, k):
        k_op, k_mag, k_sign = jax.random.split(k, 3)
        op = jax.random.randint(k_op, (), 0, n_ops)
        lvl = jnp.clip(magnitude + mag_std * jax.random.normal(k_mag),
                       0.0, _MAX_LEVEL)
        # geometric ops are randomly mirrored (timm: random negate of the
        # signed level); color ops use the unsigned level ('inc1' mode)
        sgn = jnp.where(jax.random.bernoulli(k_sign), 1.0, -1.0)
        mats = jnp.stack([m(sgn * lvl) for m in mat_fns])
        img = _affine_warp(img, mats[op])
        return jax.lax.switch(op, color_fns, img, lvl)

    def per_image(img, k):
        ks = jax.random.split(k, num_ops)
        for i in range(num_ops):
            img = one_round(img, ks[i])
        return img

    keys = jax.random.split(key, b)
    return jax.vmap(per_image)(x, keys)


def random_erasing(x, key, *, prob: float = 0.25, area_range=(0.02, 1 / 3),
                   aspect_range=(0.3, 10 / 3)):
    """timm RandomErasing ('pixel' mode): per-sample random box filled
    with gaussian noise, applied after normalization
    (reference datasets.py re_prob/re_mode, engines default 0.25)."""
    b, h, w, c = x.shape
    k_apply, k_area, k_aspect, k_y, k_x, k_noise = jax.random.split(key, 6)
    apply = jax.random.bernoulli(k_apply, prob, (b,))
    area = jax.random.uniform(k_area, (b,), minval=area_range[0],
                              maxval=area_range[1]) * (h * w)
    log_r = jax.random.uniform(k_aspect, (b,),
                               minval=jnp.log(aspect_range[0]),
                               maxval=jnp.log(aspect_range[1]))
    ratio = jnp.exp(log_r)
    eh = jnp.clip(jnp.round(jnp.sqrt(area * ratio)), 1, h).astype(jnp.int32)
    ew = jnp.clip(jnp.round(jnp.sqrt(area / ratio)), 1, w).astype(jnp.int32)
    y0 = (jax.random.uniform(k_y, (b,)) * (h - eh + 1)).astype(jnp.int32)
    x0 = (jax.random.uniform(k_x, (b,)) * (w - ew + 1)).astype(jnp.int32)
    rows = jnp.arange(h)[None, :, None]
    cols = jnp.arange(w)[None, None, :]
    in_box = ((rows >= y0[:, None, None]) & (rows < (y0 + eh)[:, None, None])
              & (cols >= x0[:, None, None]) & (cols < (x0 + ew)[:, None, None]))
    mask = (in_box & apply[:, None, None])[..., None]
    noise = jax.random.normal(k_noise, x.shape, x.dtype)
    return jnp.where(mask, noise, x)
