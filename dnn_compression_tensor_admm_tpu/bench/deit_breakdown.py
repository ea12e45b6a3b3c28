"""Per-op breakdown of the DeiT ADMM bench step (deit_tt2 config).

Round-4 verdict weak #3: the ViT workload had a headline number
(46 it/s @ b128 ~ 11% MFU) and no investigation. This harness slope-fits
the pieces of the train step the same way BENCHNOTES did for resnet32:
every component is timed inside a `lax.scan` with a data-dependent carry
(XLA hoists loop-invariant work out of scans), at two scan lengths, and
the per-iteration cost is the slope — dispatch and constant overheads
cancel. `jax.block_until_ready` is not a device barrier under the axon
plugin; `utils/profiling.py::device_sync` (host fetch) is.

Components:
  fwd            dense deit-tiny forward, b128 (the ADMM X-step forward)
  fwd_bwd        + loss + grad (no ADMM penalty)
  fwd_bwd_pen    + ADMM penalty over the 48 target linears (full loss)
  penalty_grad   penalty-only grad (isolates the 48-layer tree walk)
  input_pipe     per-step sampling + on-device augmentation
  matmul_proxy   the 6 encoder matmul shapes at the step's token count,
                 pure MXU chain -> the matmul-only ceiling
  ln_softmax     LayerNorm+softmax VPU proxy at encoder shapes

Run: python -m dnn_compression_tensor_admm_tpu.bench.deit_breakdown
(defaults to whatever backend jax selects; numbers in BENCHNOTES are
from the real v5e chip).
"""

from __future__ import annotations

import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

B = 128
IMG = 224
DIM = 192
HEADS = 3
DEPTH = 12
TOKENS = 197


def _sync(x):
    from ..utils.profiling import device_sync
    device_sync(x)


def scan_time(body, init, n: int) -> float:
    """Wall seconds for a jitted scan of `body` over n iterations."""
    f = jax.jit(lambda c: jax.lax.scan(lambda c, _: (body(c), None), c,
                                       None, length=n)[0])
    c = f(init)
    _sync(c)
    t0 = time.perf_counter()
    c = f(init)
    _sync(c)
    return time.perf_counter() - t0


def slope_ms(body, init, n1: int = 8, n2: int = 24) -> float:
    """Per-iteration ms via two-length slope fit."""
    t1 = scan_time(body, init, n1)
    t2 = scan_time(body, init, n2)
    return 1000.0 * (t2 - t1) / (n2 - n1)


def flops_encoder_fwd(b=B, n=TOKENS, d=DIM, depth=DEPTH) -> float:
    """Matmul FLOPs of one dense forward (encoder only)."""
    h = HEADS
    hd = d // h
    per_block = (
        2 * b * n * d * 3 * d          # qkv
        + 2 * b * h * n * n * hd * 2   # q@kT and attn@v
        + 2 * b * n * d * d            # proj
        + 2 * b * n * d * 4 * d * 2    # fc1, fc2
    )
    return depth * per_block


def main():
    from ..admm import admm_init, admm_penalty, build_program
    from ..configs.resolver import get_rank_plan
    from ..data.device_pipeline import augment_batch, sample_batch
    from ..data.datasets import load_dataset
    from ..models import create_model

    rows = {}
    model = create_model("deit_tiny_patch16_224", num_classes=1000,
                         dtype=jnp.bfloat16)
    x0 = jnp.zeros((B, IMG, IMG, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    params = variables["params"]
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))

    # --- forward ---------------------------------------------------------
    def fwd_body(c):
        x, s = c
        y = model.apply({"params": params}, x + s * 1e-6, train=False)
        return (x, jnp.mean(y).astype(jnp.float32))

    rows["fwd"] = slope_ms(fwd_body, (x0, jnp.float32(0)), 4, 12)

    # --- forward+backward (no penalty) ------------------------------------
    labels = jnp.zeros((B,), jnp.int32)

    def loss_no_pen(p, x):
        logits = model.apply({"params": p}, x, train=False)
        lse = jax.scipy.special.logsumexp(logits.astype(jnp.float32), -1)
        return jnp.mean(lse - jnp.take_along_axis(
            logits.astype(jnp.float32), labels[:, None], 1)[:, 0])

    def grad_scalar(g):
        # consume EVERY grad leaf: folding only one leaf into the carry
        # lets XLA dead-code-eliminate the unused weight-grad matmuls
        # (measured: ~3 ms/step of backward vanished from the row)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in
                   jax.tree_util.tree_leaves(g))

    def fwd_bwd_body(c):
        x, s = c
        l, g = jax.value_and_grad(loss_no_pen)(params, x + s * 1e-6)
        return (x, l + grad_scalar(g))

    rows["fwd_bwd"] = slope_ms(fwd_bwd_body, (x0, jnp.float32(0)), 4, 12)

    # --- forward+backward in TRAIN mode (drop-path bernoulli per block,
    # the configuration the bench's ADMM X-step actually runs) ----------
    def loss_train(p, x, key):
        logits = model.apply({"params": p}, x, train=True,
                             rngs={"dropout": key})
        lse = jax.scipy.special.logsumexp(logits.astype(jnp.float32), -1)
        return jnp.mean(lse - jnp.take_along_axis(
            logits.astype(jnp.float32), labels[:, None], 1)[:, 0])

    def fwd_bwd_train_body(c):
        x, key, s = c
        key, k = jax.random.split(key)
        l, g = jax.value_and_grad(loss_train)(params, x + s * 1e-6, k)
        return (x, key, l + grad_scalar(g))

    rows["fwd_bwd_train"] = slope_ms(
        fwd_bwd_train_body, (x0, jax.random.PRNGKey(0), jnp.float32(0)), 4, 12)

    # --- fwd+bwd+adamw update (params/opt-state in the scan carry, the
    # engine's realistic per-step state threading) -----------------------
    import optax
    tx = optax.adamw(5e-4)
    opt0 = tx.init(params)

    def fwd_bwd_opt_body(c):
        p, o, x = c
        l, g = jax.value_and_grad(loss_no_pen)(p, x)
        u, o = tx.update(g, o, p)
        p = optax.apply_updates(p, u)
        return (p, o, x)

    rows["fwd_bwd_opt"] = slope_ms(fwd_bwd_opt_body, (params, opt0, x0),
                                   4, 12)

    # --- + ADMM penalty ----------------------------------------------------
    plan = get_rank_plan("deit_tiny_patch16_224", "tt", "2")
    program = build_program(params, plan)
    state = admm_init(params, program)

    def loss_pen(p, x):
        return loss_no_pen(p, x) + admm_penalty(p, state, program, 0.001)

    def fwd_bwd_pen_body(c):
        x, s = c
        l, g = jax.value_and_grad(loss_pen)(params, x + s * 1e-6)
        return (x, l + grad_scalar(g))

    rows["fwd_bwd_pen"] = slope_ms(fwd_bwd_pen_body, (x0, jnp.float32(0)), 4, 12)

    # --- penalty-only grad -------------------------------------------------
    def pen_body(s):
        l, g = jax.value_and_grad(
            lambda p: admm_penalty(p, state, program, 0.001 + s * 0))(params)
        return l + grad_scalar(g)

    rows["penalty_grad"] = slope_ms(pen_body, jnp.float32(0), 8, 24)

    # --- input pipeline -----------------------------------------------------
    x_np, y_np, info = load_dataset("synthetic-imagenet", True, None,
                                    synthetic_size=512)
    dx = jnp.asarray(x_np)
    dy = jnp.asarray(y_np)

    def pipe_body(c):
        key, acc = c
        key, k1, k2 = jax.random.split(key, 3)
        xb, yb = sample_batch(dx, dy, k1, B)
        xb = augment_batch(xb, k2, mean=info.mean, std=info.std)
        return (key, acc + jnp.mean(xb.astype(jnp.float32)))

    rows["input_pipe"] = slope_ms(pipe_body, (jax.random.PRNGKey(0),
                                              jnp.float32(0)), 8, 24)

    # --- matmul proxy (MXU ceiling at encoder shapes) -----------------------
    t = B * TOKENS
    w_qkv = jnp.zeros((DIM, 3 * DIM), jnp.bfloat16)
    w_proj = jnp.zeros((DIM, DIM), jnp.bfloat16)
    w_fc1 = jnp.zeros((DIM, 4 * DIM), jnp.bfloat16)
    w_fc2 = jnp.zeros((4 * DIM, DIM), jnp.bfloat16)
    q0 = jnp.zeros((B * HEADS, TOKENS, DIM // HEADS), jnp.bfloat16)

    def mm_body(c):
        x = c  # [t, DIM]
        for _ in range(DEPTH):
            qkv = x @ w_qkv
            q = qkv[:, :DIM].reshape(B, TOKENS, HEADS, -1)
            q = q.transpose(0, 2, 1, 3).reshape(B * HEADS, TOKENS, -1)
            a = q @ jnp.swapaxes(q0 + q, -2, -1)
            y = (a @ (q0 + q)).reshape(B, HEADS, TOKENS, -1)
            y = y.transpose(0, 2, 1, 3).reshape(t, DIM)
            x = ((y @ w_proj) @ w_fc1) @ w_fc2 + x
        return x

    rows["matmul_proxy"] = slope_ms(mm_body,
                                    jnp.ones((t, DIM), jnp.bfloat16), 2, 6)

    # --- LayerNorm + softmax proxy ------------------------------------------
    sc = jnp.ones((DIM,), jnp.float32)

    def ln_body(c):
        x = c  # [B, TOKENS, DIM] f32
        for _ in range(DEPTH):
            mu = jnp.mean(x, -1, keepdims=True)
            v = jnp.mean((x - mu) ** 2, -1, keepdims=True)
            x = (x - mu) / jnp.sqrt(v + 1e-6) * sc
            a = jnp.einsum("bnd,bmd->bnm", x[..., :64], x[..., :64])
            a = jax.nn.softmax(a, -1)
            x = x + jnp.einsum("bnm,bmd->bnd", a, x) * 1e-3
            x = x * (1 + 1e-6)
        return x

    rows["ln_softmax"] = slope_ms(ln_body,
                                  jnp.ones((B, TOKENS, DIM), jnp.float32), 2, 6)

    fwd_fl = flops_encoder_fwd()
    out = {
        "backend": jax.default_backend(),
        "batch": B, "params": n_params,
        "ms": {k: round(v, 3) for k, v in rows.items()},
        "derived": {
            "bwd_only_ms": round(rows["fwd_bwd"] - rows["fwd"], 3),
            "penalty_in_step_ms": round(rows["fwd_bwd_pen"] - rows["fwd_bwd"], 3),
            "fwd_matmul_tflops": round(fwd_fl / 1e12, 3),
            "fwd_eff_tflops_per_s": round(fwd_fl / rows["fwd"] / 1e9, 1),
            "train_eff_tflops_per_s": round(3 * fwd_fl / rows["fwd_bwd"] / 1e9, 1),
            "matmul_proxy_tflops_per_s": round(
                fwd_fl / rows["matmul_proxy"] / 1e9, 1),
        },
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    import os
    if os.environ.get("DCTA_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["DCTA_PLATFORM"])
    main()
