"""Runnable worked examples of factorized-forward math and cost accounting.

The reference ships three educational scripts that hand-compute TT conv/FC
forward passes and parameter/FLOP counts (numeric_example1.py:31-52,
numeric_example2.py:30-82, numeric_example3.py:22-61) — its de-facto math
spec. This script reproduces each worked example against this framework's
layer library and cost models, and prints the numbers. The same math is
asserted in tests/test_analysis.py; this file is the human-readable tour.

Run:  python examples/numeric_examples.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("DCTA_PLATFORM"):
    # the axon TPU plugin ignores JAX_PLATFORMS; honor the explicit override
    jax.config.update("jax_platforms", os.environ["DCTA_PLATFORM"])
import jax.numpy as jnp
import numpy as np

from dnn_compression_tensor_admm_tpu.analysis import (
    dense_conv_cost, dense_linear_cost, tt_conv_cost, tt_linear_cost)
from dnn_compression_tensor_admm_tpu.configs.hp import TTConvSpec, TTLinearSpec
from dnn_compression_tensor_admm_tpu.layers import TTConv2d, conv2d


def example1_order1_tt_conv():
    """Order-1 TT conv as three explicit computations
    (reference numeric_example1.py): contract the input-channel core into
    the activations, run the small r1->r2 conv, contract the
    output-channel core back."""
    print("== example 1: order-1 TT conv = 3 computations ==")
    B, I, H, W, O = 4, 16, 10, 10, 32
    r1, r2 = 10, 24
    spec = TTConvSpec.create((O, 9, I), (1, r2, r1, 1), out_channels=O)
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.normal(ks[0], (B, H, W, I))
    in_core = jax.random.normal(ks[1], (r1, I, 1)) * 0.2
    core = jax.random.normal(ks[2], (3, 3, r1, r2)) * 0.2
    out_core = jax.random.normal(ks[3], (1, O, r2)) * 0.2

    # computation 1: y1[b,h,w,r1] = sum_i x[b,h,w,i] * G_in[r1,i]
    h1 = jnp.einsum("bhwi,ri->bhwr", x, in_core[:, :, 0])
    # computation 2: y2 = conv3x3(y1; core[r1 -> r2])
    h2 = conv2d(h1, core, 1, 1)
    # computation 3: y[b,h,w,o] = sum_r2 y2[b,h,w,r2] * G_out[o,r2]
    y_manual = jnp.einsum("bhwr,or->bhwo", h2, out_core[0].reshape(O, r2))

    layer = TTConv2d(I, O, 3, spec, stride=1, padding=1)
    params = {"params": {"in_core_0": in_core, "core_kernel": core,
                         "out_core_0": out_core, "bias": jnp.zeros((O,))}}
    y_layer = jax.jit(layer.apply)(params, x)
    err = float(np.max(np.abs(np.asarray(y_layer) - np.asarray(y_manual))))
    print(f"  layer-vs-manual max abs err: {err:.2e}  (identical math)")


def example2_general_tt_conv_costs():
    """General-order TT conv params/FLOPs vs dense
    (reference numeric_example2.py)."""
    print("== example 2: general-order TT conv cost accounting ==")
    spec = TTConvSpec.create((8, 4, 9, 4, 8), (1, 8, 16, 16, 8, 1), 32)
    p, f = tt_conv_cost(spec, (8, 8))
    dp, df = dense_conv_cost((8, 8), 32, 32, 3, 3)
    print(f"  TT   : params {p:6d}  flops/px {f}")
    print(f"  dense: params {dp:6d}  flops/px {df}")
    print(f"  compression {dp / p:.2f}x params, speedup {df / f:.2f}x flops")


def example3_tt_fc_costs():
    """General TT fully-connected layer accounting
    (reference numeric_example3.py)."""
    print("== example 3: TT fully-connected layer cost accounting ==")
    spec = TTLinearSpec.create((8, 8, 8, 8), (1, 8, 10, 8, 1), 64)
    p, f = tt_linear_cost(spec)
    dp, df = dense_linear_cost(64, 64)
    print(f"  TT   : params {p:6d}  flops {f}")
    print(f"  dense: params {dp:6d}  flops {df}")
    print(f"  compression {dp / p:.2f}x params")


if __name__ == "__main__":
    example1_order1_tt_conv()
    example2_general_tt_conv_costs()
    example3_tt_fc_costs()
