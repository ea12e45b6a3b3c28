"""TT-LSTM: LSTM cell whose input-to-hidden weight is TT-factorized
(reference ablation/tt_lstm_inference.py — a hand-rolled inference demo;
here a reusable flax cell plus the latency demo)."""

from __future__ import annotations

import time
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs.hp import TTLinearSpec
from ..layers import TTLinear
from ..nlp.factorization import tt_linear_spec_from_ratio


class TTLSTMCell(nn.Module):
    """LSTM cell with the [4H, I] input projection in TT format; the
    recurrent [4H, H] projection stays dense (it is the smaller of the
    two for the large-input regimes TT-LSTM targets)."""
    input_size: int
    hidden_size: int
    spec: Optional[TTLinearSpec] = None
    compression_ratio: float = 4.0

    def setup(self):
        spec = self.spec or tt_linear_spec_from_ratio(
            self.input_size, 4 * self.hidden_size, self.compression_ratio, dim=3)
        self.wx = TTLinear(self.input_size, 4 * self.hidden_size, spec,
                           use_bias=True, name="wx")
        self.wh = nn.Dense(4 * self.hidden_size, use_bias=False, name="wh")

    def __call__(self, carry, x):
        h, c = carry
        gates = self.wx(x) + self.wh(h)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    def init_carry(self, batch: int):
        z = jnp.zeros((batch, self.hidden_size))
        return (z, z)


def tt_lstm_inference_demo(input_size=1024, hidden_size=256, seq_len=32,
                           batch=8, ratio=8.0, iters=20):
    """Latency demo (ablation/tt_lstm_inference.py equivalent): scan the
    cell over a sequence under jit, report ms/sequence and params."""
    cell = TTLSTMCell(input_size, hidden_size, compression_ratio=ratio)
    xs = jnp.zeros((batch, seq_len, input_size))
    carry = cell.init_carry(batch)
    variables = cell.init(jax.random.PRNGKey(0), carry, xs[:, 0])

    @jax.jit
    def run(variables, xs):
        def step(carry, x):
            return cell.apply(variables, carry, x)
        (h, c), ys = jax.lax.scan(step, cell.init_carry(xs.shape[0]),
                                  jnp.swapaxes(xs, 0, 1))
        return ys

    run(variables, xs).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        y = run(variables, xs)
    y.block_until_ready()
    ms = 1000 * (time.perf_counter() - t0) / iters
    n_params = sum(a.size for a in jax.tree.leaves(variables))
    dense_params = input_size * 4 * hidden_size
    return {"ms_per_sequence": ms, "params": int(n_params),
            "dense_wx_params": dense_params}
