"""Feature-rank analysis: singular-value spectra of intermediate
activations, compressed vs dense (reference ablation/compare_features.py —
which ships with a broken import, compare_features.py:4; this is the
working TPU-native equivalent built on flax 'intermediates' capture)."""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def activation_spectra(model, variables, x, top_k: int = 32) -> Dict[str, np.ndarray]:
    """Run the model capturing sown intermediates; for each captured
    activation [B,H,W,C] return the top-k singular values of the
    [B*H*W, C] unfolding (the per-layer 'feature rank' signature)."""
    _, state = model.apply(variables, x, train=False,
                           mutable=["intermediates"])
    out = {}

    def visit(path, node):
        if isinstance(node, dict):
            for k, v in node.items():
                visit(path + (k,), v)
        else:
            arr = node[0] if isinstance(node, tuple) else node
            a = np.asarray(arr, np.float32).reshape(-1, arr.shape[-1])
            s = np.linalg.svd(a, compute_uv=False)
            out[".".join(str(p) for p in path)] = s[:top_k]

    visit((), state["intermediates"])
    return out


def compare_feature_ranks(dense_model, dense_vars, comp_model, comp_vars, x,
                          energy: float = 0.99) -> Dict[str, dict]:
    """Effective rank (count of singular values covering `energy` of the
    spectrum) per captured layer, dense vs compressed."""
    def eff_rank(s):
        e = np.cumsum(s ** 2) / np.sum(s ** 2)
        return int(np.searchsorted(e, energy) + 1)

    d = activation_spectra(dense_model, dense_vars, x)
    c = activation_spectra(comp_model, comp_vars, x)
    report = {}
    for k in d:
        if k in c:
            report[k] = {"dense_rank": eff_rank(d[k]),
                         "compressed_rank": eff_rank(c[k])}
    return report
