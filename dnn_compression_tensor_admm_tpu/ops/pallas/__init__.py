"""Pallas TPU kernels for the framework's hot ops.

Each kernel has an XLA fallback; callers gate on `pallas_available()`
(real TPU present) or pass `interpret=True` under tests.
"""

from .subspace_kernel import (dominant_left_subspace_batched,
                              pallas_subspace_supported, tt_project_batched,
                              tt_supported_pallas)
from .tucker_kernel import (tucker2_factors_batched, tucker2_project_batched,
                            pallas_tk_supported)

__all__ = [
    "dominant_left_subspace_batched",
    "pallas_subspace_supported",
    "tt_project_batched",
    "tt_supported_pallas",
    "tucker2_factors_batched",
    "tucker2_project_batched",
    "pallas_tk_supported",
]
