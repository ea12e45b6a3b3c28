"""L0 tensor-math kernels: TT-SVD, partial Tucker (HOSVD/HOOI), truncated SVD.

All functions are pure, shape-static, and jit-able; they are the on-device
replacement for the reference's host-side NumPy/tensorly calls
(reference: ttd.py, admm.py:91-149, TKConv.py:78-84).
"""

from .ttd import clamp_tt_ranks, ten2tt, tt2ten, tt_project
from .tucker import partial_tucker, tucker_to_tensor, tucker2_project
from .svd import truncated_svd, svd_project, truncated_left_sv
