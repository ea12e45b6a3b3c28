"""L1 factorized layer library (flax, NHWC, MXU-shaped contractions).

Execution-mode naming vs the reference's class-name grammar
({tt|tk|svd}{r|m|c}_*, SURVEY.md §2.2):

* mode='factorized'  — reference 'M'/'C' variants (factors applied to
  activations). On TPU the per-core activation chain is re-fused into at
  most two large matmuls around a small conv (ops/contractions.py).
* mode='reconstruct' — reference 'R' variants (dense kernel rebuilt each
  forward, one conv). Under jit the rebuild is a handful of tiny matmuls
  fused ahead of the conv.
"""

from .common import conv2d, canonical_param_name, param_path_from_name
from .tt_conv import TTConv2d
from .tk_conv import TKConv2d
from .svd_conv import SVDConv2d
from .tt_linear import TTLinear
from .tk_linear import TKLinear
from .svd_linear import SVDLinear
