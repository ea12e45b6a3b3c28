"""L3 model zoo.

All models are flax modules built dense-first; compressed variants come
from one *layer-substitution plan* mechanism: a module consults the
`RankPlan` for its canonical parameter name and swaps in the matching
factorized layer (the reference instead hand-writes a `*_tt.py` twin for
every model family, e.g. resnet_cifar_tt.py:40-65).

Model names follow the reference grammar `{tt|tk|svd|stftk}{r|m|c}_<base>`
(SURVEY.md §2.2) and are resolved by `create_model`.
"""

from .registry import create_model, register_model, list_models
from . import resnet_cifar  # noqa: F401  (registers builders)
from . import resnet_inet  # noqa: F401
from . import vit  # noqa: F401
from . import mobilenetv2  # noqa: F401
from . import mobilenetv2_cifar  # noqa: F401
from . import densenet  # noqa: F401
from . import vgg  # noqa: F401
from .decompose import decompose_params, count_params, compression_ratio
