"""Rank-plan configuration system.

Replaces the reference's `hp_dicts/` package of per-layer dictionaries and
the `utils.get_hp_dict` string-matching resolver (reference:
utils.py:258-400) with typed specs and a registry keyed by
(model, format, ratio, tt_type).
"""

from .hp import (
    TTConvSpec, TTLinearSpec, TKSpec, SVDSpec, LayerSpec, RankPlan,
)
from .resolver import get_rank_plan, register_plan
