"""Transformer/BERT compression subsystem (the reference's `xcompression/`).

Capabilities re-built TPU-first:

* automatic tensorization: shape factorization of arbitrary feature sizes
  (`split_to_factors`) and TT/SVD rank solvers from a target compression
  ratio (`compute_ranks_tt`, `compute_rank_svd`) — xcompression/
  transformer/TTLinear.py:17-135, SVDLinear.py:27.
* factorized embeddings: TT embedding with mixed-radix tensorized index
  lookup (TTEmbedding.py:91-118) and SVD embedding.
* BERT modeling, dense + compressed via the same substitution mechanism
  as the vision zoo (replaces the 16 hand-written compressed_modeling*
  variants).
* two-stage TinyBERT-style distillation losses (attention+hidden MSE,
  then soft cross-entropy) — task_distill.py:806-840.
"""

from .factorization import (
    get_factors, split_to_factors, compute_ranks_tt, compute_rank_svd,
    tt_linear_spec_from_ratio, svd_spec_from_ratio)
from .tt_embedding import TTEmbedding
from .svd_embedding import SVDEmbedding
from .ket_embedding import (EarlyStopping, KetEmbedding, KetXSEmbedding,
                            fit_ket_to_dense, ket_rank_from_ratio)
from .bert import (BertConfig, BertModel, BertForSequenceClassification,
                   BertForQuestionAnswering, BertCompressionPlan)
from .distill import (attention_hidden_distill_loss, soft_logits_loss)
