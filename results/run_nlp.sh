#!/usr/bin/env bash
# NLP (xcompression) evidence runs (round-4 verdict item 5): one two-stage
# GLUE task-distillation run and one SQuAD run producing
# predictions.json / nbest_predictions.json — the reference's runnable
# pipelines (xcompression/task_distill.py:1235-1285, run_squad.py:514).
# Synthetic corpora (offline env), compression plan active (TT linears
# ratio 2 + SVD embeddings 4.5x = the reference's compressed_modeling_tt
# configuration). Small BERT geometry + dropout 0 + the from-scratch lrs
# the tests established (tests/test_task_distill.py: BERT-default lrs and
# dropout 0.1 leave a from-scratch synthetic teacher at chance); the
# artifact is the pipeline evidence (teacher-vs-student deltas,
# prediction files), not a GLUE leaderboard number.
set -e
cd "$(dirname "$0")/.."
OUT=results/nlp_r05
mkdir -p "$OUT"

echo "=== task-distill (sst-2 synthetic, two stages, TT+SVD plan) ==="
DCTA_PLATFORM=cpu python -m dnn_compression_tensor_admm_tpu.nlp task-distill \
  --task sst-2 --n-synthetic 2048 --hidden-size 64 --num-layers 3 \
  --num-heads 4 --intermediate-size 256 --max-seq-length 32 \
  --batch-size 32 --dropout 0 \
  --linear-format tt --ratio 2 --embedding-format svd --embedding-ratio 4.5 \
  --teacher-epochs 20 --teacher-lr 1e-3 \
  --stage1-epochs 4 --stage2-epochs 6 --lr-stage1 3e-4 --lr-stage2 1e-3 \
  --save "$OUT/sst2_student.msgpack" \
  > "$OUT/task_distill_stdout.log" 2>&1
tail -1 "$OUT/task_distill_stdout.log"

echo "=== squad (synthetic, EM/F1 + prediction artifacts) ==="
DCTA_PLATFORM=cpu python -m dnn_compression_tensor_admm_tpu.nlp squad \
  --hidden-size 128 --num-layers 4 --num-heads 4 \
  --intermediate-size 512 --max-seq-length 128 --batch-size 16 --dropout 0 \
  --linear-format tt --ratio 2 --embedding-format svd --embedding-ratio 4.5 \
  --epochs 3 --lr 5e-4 --output-dir "$OUT/squad" \
  > "$OUT/squad_stdout.log" 2>&1
tail -1 "$OUT/squad_stdout.log"
echo "nlp evidence complete"
