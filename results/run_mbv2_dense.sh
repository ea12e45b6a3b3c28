#!/usr/bin/env bash
# Matched dense baseline for the MobileNetV2-SVD FT-decay question
# (round-4 verdict weak #5): train DENSE mobilenetv2_cifar on the same
# hard set with the same schedule family and eval cadence, so the FT
# decay (85.38% @ep20 -> 81.84% @ep100, results/mbv2_svd_r03) can be
# compared against the dense model's own decay — the same treatment the
# TK flagship got (results/ft_ablation_r04, RESULTS.md).
set -e
cd "$(dirname "$0")/.."
OUT=results/mbv2_dense_r05
mkdir -p "$OUT"
python main.py --model mobilenetv2_cifar --dataset synthetic-hard-cifar10 \
  --epochs 150 --lr 0.05 --batch-size 256 --smoothing 0.1 \
  --eval-every 5 --save-log --output-dir "$OUT" \
  > "$OUT/dense_stdout.log" 2>&1
echo "mbv2 dense baseline complete"
