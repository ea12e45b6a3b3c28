#!/usr/bin/env bash
# DeiT-tiny TT@2x pipeline, CONVERGED (VERDICT r3 weak #5: the 60-epoch
# r3 run's residual was still decaying, 981 -> 335; the reference recipe
# runs 300 epochs — README.md:36-38). 300-epoch ADMM with --adjust-rho
# (late 5x rho boost, measured helpful in results/adjust_rho_r03), then
# decompose -> 60-epoch fine-tune. Synthetic-HARD imagenet geometry so
# accuracy differences are observable (the r3 easy set saturated at 97.7%).
set -e
cd "$(dirname "$0")/.."
OUT=results/deit_r04
DS=synthetic-hard-imagenet
mkdir -p "$OUT"

echo "=== DeiT-tiny TT ADMM (300 epochs) ==="
python main.py --model deit_tiny_patch16_224 --dataset "$DS" \
  --synthetic-size 4096 --admm --format tt --ratio 2 \
  --opt adamw --lr 5e-4 --sched cosine --warmup-epochs 5 \
  --epochs 300 --batch-size 128 --smoothing 0.1 --adjust-rho \
  --eval-every 20 --verbose --save-model --save-log --output-dir "$OUT" \
  > "$OUT/admm_stdout.log" 2>&1
CK=$(ls -t "$OUT"/deit_*_admm_tt_*_model.msgpack | head -1)
echo "ADMM checkpoint: $CK"

echo "=== decompose + fine-tune (60 epochs) ==="
python main.py --model ttm_deit_tiny_patch16_224 --dataset "$DS" \
  --synthetic-size 4096 --decompose --model-path "$CK" --ratio 2 \
  --opt adamw --lr 1e-4 --sched cosine --epochs 60 --batch-size 128 \
  --smoothing 0.1 --eval-every 10 --save-model --save-log \
  --output-dir "$OUT" > "$OUT/ft_stdout.log" 2>&1
echo "deit pipeline complete"
