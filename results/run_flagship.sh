#!/usr/bin/env bash
# Full-length flagship pipeline on the real TPU chip (round-3 evidence run):
#   ResNet32 + {TK,TT} @3x — 200-epoch ADMM -> decompose -> 150-epoch FT.
# Dataset: deterministic synthetic CIFAR-10 (50k/10k; no real CIFAR exists
# in this offline env — see RESULTS.md). Per-epoch JSON rows + per-layer
# ADMM residuals are captured under results/flagship_r03/.
set -e
cd "$(dirname "$0")/.."
OUT=results/flagship_r03
mkdir -p "$OUT"

run_fmt () {  # $1 = tk|tt   $2 = compressed model name
  local fmt=$1 cmodel=$2
  echo "=== $fmt ADMM (200 epochs) ==="
  python main.py --model resnet32 --dataset synthetic-cifar10 \
    --admm --format "$fmt" --ratio 3 --rho 0.001 --epochs 200 --lr 0.1 \
    --batch-size 256 --smoothing 0.1 --eval-every 10 --verbose \
    --save-model --save-log --output-dir "$OUT" \
    > "$OUT/${fmt}3x_admm_stdout.log" 2>&1
  local ck
  ck=$(ls -t "$OUT"/resnet32_*_admm_${fmt}_*_model.msgpack | head -1)
  echo "ADMM checkpoint: $ck"
  echo "=== $fmt decompose + FT (150 epochs) ==="
  python main.py --model "$cmodel" --dataset synthetic-cifar10 \
    --decompose --model-path "$ck" --ratio 3 --epochs 150 --lr 0.01 \
    --batch-size 256 --smoothing 0.1 --eval-every 10 \
    --save-model --save-log --output-dir "$OUT" \
    > "$OUT/${fmt}3x_ft_stdout.log" 2>&1
}

echo "=== dense baseline (200 epochs) ==="
python main.py --model resnet32 --dataset synthetic-cifar10 \
  --epochs 200 --lr 0.1 --batch-size 256 --smoothing 0.1 --eval-every 10 \
  --save-model --save-log --output-dir "$OUT" \
  > "$OUT/dense_stdout.log" 2>&1

run_fmt tk tkc_resnet32
run_fmt tt ttm_resnet32
echo "all flagship runs complete"
