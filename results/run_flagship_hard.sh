#!/usr/bin/env bash
# Flagship evidence runs on the HARD synthetic set (synthetic-hard-cifar10):
# classes are confusable by construction, so the dense / ADMM / fine-tune
# accuracy differences are observable (the easy set saturates at 100%).
# Same phases as run_flagship.sh; program shapes are identical so the
# persistent compile cache makes these runs cheap.
set -e
cd "$(dirname "$0")/.."
OUT=results/flagship_r03_hard
DS=synthetic-hard-cifar10
mkdir -p "$OUT"

run_fmt () {  # $1 = tk|tt   $2 = compressed model name
  local fmt=$1 cmodel=$2
  echo "=== $fmt ADMM (200 epochs, hard) ==="
  python main.py --model resnet32 --dataset "$DS" \
    --admm --format "$fmt" --ratio 3 --rho 0.001 --epochs 200 --lr 0.1 \
    --batch-size 256 --smoothing 0.1 --eval-every 10 --verbose \
    --save-model --save-log --output-dir "$OUT" \
    > "$OUT/${fmt}3x_admm_stdout.log" 2>&1
  local ck
  ck=$(ls -t "$OUT"/resnet32_*_admm_${fmt}_*_model.msgpack | head -1)
  echo "ADMM checkpoint: $ck"
  echo "=== $fmt decompose + FT (150 epochs, hard) ==="
  python main.py --model "$cmodel" --dataset "$DS" \
    --decompose --model-path "$ck" --ratio 3 --epochs 150 --lr 0.01 \
    --batch-size 256 --smoothing 0.1 --eval-every 10 \
    --save-model --save-log --output-dir "$OUT" \
    > "$OUT/${fmt}3x_ft_stdout.log" 2>&1
}

echo "=== dense baseline (200 epochs, hard) ==="
python main.py --model resnet32 --dataset "$DS" \
  --epochs 200 --lr 0.1 --batch-size 256 --smoothing 0.1 --eval-every 10 \
  --save-model --save-log --output-dir "$OUT" \
  > "$OUT/dense_stdout.log" 2>&1

run_fmt tk tkc_resnet32
run_fmt tt ttm_resnet32
echo "all hard flagship runs complete"
