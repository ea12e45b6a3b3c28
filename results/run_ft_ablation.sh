#!/usr/bin/env bash
# Fine-tune LR ablation on the hard-set TK@3x flagship config (VERDICT r3
# weak #4: FT at lr 0.01 ended 2 points BELOW its own first evaluation —
# 86.36% -> 84.31%). Reuses the round-3 ADMM checkpoint; three recipes:
#   a) lr 0.003 cosine            (lower peak lr)
#   b) lr 0.01 cosine + 5 warmup  (same peak, gentler entry)
#   c) lr 0.003 + EMA 0.999       (report EMA eval alongside raw)
set -e
cd "$(dirname "$0")/.."
OUT=results/ft_ablation_r04
DS=synthetic-hard-cifar10
CK=$(ls -t results/flagship_r03_hard/resnet32_*_admm_tk_*_model.msgpack | head -1)
mkdir -p "$OUT"
echo "ADMM checkpoint: $CK"

run () {  # $1 tag, rest = extra flags
  local tag=$1; shift
  echo "=== FT $tag ==="
  python main.py --model tkc_resnet32 --dataset "$DS" \
    --decompose --model-path "$CK" --ratio 3 --epochs 150 \
    --batch-size 256 --smoothing 0.1 --eval-every 10 \
    --save-log --output-dir "$OUT/$tag" "$@" \
    > "$OUT/${tag}_stdout.log" 2>&1
}

run lr003 --lr 0.003
run lr01_warmup5 --lr 0.01 --warmup-epochs 5
run lr003_ema --lr 0.003 --ema-decay 0.999
echo "ablation complete"
