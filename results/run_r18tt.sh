#!/usr/bin/env bash
# ResNet18-TT "special" north-star pipeline (reference README.md:28-31,
# 69.6% @ 2.65x; hp_dicts/tt_resnet18_hp.py special shapes):
# full ADMM -> decompose -> fine-tune at ImageNet geometry on the HARD
# synthetic set, fed through the DCTA shard path (--shard-dir) with the
# shards cached whole into HBM (--shard-cache hbm): the dataset is 1.9 GB
# so the per-step host->HBM hop behind the axon tunnel would otherwise
# dominate the epoch.
set -e
cd "$(dirname "$0")/.."
OUT=results/r18tt_r04
SHARDS=/tmp/r18_shards
mkdir -p "$OUT"

if [ ! -f "$SHARDS/train-00000.dcta" ]; then
  echo "=== generating synthetic-hard-imagenet shards ==="
  python - <<'EOF'
from dnn_compression_tensor_admm_tpu.data.datasets import load_dataset
from dnn_compression_tensor_admm_tpu.data.records import write_shards
x, y, _ = load_dataset("synthetic-hard-imagenet", True, None, synthetic_size=12800)
write_shards(x, y, "/tmp/r18_shards", samples_per_shard=3200, prefix="train")
xv, yv, _ = load_dataset("synthetic-hard-imagenet", False, None, synthetic_size=2560)
write_shards(xv, yv, "/tmp/r18_shards", samples_per_shard=3200, prefix="val")
print("shards written")
EOF
fi

echo "=== ResNet18 TT-special ADMM (200 epochs) ==="
python main.py --model resnet18 --dataset synthetic-hard-imagenet \
  --shard-dir "$SHARDS" --shard-cache hbm \
  --admm --format tt --ratio 2 --tt-type special --rho 0.001 \
  --epochs 200 --lr 0.1 --batch-size 256 --smoothing 0.1 \
  --eval-every 10 --verbose --save-model --save-log --output-dir "$OUT" \
  > "$OUT/admm_stdout.log" 2>&1
CK=$(ls -t "$OUT"/resnet18_*_admm_tt_*_model.msgpack | head -1)
echo "ADMM checkpoint: $CK"

echo "=== decompose + fine-tune (150 epochs) ==="
python main.py --model ttm_resnet18 --dataset synthetic-hard-imagenet \
  --shard-dir "$SHARDS" --shard-cache hbm \
  --decompose --model-path "$CK" --ratio 2 --tt-type special \
  --epochs 150 --lr 0.01 --batch-size 256 --smoothing 0.1 \
  --eval-every 10 --save-model --save-log --output-dir "$OUT" \
  > "$OUT/ft_stdout.log" 2>&1
echo "north-star pipeline complete"
