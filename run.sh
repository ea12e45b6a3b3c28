#!/usr/bin/env bash
# Launch recipes for the full ADMM -> decompose -> fine-tune matrix
# (the reference's run.sh torchrun recipes, adapted to the TPU CLI).
# Single-program SPMD: no torchrun/launcher needed — the mesh comes from
# jax.devices() (multi-host: initialize jax.distributed before main).
set -e

DATA=${DATA:-/data}
OUT=${OUT:-saved_models}

case "${1:-help}" in
  resnet32-tk-admm)
    python main.py --model resnet32 --dataset cifar10 --data-dir "$DATA" \
      --admm --format tk --ratio 3 --rho 0.001 --epochs 200 --lr 0.1 \
      --smoothing 0.1 --save-model --save-log --output-dir "$OUT" ;;
  resnet32-tk-ft)
    python main.py --model tkc_resnet32 --dataset cifar10 --data-dir "$DATA" \
      --decompose --model-path "$2" --ratio 3 --epochs 150 --lr 0.01 \
      --smoothing 0.1 --save-model --save-log --output-dir "$OUT" ;;
  resnet32-tt-admm)
    python main.py --model resnet32 --dataset cifar10 --data-dir "$DATA" \
      --admm --format tt --ratio 3 --rho 0.001 --epochs 200 --lr 0.1 \
      --smoothing 0.1 --save-model --save-log --output-dir "$OUT" ;;
  resnet18-tt-admm)
    python main.py --model resnet18 --dataset imagenet --admm --format tt \
      --ratio 2 --tt-type special --epochs 120 --lr 0.1 --batch-size 256 \
      --shard-dir "$DATA/imagenet-shards" --save-model --output-dir "$OUT" ;;
  deit-tiny-tt-admm)
    python main.py --model deit_tiny_patch16_224 --dataset imagenet \
      --admm --format tt --ratio 2 --opt adamw --lr 5e-4 --sched cosine \
      --warmup-epochs 5 --epochs 300 --mixup 0.8 --cutmix 1.0 \
      --shard-dir "$DATA/imagenet-shards" --save-model --output-dir "$OUT" ;;
  resnet18-tt-pipeline)
    # full north-star pipeline (ADMM -> decompose -> FT) on shards,
    # cached to HBM; see results/run_r18tt.sh for the evidence run
    bash results/run_r18tt.sh ;;
  deit-tt-pipeline)
    bash results/run_deit_converged.sh ;;
  ft-ablation)
    bash results/run_ft_ablation.sh ;;
  bench)
    python bench.py ;;
  *)
    grep -E '^\s+[a-z0-9-]+\)' "$0" | tr -d ' )' ;;
esac
