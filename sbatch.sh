#!/usr/bin/env bash
#SBATCH --job-name=dcta-tpu
#SBATCH --nodes=4                  # one task per TPU host
#SBATCH --ntasks-per-node=1
#SBATCH --time=48:00:00
#SBATCH --output=slurm-%j.out
#
# SLURM launcher for multi-host TPU training (the reference's sbatch.sh,
# sbatch.sh:20-66, adapted: no NCCL/torchrun — one Python process per host,
# jax.distributed rendezvous read from SLURM env by parallel/dist.py
# (SLURM_NTASKS/SLURM_PROCID; coordinator = JAX_COORDINATOR, below)).
#
# Usage:  sbatch sbatch.sh resnet32-tk-admm
#         sbatch sbatch.sh resnet18-tt-admm
# (recipe names are run.sh's; any extra args pass through)

set -e

DATA=${DATA:-/data}
LOCAL=${LOCAL_DATA:-/tmp/dcta-data}

# Stage the dataset shards to node-local disk with retries (the reference
# retries rsync up to 20x against a flaky parallel FS, sbatch.sh:20-34).
if [ -d "$DATA" ]; then
  mkdir -p "$LOCAL"
  for i in $(seq 1 20); do
    if srun --ntasks="$SLURM_NNODES" --ntasks-per-node=1 \
        rsync -a --partial "$DATA/" "$LOCAL/"; then
      break
    fi
    echo "rsync attempt $i failed; retrying" >&2
    sleep 10
  done
  DATA="$LOCAL"
fi

export JAX_COORDINATOR="$(scontrol show hostnames "$SLURM_JOB_NODELIST" | head -n1):8476"

# one process per host; each sees its local TPU chips, jax.distributed
# assembles the global mesh (parallel/dist.py::init_distributed)
srun --ntasks="$SLURM_NNODES" --ntasks-per-node=1 \
  env DATA="$DATA" bash run.sh "$@"
