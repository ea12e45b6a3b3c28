"""Headline benchmark: ADMM iterations/s, ResNet32-TK-3x, CIFAR-10 geometry.

Measures the full augmented-Lagrangian pipeline on the available device
(real TPU under the driver): per-epoch Z/U projection step (vmap-bucketed
on-device truncated HOOI) + scanned X-steps (batch 256, bf16 compute,
in-jit data sampling/augmentation, label smoothing 0.1, SGD-momentum) —
the configuration of the reference's headline result
(README.md:19-21, BASELINE.json north star).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` compares against the most recent recorded BENCH_r*.json
(the reference publishes no throughput numbers — BASELINE.md).
"""

import glob
import json
import os
import re
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

# env-var cache config does not reliably initialize the cache under the
# axon PJRT plugin; the explicit config route does (verified: second
# process compiles drop ~5x)
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main():
    from dnn_compression_tensor_admm_tpu.train import TrainConfig, train_model

    steps_per_epoch = 196  # 50k / 256, the real CIFAR-10 epoch geometry
    cfg = TrainConfig(
        model="resnet32", dataset="synthetic-cifar10", batch_size=256,
        epochs=4, steps_per_epoch=steps_per_epoch, lr=0.1, smoothing=0.1,
        admm=True, fmt="tk", ratio="3", admm_method="pallas", admm_hooi_iters=6,
        compute_dtype="bfloat16", eval_every=10**9, print_fn=lambda *a: None,
    )

    # epoch 1 pays compile; time epochs 2..4
    t_epochs = []
    orig_train = train_model
    state, hist = orig_train(cfg)
    times = [h["epoch_time_s"] for h in hist[1:]]
    iters_per_s = steps_per_epoch / (sum(times) / len(times))

    prev = None
    for f in sorted(glob.glob("BENCH_r*.json"),
                    key=lambda p: int(re.search(r"r(\d+)", p).group(1))):
        try:
            rec = json.load(open(f))
            # driver records our line under "parsed"; accept both layouts
            prev = (rec.get("parsed") or rec).get("value") or prev
        except Exception:
            pass
    vs = (iters_per_s / prev) if prev else 1.0

    print(json.dumps({
        "metric": "admm_iterations_per_s_resnet32_tk3x_b256",
        "value": round(iters_per_s, 2),
        "unit": "iter/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
