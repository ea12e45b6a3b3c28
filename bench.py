"""Headline benchmark: ADMM iterations/s on the available device.

Default config is ResNet32-TK-3x @ CIFAR-10 geometry — the reference's
headline result (README.md:19-21, BASELINE.json north star): per-epoch
Z/U projection (vmap-bucketed on-device truncated HOOI / batched TT-SVD)
+ scanned X-steps (batch 256, bf16 compute, in-jit data
sampling/augmentation, label smoothing 0.1, SGD-momentum).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` is pinned to the FIRST recorded round for this metric
(round 1: 309.65 it/s for the headline config) so the ratio means the
same thing in every round; `vs_last_round` additionally compares against
the most recent BENCH_r*.json. (The reference publishes no throughput
numbers — BASELINE.md.)

Other configs (--config tt3x | deit_tt2) cover the second headline
format (TT) and the ViT family; `--all` runs every config and writes
results/bench_formats.json while still printing the single headline
line last.
"""

import argparse
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


CONFIGS = {
    # 50k/256 = 196 steps: the real CIFAR-10 epoch geometry
    "tk3x": dict(model="resnet32", fmt="tk", ratio="3", batch_size=256,
                 steps_per_epoch=196, dataset="synthetic-cifar10",
                 metric="admm_iterations_per_s_resnet32_tk3x_b256"),
    "tt3x": dict(model="resnet32", fmt="tt", ratio="3", batch_size=256,
                 steps_per_epoch=196, dataset="synthetic-cifar10",
                 metric="admm_iterations_per_s_resnet32_tt3x_b256"),
    # ViT family, TT format (reference README.md:36-38). 128 steps/epoch:
    # still 80x fewer than a real ImageNet epoch (10k steps at b128), so
    # the per-epoch Z-step (13.2 ms steady, measured r5 — see
    # BENCHNOTES deit breakdown) is weighted CONSERVATIVELY vs. real
    # training, without making the bench epoch-dominated by it
    "deit_tt2": dict(model="deit_tiny_patch16_224", fmt="tt", ratio="2",
                     batch_size=128, steps_per_epoch=128,
                     dataset="synthetic-imagenet", synthetic_size=512,
                     opt="adamw", lr=5e-4,
                     metric="admm_iterations_per_s_deit_tiny_tt2_b128"),
}


def run_config(name: str) -> dict:
    from dnn_compression_tensor_admm_tpu.train import TrainConfig, train_model
    c = dict(CONFIGS[name])
    metric = c.pop("metric")
    steps = c["steps_per_epoch"]
    # 3 fused 8-epoch chunks (epochs_per_dispatch default): the first
    # chunk pays the compile, the remaining 16 epochs are steady state
    cfg = TrainConfig(
        epochs=24, lr=c.pop("lr", 0.1), smoothing=0.1, admm=True,
        admm_method="pallas", admm_hooi_iters=6, compute_dtype="bfloat16",
        eval_every=10 ** 9, print_fn=lambda *a: None, **c)
    state, hist = train_model(cfg)
    times = [h["epoch_time_s"] for h in hist[cfg.epochs_per_dispatch:]]
    iters_per_s = steps / (sum(times) / len(times))
    return {"metric": metric, "value": round(iters_per_s, 2),
            "unit": "iter/s",
            "images_per_s": round(iters_per_s * cfg.batch_size, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="tk3x", choices=sorted(CONFIGS))
    ap.add_argument("--all", action="store_true",
                    help="run every config, write results/bench_formats.json")
    args = ap.parse_args()

    if args.all:
        rows = []
        for name in ("tk3x", "tt3x", "deit_tt2"):
            r = run_config(name)
            r["config"] = name
            rows.append(r)
            print(json.dumps(r), file=sys.stderr)
        os.makedirs("results", exist_ok=True)
        with open("results/bench_formats.json", "w") as f:
            json.dump(rows, f, indent=1)
        headline = rows[0]
    else:
        headline = run_config(args.config)

    first = last = None
    for f in sorted(glob.glob("BENCH_r*.json"),
                    key=lambda p: int(re.search(r"r(\d+)", p).group(1))):
        try:
            rec = json.load(open(f))
            # driver records our line under "parsed"; accept both layouts
            cand = (rec.get("parsed") or rec)
            if cand.get("metric") == headline["metric"] and cand.get("value"):
                first = first or cand["value"]
                last = cand["value"]
        except Exception:
            pass

    print(json.dumps({
        "metric": headline["metric"],
        "value": headline["value"],
        "unit": "iter/s",
        "vs_baseline": round(headline["value"] / first, 3) if first else 1.0,
        "vs_last_round": round(headline["value"] / last, 3) if last else 1.0,
    }))


if __name__ == "__main__":
    main()
