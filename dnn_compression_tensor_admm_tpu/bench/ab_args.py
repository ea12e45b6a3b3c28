"""High-n interleaved A/B of dataset-delivery modes on the headline bench.

Round 3 recorded closure 334.1 it/s vs args 312-326 it/s from ONE worktree
A/B — a 6% delta attributed to the ~2% tunnel jitter, which is not a
measurement. This harness settles it:

- three variants of the SAME tk3x headline program:
    args     HBM dataset as jit arguments + epoch-materialized shuffle
             (the committed round-3 design)
    perm     dataset as jit arguments + per-step permutation gather
             (no 150 MB shuffled copy; the gather overlaps with compute)
    closure  dataset inlined as an HLO literal (the round-2 design)
- interleaved rounds with rotating order, so slow machine-state drift
  (tunnel load, thermal) hits every variant equally;
- per-round PAIRED deltas, which cancel the drift the round-3 A/B could
  not;
- optional --slope: each variant also runs at half scan length, and a
  two-point fit splits per-step cost from per-EPOCH overhead (the shuffle
  materialization is per-epoch; dispatch+sync noise is per-epoch too, so
  the slope isolates what the sampling design actually costs per step).

Run (on the TPU host):
    python -m dnn_compression_tensor_admm_tpu.bench.ab_args \
        --rounds 8 --epochs 12 --warmup 2 --slope \
        --out results/ab_args_r04.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import time


VARIANTS = {
    "args": dict(sampling="shuffle", dataset_mode="args"),
    "perm": dict(sampling="perm", dataset_mode="args"),
    "closure": dict(sampling="shuffle", dataset_mode="closure"),
}


def run_once(variant: str, epochs: int, steps: int) -> list:
    """One train_model run of the headline config; returns per-epoch wall
    times (epoch 1 includes compile and is reported for completeness)."""
    from ..train import TrainConfig, train_model
    cfg = TrainConfig(
        model="resnet32", dataset="synthetic-cifar10", batch_size=256,
        steps_per_epoch=steps, epochs=epochs, lr=0.1, smoothing=0.1,
        admm=True, fmt="tk", ratio="3", admm_method="pallas",
        admm_hooi_iters=6, compute_dtype="bfloat16", eval_every=10 ** 9,
        # epoch fusion OFF: this harness isolates the dataset-DELIVERY
        # cost per epoch; fusion would hide it (and 'closure' disables
        # fusion anyway, which would bias the comparison)
        epochs_per_dispatch=1,
        print_fn=lambda *a: None, **VARIANTS[variant])
    _, hist = train_model(cfg)
    return [h["epoch_time_s"] for h in hist]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--warmup", type=int, default=2,
                    help="steady-state epochs exclude the first N")
    ap.add_argument("--steps", type=int, default=196)
    ap.add_argument("--slope", action="store_true",
                    help="also run at steps/2 for a two-point slope fit")
    ap.add_argument("--variants", nargs="*", default=list(VARIANTS))
    ap.add_argument("--out", default="results/ab_args_r04.jsonl")
    args = ap.parse_args()

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    step_grid = [args.steps] + ([args.steps // 2] if args.slope else [])
    rows = []
    for rnd in range(args.rounds):
        order = args.variants[rnd % len(args.variants):] + \
            args.variants[:rnd % len(args.variants)]
        for variant in order:
            for steps in step_grid:
                t0 = time.time()
                times = run_once(variant, args.epochs, steps)
                row = {"round": rnd, "variant": variant, "steps": steps,
                       "epoch_times": [round(t, 4) for t in times],
                       "wall_s": round(time.time() - t0, 1)}
                rows.append(row)
                with open(args.out, "a") as f:
                    f.write(json.dumps(row) + "\n")
                steady = times[args.warmup:]
                print(f"[{rnd}] {variant:8s} steps={steps:3d} "
                      f"median {statistics.median(steady):.4f}s "
                      f"({steps/statistics.median(steady):.1f} it/s)",
                      flush=True)

    summarize(rows, args)


def summarize(rows, args):
    by = {}
    for r in rows:
        by.setdefault((r["variant"], r["steps"]), []).extend(
            r["epoch_times"][args.warmup:])
    print("\n== steady-state epoch time (s) ==")
    stats = {}
    for (v, s), ts in sorted(by.items()):
        med = statistics.median(ts)
        stats[(v, s)] = med
        print(f"{v:8s} steps={s:3d} n={len(ts):3d} median={med:.4f} "
              f"mean={statistics.mean(ts):.4f} "
              f"sd={statistics.stdev(ts):.4f} it/s={s/med:.1f}")
    # paired per-round deltas at full scan length vs 'args'
    print("\n== per-round paired deltas vs args (full steps, median ms) ==")
    per_round = {}
    for r in rows:
        if r["steps"] != args.steps:
            continue
        per_round.setdefault(r["round"], {})[r["variant"]] = \
            statistics.median(r["epoch_times"][args.warmup:])
    for v in args.variants:
        if v == "args":
            continue
        ds = [1000 * (per_round[k][v] - per_round[k]["args"])
              for k in per_round if v in per_round[k] and "args" in per_round[k]]
        if ds:
            m = statistics.mean(ds)
            sd = statistics.stdev(ds) if len(ds) > 1 else 0.0
            print(f"{v:8s} - args: {m:+.1f} ms/epoch (sd {sd:.1f}, n={len(ds)})")
    if args.slope:
        print("\n== two-point decomposition: per-step cost / per-epoch overhead ==")
        for v in args.variants:
            full, half = stats.get((v, args.steps)), stats.get((v, args.steps // 2))
            if full and half:
                slope = (full - half) / (args.steps - args.steps // 2)
                intercept = full - slope * args.steps
                print(f"{v:8s} per-step {1000*slope:.3f} ms "
                      f"per-epoch-overhead {1000*intercept:.1f} ms "
                      f"(asymptotic {1/slope:.1f} it/s)")


if __name__ == "__main__":
    main()
