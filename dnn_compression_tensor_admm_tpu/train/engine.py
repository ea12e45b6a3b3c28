"""Training/eval loops (reference: engines.py:36-368), TPU-first.

Design: one ADMM epoch is (at most) two compiled programs —
`admm_update` (the Z/U step, vmap-bucketed over layers) and an
X-step program that `lax.scan`s `steps_per_epoch` train steps with
in-jit data sampling/augmentation. The host does nothing per step;
per-epoch it reads back a handful of scalar metrics.
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
import time
from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..admm import admm_init, admm_penalty, admm_update, build_program
from ..admm.regularizers import orthogonal_penalty
from ..configs.resolver import get_rank_plan
from ..data.augment import mixup_cutmix
from ..data.datasets import load_dataset
from ..data.device_pipeline import (augment_batch, batch_at, batch_at_repeated,
                                    eval_batches, sample_batch,
                                    sample_batch_repeated, shuffle_epoch)
from ..models import create_model
from .losses import cross_entropy, distillation_loss, soft_target_cross_entropy
from .optim import make_optimizer, make_schedule
from .state import TrainState, create_train_state


@dataclasses.dataclass
class TrainConfig:
    resume: Optional[str] = None        # checkpoint dir to resume from
    checkpoint_dir: Optional[str] = None  # save full TrainState per epoch
    model: str = "resnet32"
    dataset: str = "cifar10"
    data_dir: Optional[str] = None
    num_classes: Optional[int] = None
    batch_size: int = 256
    epochs: int = 200
    steps_per_epoch: Optional[int] = None  # default: len(train)/batch
    lr: float = 0.1
    opt: str = "momentum"
    sched: str = "cosine"
    momentum: float = 0.9
    weight_decay: float = 1e-4
    warmup_epochs: int = 0
    min_lr: float = 1e-5
    decay_epochs: int = 30
    decay_rate: float = 0.1
    clip_grad: Optional[float] = None
    smoothing: float = 0.0
    mixup: float = 0.0
    cutmix: float = 0.0
    repeated_aug: int = 0   # RASampler equivalent: views per image (0=off)
    randaug_magnitude: float = 0.0  # timm --aa rand-mN (0=off)
    randaug_std: float = 0.5        # -mstdS
    erase_prob: float = 0.0         # timm --reprob
    # ADMM
    admm: bool = False
    rho: float = 0.001
    fmt: str = "tk"
    ratio: str = "3"
    tt_type: str = "general"
    admm_method: str = "pallas"  # fused Pallas TK kernel; falls back to XLA subspace
    admm_hooi_iters: int = 6
    adjust_rho_late: bool = False  # reference has this call commented out
    orthogonal: bool = False
    # distillation
    distillation_type: str = "none"
    distillation_alpha: float = 0.5
    distillation_tau: float = 1.0
    teacher_model: Optional[str] = None
    teacher_variables: Any = None
    # misc
    sampling: str = "perm"       # 'perm' (per-epoch permutation, per-step
                                 #   index gather — reference DataLoader
                                 #   without-replacement semantics with no
                                 #   materialized shuffled copy; measured
                                 #   ~15% faster epochs than 'shuffle' on
                                 #   v5e, results/ab_args_r04.jsonl)
                                 # | 'shuffle' (materialize a shuffled copy,
                                 #   contiguous dynamic-slice batches)
                                 # | 'replacement' (per-step uniform gather)
    dataset_mode: str = "args"   # 'args' (HBM dataset as jit arguments) |
                                 # 'closure' (inlined literal; single-process
                                 #  only, used by bench/ab_args.py A/B)
    epochs_per_dispatch: int = 8  # fuse up to this many (z-step + epoch-scan)
                                  # units into ONE device program when no
                                  # per-epoch observability is requested:
                                  # each host dispatch/sync round-trip under
                                  # the axon tunnel costs ~15 ms, ~45 ms of
                                  # a 510 ms epoch. Auto-disabled by eval
                                  # boundaries, --verbose, --save-log,
                                  # checkpointing, profiling, adjust-rho
                                  # and the streaming path. 1 = off.
    verbose_admm: bool = False   # per-layer ||W-Z|| logging (reference --verbose)
    profile_dir: Optional[str] = None  # write a jax.profiler trace of epoch 1
    ema_decay: float = 0.0
    seed: int = 0
    compute_dtype: Optional[str] = "bfloat16"
    synthetic_size: Optional[int] = None  # cap synthetic dataset size (tests)
    shard_dir: Optional[str] = None   # DCTA record shards -> streaming input
    shard_cache: Optional[str] = None  # 'hbm': load the shard files whole
                                       # into the HBM-resident scan path
                                       # (datasets that fit on device skip
                                       # the per-step host->HBM hop)
    loader_workers: int = 4
    log_path: Optional[str] = None
    eval_every: int = 1
    print_fn: Callable = print


def _criterion(cfg: TrainConfig):
    mix = cfg.mixup > 0 or cfg.cutmix > 0
    if mix:
        return lambda logits, y_soft: soft_target_cross_entropy(logits, y_soft)
    return lambda logits, y: cross_entropy(logits, y, cfg.smoothing)


def make_train_step(model, cfg: TrainConfig, tx, info,
                    program=None, teacher=None, teacher_vars=None, mesh=None):
    """Build the jitted (scanned) X-step for one epoch segment.

    The HBM-resident dataset is a jit ARGUMENT, not a closure: a
    closed-over array inlines into the lowered HLO as a literal
    (measured: a 61 MB uint8 dataset became a 122 MB module), which
    multiplies XLA compile time ~3x and keys the persistent compile
    cache on the data — every new dataset repaid the full compile.
    As arguments, the program is shape-keyed only.

    With a `mesh`, the in-jit sampled batch is sharded over the 'data'
    axis; XLA inserts the gradient reduction over ICI (the reference's
    DDP all-reduce, engines.py:154, with no user-level collective code).
    """
    from ..parallel.mesh import constrain_batch
    mix_active = cfg.mixup > 0 or cfg.cutmix > 0
    criterion = _criterion(cfg)

    def one_step(state: TrainState, rho, step_images, step_labels, i, shuffled,
                 perm=None):
        rng, k_batch, k_aug, k_mix, k_drop = jax.random.split(state.rng, 5)
        if perm is not None:
            # 'perm' sampling: contiguous slice of the epoch permutation,
            # then a 256-row gather from the *unshuffled* dataset. The
            # per-step gather overlaps with compute under XLA; the 150 MB
            # epoch-start materialization of a shuffled copy disappears.
            from ..data.device_pipeline import pl_cdiv
            n = step_images.shape[0]
            base = (pl_cdiv(cfg.batch_size, cfg.repeated_aug)
                    if cfg.repeated_aug > 1 else cfg.batch_size)
            start = (i * base) % max(n - base + 1, 1)
            idx = jax.lax.dynamic_slice_in_dim(perm, start, base)
            if cfg.repeated_aug > 1:
                idx = jnp.repeat(idx, cfg.repeated_aug)[:cfg.batch_size]
            xb = jnp.take(step_images, idx, axis=0)
            yb = jnp.take(step_labels, idx, axis=0)
        elif shuffled:
            if cfg.repeated_aug > 1:
                xb, yb = batch_at_repeated(step_images, step_labels, i,
                                           cfg.batch_size, cfg.repeated_aug)
            else:
                xb, yb = batch_at(step_images, step_labels, i, cfg.batch_size)
        elif cfg.repeated_aug > 1:
            xb, yb = sample_batch_repeated(step_images, step_labels, k_batch,
                                           cfg.batch_size, cfg.repeated_aug)
        else:
            xb, yb = sample_batch(step_images, step_labels, k_batch,
                                  cfg.batch_size)
        xb = constrain_batch(xb, mesh)
        yb = constrain_batch(yb, mesh)
        x = augment_batch(xb, k_aug, mean=info.mean, std=info.std,
                          randaug_magnitude=cfg.randaug_magnitude,
                          randaug_std=cfg.randaug_std,
                          erase_prob=cfg.erase_prob)
        if mix_active:
            x, y_t = mixup_cutmix(x, yb, k_mix, num_classes=info.num_classes,
                                  mixup_alpha=cfg.mixup, cutmix_alpha=cfg.cutmix,
                                  smoothing=cfg.smoothing)
        else:
            y_t = yb

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
            out = model.apply(variables, x, train=True,
                              mutable=["batch_stats"] if state.batch_stats is not None else [],
                              rngs={"dropout": k_drop})
            logits, mut = out if isinstance(out, tuple) else (out, {})
            loss = criterion(logits, y_t)
            if teacher is not None:
                t_logits = jax.lax.stop_gradient(
                    teacher.apply(teacher_vars, x, train=False))
                loss = distillation_loss(loss, logits, t_logits,
                                         cfg.distillation_type,
                                         cfg.distillation_alpha,
                                         cfg.distillation_tau)
            if program is not None:
                loss = loss + admm_penalty(params, state.admm, program, rho)
            if cfg.orthogonal:
                loss = loss + orthogonal_penalty(params, rho)
            return loss, (mut.get("batch_stats"), logits)

        (loss, (new_bs, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None:
            d = cfg.ema_decay
            ema = jax.tree.map(lambda e, p: d * e + (1 - d) * p, ema, new_params)
        acc = jnp.mean((jnp.argmax(logits, -1) == yb).astype(jnp.float32))
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs if new_bs is not None else state.batch_stats,
                                  opt_state=new_opt, ema_params=ema, rng=rng)
        return new_state, {"loss": loss, "acc": acc}

    def scan_epoch(state: TrainState, rho, images, labels, num_steps: int):
        """One epoch: resolve the sampling mode (epoch-shuffle sampling
        needs n >= batch; tiny test datasets fall back to per-step
        with-replacement gathers — static, depends only on the argument's
        shape), then scan `num_steps` train steps. Shared by the
        per-epoch program and the fused multi-epoch program so the two
        can never drift apart."""
        mode = (cfg.sampling if images.shape[0] >= cfg.batch_size
                else "replacement")
        shuffled = mode == "shuffle"
        perm = None
        step_images, step_labels = images, labels
        if mode in ("shuffle", "perm"):
            k_shuf, rng = jax.random.split(state.rng)
            state = state.replace(rng=rng)
            if shuffled:
                step_images, step_labels = shuffle_epoch(images, labels,
                                                         k_shuf)
            else:
                perm = jax.random.permutation(k_shuf, images.shape[0])

        def body(s, i):
            return one_step(s, rho, step_images, step_labels, i, shuffled,
                            perm)
        state, metrics = jax.lax.scan(body, state, jnp.arange(num_steps))
        return state, jax.tree.map(jnp.mean, metrics)

    @partial(jax.jit, static_argnames=("num_steps",), donate_argnums=(0,))
    def run_steps(state: TrainState, rho, images, labels, num_steps: int):
        return scan_epoch(state, rho, images, labels, num_steps)

    @partial(jax.jit, static_argnames=("num_steps", "num_epochs"),
             donate_argnums=(0,))
    def run_epochs(state: TrainState, rho, images, labels, num_steps: int,
                   num_epochs: int):
        """Several (Z/U-step + epoch scan) units in ONE device program.

        The host's per-epoch work is two dispatches and a sync round-trip
        — ~45 ms of a 510 ms epoch under the axon tunnel. When nothing
        per-epoch is observed (no eval/log/checkpoint boundary), the
        whole chunk runs device-side and the host reads back one stacked
        [num_epochs] metrics tree. Z/U ordering per epoch is identical to
        the unfused loop (projection first, then the X-step scan)."""
        from ..admm import admm_update

        def epoch_body(state, _e):
            if program is not None:
                new_admm, _res = admm_update(
                    state.params, state.admm, program=program, update_u=True,
                    method=cfg.admm_method, n_iter=cfg.admm_hooi_iters,
                    mesh=mesh)
                state = state.replace(admm=new_admm)
            return scan_epoch(state, rho, images, labels, num_steps)

        state, metrics = jax.lax.scan(epoch_body, state,
                                      jnp.arange(num_epochs))
        return state, metrics  # metric leaves have shape [num_epochs]

    return run_steps, run_epochs


def make_streaming_step(model, cfg: TrainConfig, tx, info, program=None,
                        teacher=None, teacher_vars=None, mesh=None):
    """Per-batch jitted step fed by the native C++ shard loader
    (ImageNet-scale path; the CIFAR-scale path keeps the in-HBM scan)."""
    from ..parallel.mesh import constrain_batch
    criterion = _criterion(cfg)
    mix_active = cfg.mixup > 0 or cfg.cutmix > 0

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, rho, xb_u8, yb):
        rng, k_aug, k_mix, k_drop = jax.random.split(state.rng, 4)
        xb_u8 = constrain_batch(xb_u8, mesh)
        yb = constrain_batch(yb, mesh)
        x = augment_batch(xb_u8, k_aug, mean=info.mean, std=info.std,
                          randaug_magnitude=cfg.randaug_magnitude,
                          randaug_std=cfg.randaug_std,
                          erase_prob=cfg.erase_prob)
        if mix_active:
            x, y_t = mixup_cutmix(x, yb, k_mix, num_classes=info.num_classes,
                                  mixup_alpha=cfg.mixup, cutmix_alpha=cfg.cutmix,
                                  smoothing=cfg.smoothing)
        else:
            y_t = yb

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
            out = model.apply(variables, x, train=True,
                              mutable=["batch_stats"] if state.batch_stats is not None else [],
                              rngs={"dropout": k_drop})
            logits, mut = out if isinstance(out, tuple) else (out, {})
            loss = criterion(logits, y_t)
            if teacher is not None:
                t_logits = jax.lax.stop_gradient(
                    teacher.apply(teacher_vars, x, train=False))
                loss = distillation_loss(loss, logits, t_logits,
                                         cfg.distillation_type,
                                         cfg.distillation_alpha,
                                         cfg.distillation_tau)
            if program is not None:
                loss = loss + admm_penalty(params, state.admm, program, rho)
            if cfg.orthogonal:
                loss = loss + orthogonal_penalty(params, rho)
            return loss, (mut.get("batch_stats"), logits)

        (loss, (new_bs, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None:
            d = cfg.ema_decay
            ema = jax.tree.map(lambda e, p: d * e + (1 - d) * p, ema, new_params)
        acc = jnp.mean((jnp.argmax(logits, -1) == yb).astype(jnp.float32))
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs if new_bs is not None else state.batch_stats,
                                  opt_state=new_opt, ema_params=ema, rng=rng)
        return new_state, {"loss": loss, "acc": acc}

    return step


def make_eval_step(model, mean=None, std=None):
    """Jitted eval over one padded batch. With `mean`/`std` the batch is
    accepted as raw uint8 and normalized in-program — the host then ships
    uint8 instead of float32 (4x less transfer; under the axon tunnel the
    host->device copy is the eval bottleneck)."""
    @jax.jit
    def eval_step(variables, x, y, valid):
        if mean is not None:
            from ..data.device_pipeline import normalize
            x = normalize(x, mean, std)
        logits = model.apply(variables, x, train=False)
        logits = logits.astype(jnp.float32)
        top1 = (jnp.argmax(logits, -1) == y)
        top5 = jnp.any(jnp.argsort(logits, axis=-1)[:, -5:] == y[:, None], axis=-1)
        loss = -jnp.take_along_axis(jax.nn.log_softmax(logits), y[:, None], 1)[:, 0]
        v = valid.astype(jnp.float32)
        return (jnp.sum(top1 * v), jnp.sum(top5 * v), jnp.sum(loss * v), jnp.sum(v))
    eval_step.takes_uint8 = mean is not None
    return eval_step


def evaluate_model(model, variables, x_np, y_np, info, batch_size=512,
                   eval_step=None, mesh=None):
    """Top-1/top-5/loss over a numpy eval set (reference evaluate,
    engines.py:36-65, run under DDP with a DistributedSampler).

    With `mesh` on a multi-process launch the global-batch path is
    REQUIRED: plain jit over process-local batches mixed with the
    mesh-global replicated params rejects the non-addressable inputs.
    Single-process, any mesh degenerates to sharded device_puts, so the
    virtual 8-device mesh exercises the identical code path."""
    if eval_step is None:
        eval_step = make_eval_step(model, info.mean, info.std)
    if mesh is not None:
        return _evaluate_on_mesh(variables, x_np, y_np, info, mesh,
                                 batch_size, eval_step)
    in_jit_norm = getattr(eval_step, "takes_uint8", False)
    t1 = t5 = ls = n = 0.0
    mean = np.asarray(info.mean) * 255.0
    std = np.asarray(info.std) * 255.0
    for xb, yb, valid in eval_batches(x_np, y_np, batch_size):
        xf = xb if in_jit_norm else (xb.astype(np.float32) - mean) / std
        a, b, c, d = eval_step(variables, jnp.asarray(xf), jnp.asarray(yb),
                               jnp.asarray(valid))
        t1 += float(a); t5 += float(b); ls += float(c); n += float(d)
    return {"acc1": 100.0 * t1 / n, "acc5": 100.0 * t5 / n, "loss": ls / n}


def _evaluate_on_mesh(variables, x_np, y_np, info, mesh, batch_size,
                      eval_step):
    """Mesh-global eval: every process holds the full val set (val shards
    are read whole per process), takes the strided slice
    process_index::process_count, and contributes its rows of each global
    batch via `make_array_from_process_local_data`; the jitted step's
    sums over the 'data'-sharded batch lower to psums, so every process
    reads identical replicated totals."""
    import math
    from jax.sharding import NamedSharding, PartitionSpec as P
    pc, pi = jax.process_count(), jax.process_index()
    n_data = mesh.shape.get("data", 1)
    lcm = math.lcm(n_data, pc)
    batch_size = max(1, batch_size // lcm) * lcm
    per_proc = batch_size // pc
    lx, ly = x_np[pi::pc], y_np[pi::pc]
    # identical step count on every process, from the GLOBAL set size
    max_local = -(-len(x_np) // pc)
    steps = max(1, -(-max_local // per_proc))
    in_jit_norm = getattr(eval_step, "takes_uint8", False)
    mean = np.asarray(info.mean) * 255.0
    std = np.asarray(info.std) * 255.0
    sx = None
    sy = NamedSharding(mesh, P("data"))
    t1 = t5 = ls = n = 0.0
    for s in range(steps):
        lo = s * per_proc
        xb, yb = lx[lo:lo + per_proc], ly[lo:lo + per_proc]
        k = len(xb)
        if k < per_proc:
            xb = np.concatenate([xb, np.zeros((per_proc - k,) + xb.shape[1:],
                                              xb.dtype)]) if k else \
                np.zeros((per_proc,) + lx.shape[1:], lx.dtype)
            yb = np.concatenate([yb, np.zeros(per_proc - k, y_np.dtype)])
        valid = (np.arange(per_proc) < k).astype(np.float32)
        xf = xb if in_jit_norm else (xb.astype(np.float32) - mean) / std
        xf = np.ascontiguousarray(xf)
        if sx is None:
            sx = NamedSharding(mesh, P("data", *([None] * (xf.ndim - 1))))
        gx = jax.make_array_from_process_local_data(
            sx, xf, global_shape=(batch_size,) + xf.shape[1:])
        gy = jax.make_array_from_process_local_data(
            sy, np.ascontiguousarray(yb), global_shape=(batch_size,))
        gv = jax.make_array_from_process_local_data(
            sy, valid, global_shape=(batch_size,))
        a, b, c, d = eval_step(variables, gx, gy, gv)
        t1 += float(a); t5 += float(b); ls += float(c); n += float(d)
    return {"acc1": 100.0 * t1 / n, "acc5": 100.0 * t5 / n, "loss": ls / n}


def eval_runtime(model, variables, info, batch_size=256, iters=50, warmup=5):
    """Per-image latency benchmark (reference eval_runtime,
    engines.py:79-107): report ms/image over repeated timed sweeps."""
    from ..utils.profiling import device_sync
    x = jnp.zeros((batch_size, info.input_size, info.input_size, len(info.mean)))
    f = jax.jit(lambda v, x: model.apply(v, x, train=False))
    for _ in range(warmup + 1):
        y = f(variables, x)
    device_sync(y)  # block_until_ready is unreliable under axon; force a fetch
    t0 = time.perf_counter()
    for _ in range(iters):
        y = f(variables, x)
    device_sync(y)
    dt = time.perf_counter() - t0
    return {"ms_per_image": 1000.0 * dt / (iters * batch_size),
            "images_per_s": iters * batch_size / dt}


def train_model(cfg: TrainConfig, *, init_variables=None, max_epochs=None,
                mesh=None):
    """Full training pipeline (reference train(), engines.py:110-368).

    Returns (state, history). `init_variables` (e.g. from
    `decompose_params`) overrides random init for the fine-tune phase.
    """
    log = cfg.print_fn
    streaming = cfg.shard_dir is not None
    if streaming:
        import glob as _glob
        from ..data.datasets import dataset_info as _di
        from ..data.native_loader import NativeLoader
        from ..data.records import read_shard
        info = _di(cfg.dataset)
        train_paths = sorted(_glob.glob(os.path.join(cfg.shard_dir, "train-*.dcta")))
        val_paths = sorted(_glob.glob(os.path.join(cfg.shard_dir, "val-*.dcta")))
        if not train_paths:
            raise FileNotFoundError(f"no train-*.dcta shards in {cfg.shard_dir}")
        x_va, y_va = (np.concatenate(a) for a in zip(*(read_shard(p) for p in val_paths))) \
            if val_paths else (None, None)
        if cfg.shard_cache == "hbm":
            # read the shard files whole and fall through to the
            # HBM-resident scan path (every process reads all shards; the
            # multi-process branch below then contributes its slice of
            # the one global dataset, exactly like a directly-loaded set)
            x_tr, y_tr = (np.concatenate(a) for a in
                          zip(*(read_shard(p) for p in train_paths)))
            streaming = False
        else:
            # multi-host streaming: each process loads its partition of
            # the shard files and contributes batch/process_count rows per
            # step; the global batch is assembled below
            # (parallel/dist.py::make_global_batch_fn). The GLOBAL sample
            # count is taken from every shard header BEFORE partitioning
            # so steps (and the LR-schedule length) are identical on every
            # process even when the file split is uneven — otherwise
            # processes dispatch different numbers of collective-bearing
            # steps on the same mesh and hang.
            from ..data.records import shard_sample_count
            from ..parallel.dist import partition_shard_paths
            global_samples = sum(shard_sample_count(p) for p in train_paths)
            train_paths, loader_seed, loader_stride, loader_offset = \
                partition_shard_paths(train_paths, jax.process_index(),
                                      jax.process_count(), cfg.seed)
    else:
        x_tr, y_tr, info = load_dataset(cfg.dataset, True, cfg.data_dir,
                                        synthetic_size=cfg.synthetic_size)
        x_va, y_va, _ = load_dataset(cfg.dataset, False, cfg.data_dir,
                                     synthetic_size=(cfg.synthetic_size // 4
                                                     if cfg.synthetic_size else None))
    num_classes = cfg.num_classes or info.num_classes

    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    model = create_model(cfg.model, num_classes=num_classes, dtype=dtype,
                         **({"ratio": cfg.ratio, "tt_type": cfg.tt_type}
                            if _is_compressed(cfg.model) else {}))

    if streaming:
        per_proc_batch = cfg.batch_size // jax.process_count()
        if per_proc_batch * jax.process_count() != cfg.batch_size:
            raise ValueError(f"--batch-size {cfg.batch_size} must divide "
                             f"across {jax.process_count()} processes")
        loader = NativeLoader(train_paths, per_proc_batch,
                              workers=cfg.loader_workers, seed=loader_seed,
                              drop_last=True, loop=True,
                              stride=loader_stride, offset=loader_offset)
        # steps from the GLOBAL count (identical on every process; the
        # looped loader serves any number of per-process batches)
        steps = cfg.steps_per_epoch or max(1, global_samples // cfg.batch_size)
    else:
        steps = cfg.steps_per_epoch or max(1, len(x_tr) // cfg.batch_size)
    sched = make_schedule(cfg.sched, cfg.lr, cfg.epochs, steps,
                          cfg.warmup_epochs, cfg.min_lr, cfg.decay_epochs,
                          cfg.decay_rate)
    tx = make_optimizer(cfg.opt, sched, momentum=cfg.momentum,
                        weight_decay=cfg.weight_decay, clip_grad=cfg.clip_grad,
                        stiefel=cfg.model.startswith("stf"))

    rng = jax.random.PRNGKey(cfg.seed)
    sample = jnp.zeros((1, info.input_size, info.input_size, len(info.mean)))
    state = create_train_state(model, tx, rng, sample,
                               ema=cfg.ema_decay > 0)
    if init_variables is not None:
        state = state.replace(params=init_variables["params"],
                              batch_stats=init_variables.get("batch_stats",
                                                             state.batch_stats))

    # Multi-process: jit over a mesh with non-addressable devices rejects
    # process-local inputs, so the (identically-seeded) state becomes one
    # replicated global array per leaf before any sharded computation runs
    # (the reference replicates via DDP broadcast, engines.py:154).
    multi_process = mesh is not None and jax.process_count() > 1
    # multi-process eval must go through the mesh-global batch path
    # (plain jit rejects local batches mixed with global params);
    # single-process the local path is equivalent and cheaper
    eval_mesh = mesh if multi_process else None
    if multi_process:
        from ..parallel.dist import replicate_state_global
        state = replicate_state_global(state, mesh)

    program = None
    if cfg.admm:
        plan = get_rank_plan(cfg.model, cfg.fmt, cfg.ratio, cfg.tt_type)
        program = build_program(state.params, plan)
        state = state.replace(admm=admm_init(state.params, program))
        z_step = jax.jit(partial(admm_update, program=program, update_u=False,
                                 method=cfg.admm_method, n_iter=cfg.admm_hooi_iters,
                                 mesh=mesh))
        zu_step = jax.jit(partial(admm_update, program=program, update_u=True,
                                  method=cfg.admm_method, n_iter=cfg.admm_hooi_iters,
                                  mesh=mesh))
        new_admm, _ = z_step(state.params, state.admm)  # engines.py:245
        state = state.replace(admm=new_admm)

    teacher = None
    teacher_vars = None
    if cfg.distillation_type != "none":
        # reference builds the teacher via timm create_model and runs it
        # frozen inside the step (engines.py:191-214)
        if cfg.teacher_model is None:
            raise ValueError("distillation requires teacher_model")
        teacher = create_model(cfg.teacher_model, num_classes=num_classes,
                               dtype=dtype)
        if cfg.teacher_variables is not None:
            teacher_vars = cfg.teacher_variables
        else:
            teacher_vars = teacher.init(jax.random.PRNGKey(cfg.seed + 1), sample,
                                        train=False)

    info_nc = (dataclasses.replace(info) if num_classes == info.num_classes
               else dataclasses.replace(info, num_classes=num_classes))
    if streaming:
        stream_step = make_streaming_step(model, cfg, tx, info_nc,
                                          program=program, teacher=teacher,
                                          teacher_vars=teacher_vars, mesh=mesh)
        from ..data.device_pipeline import prefetch_to_device
        put = None
        if mesh is not None:
            from ..parallel.dist import make_global_batch_fn
            put = make_global_batch_fn(mesh, cfg.batch_size)
        stream_iter = prefetch_to_device(iter(loader), size=2, put=put)
        run_steps = run_epochs_fn = None
    else:
        if multi_process:
            # each process contributes its slice of one globally-sharded
            # HBM-resident dataset (DistributedSampler role, datasets.py:87-100)
            from ..parallel.dist import shard_dataset_global
            images, labels = shard_dataset_global(np.asarray(x_tr),
                                                  np.asarray(y_tr), mesh)
        else:
            images = jnp.asarray(x_tr)
            labels = jnp.asarray(y_tr)
        run_steps, run_epochs_fn = make_train_step(
            model, cfg, tx, info_nc, program=program, teacher=teacher,
            teacher_vars=teacher_vars, mesh=mesh)
        if cfg.dataset_mode == "closure":
            # A/B instrumentation (bench/ab_args.py): inline the dataset
            # into the program as a literal, the round-2 design. Keyed on
            # the data in the compile cache and incompatible with
            # multi-host global arrays — not for production runs.
            if multi_process:
                raise ValueError("dataset_mode='closure' is single-process")
            inner, imgs_c, lbls_c = run_steps, images, labels

            @partial(jax.jit, static_argnames=("num_steps",),
                     donate_argnums=(0,))
            def run_steps_closure(state, rho, num_steps: int):
                return inner(state, rho, imgs_c, lbls_c, num_steps)
            run_steps = lambda state, rho, _i, _l, n: run_steps_closure(state, rho, n)  # noqa: E731
    eval_step = make_eval_step(model, info.mean, info.std)

    start_epoch = 0
    if cfg.resume:
        from ..utils.checkpoint import load_train_state
        state, extra = load_train_state(cfg.resume, state,
                                        extra_template={"epoch": 0})
        start_epoch = int(extra["epoch"]) + 1 if extra else 0
        log(f"resumed from {cfg.resume} at epoch {start_epoch}")

    from ..utils.profiling import PhaseTimer, trace
    timer = PhaseTimer()
    history = []
    epochs = max_epochs or cfg.epochs
    # Epoch-chunk fusion (see run_epochs): legal exactly when the host
    # observes nothing per epoch — any eval/log/checkpoint/profile/
    # verbose/adjust-rho boundary falls back to the per-epoch path.
    chunkable = (not streaming and run_epochs_fn is not None
                 and cfg.epochs_per_dispatch > 1
                 and cfg.dataset_mode != "closure"
                 and not cfg.verbose_admm and not cfg.log_path
                 and cfg.checkpoint_dir is None and cfg.profile_dir is None
                 and not cfg.adjust_rho_late)

    epoch = start_epoch
    while epoch < epochs:
        rho = cfg.rho
        k = 1
        if chunkable:
            if x_va is not None and cfg.eval_every <= epochs:
                nxt = ((epoch // cfg.eval_every) + 1) * cfg.eval_every
            else:
                nxt = epochs
            k = max(1, min(cfg.epochs_per_dispatch, nxt - epoch,
                           epochs - epoch))
        if k > 1:
            t0 = time.time()
            state, mstack = run_epochs_fn(state, rho, images, labels,
                                          steps, k)
            from ..utils.profiling import device_sync
            device_sync(mstack)
            dt = (time.time() - t0) / k
            losses = np.asarray(jax.device_get(mstack["loss"]), np.float32)
            accs = np.asarray(jax.device_get(mstack["acc"]), np.float32)
            for j in range(k):
                train_loss = float(losses[j])
                if not math.isfinite(train_loss):
                    raise FloatingPointError(
                        f"loss is {train_loss}, stopping")  # engines.py:302-304
                row = {"epoch": epoch + j + 1, "train_loss": train_loss,
                       "train_acc": float(accs[j]), "epoch_time_s": dt}
                if j == k - 1 and x_va is not None and \
                        ((epoch + k) % cfg.eval_every == 0
                         or epoch + k == epochs):
                    t_ev = time.time()
                    ev = evaluate_model(model, state.variables(), x_va, y_va,
                                        info, eval_step=eval_step, mesh=eval_mesh)
                    row.update({f"test_{kk}": v for kk, v in ev.items()})
                    row["eval_time_s"] = round(time.time() - t_ev, 4)
                    if cfg.ema_decay > 0:
                        ev_ema = evaluate_model(model,
                                                state.variables(use_ema=True),
                                                x_va, y_va, info,
                                                eval_step=eval_step, mesh=eval_mesh)
                        row.update({f"ema_{kk}": v for kk, v in ev_ema.items()})
                history.append(row)
                log(json.dumps(row))
            epoch += k
            continue
        t0 = time.time()
        rho = cfg.rho * (5.0 if (cfg.adjust_rho_late and
                                 epoch > int(0.85 * cfg.epochs)) else 1.0)
        if cfg.admm:
            with timer.phase("z_step"):
                new_admm, residuals = zu_step(state.params, state.admm)  # engines.py:270-271
                # a real device barrier makes the z/x phase split
                # meaningful (block_until_ready returns early under
                # axon), but costs a host round-trip per epoch — only
                # pay it when phase timing is being observed; without
                # --verbose/--profile-dir the z_step row is dispatch-only
                from ..utils.profiling import device_sync
                if cfg.verbose_admm or cfg.profile_dir:
                    device_sync(residuals)
            state = state.replace(admm=new_admm)
            per_layer_res = None
            if cfg.verbose_admm or cfg.log_path:
                # ONE stacked device fetch for all layers (serial float()
                # per layer would be ~30 tunnel round-trips per epoch)
                keys = sorted(residuals)
                vals = np.asarray(jax.device_get(
                    jnp.stack([residuals[k] for k in keys])))
                per_layer_res = {k: round(float(v), 5)
                                 for k, v in zip(keys, vals)}
            if cfg.verbose_admm:
                # reference --verbose: per-layer norm(w-z) (admm.py:77-78)
                log(json.dumps({"admm_residuals": per_layer_res}))
        prof_ctx = (trace(cfg.profile_dir)
                    if (cfg.profile_dir and epoch == start_epoch) else None)
        if prof_ctx is not None:
            prof_ctx.__enter__()
        if streaming:
            accs, losses = [], []
            for _ in range(steps):
                xb, yb = next(stream_iter)  # already on device (prefetched)
                state, metrics = stream_step(state, rho, xb, yb)
                losses.append(metrics["loss"]); accs.append(metrics["acc"])
            metrics = {"loss": jnp.mean(jnp.stack(losses)),
                       "acc": jnp.mean(jnp.stack(accs))}
        else:
            with timer.phase("x_step_scan"):
                state, metrics = run_steps(state, rho, images, labels, steps)
                # device_sync (a host fetch) is the only reliable barrier
                # under axon — block_until_ready returns early there — and
                # the fetched scalars are consumed right below, so the one
                # round-trip per epoch is free
                from ..utils.profiling import device_sync
                device_sync(metrics)
        if prof_ctx is not None:
            prof_ctx.__exit__(None, None, None)
        train_loss = float(metrics["loss"])
        if not math.isfinite(train_loss):
            raise FloatingPointError(f"loss is {train_loss}, stopping")  # engines.py:302-304
        row = {"epoch": epoch + 1, "train_loss": train_loss,
               "train_acc": float(metrics["acc"]),
               "epoch_time_s": time.time() - t0}
        if cfg.admm and per_layer_res is not None:
            # convergence-onto-manifold signal in the persistent log: the
            # reference's --log records the per-layer ||W-Z|| HISTORY
            # (admm.py:24-26) — carry the full dict in every logged row
            # (one stacked fetch per epoch, already paid above) plus the
            # total; gated so pure-throughput runs (bench) pay nothing
            row["admm_residual_total"] = round(
                float(sum(per_layer_res.values())), 5)
            if cfg.log_path:
                row["admm_residuals"] = per_layer_res
        if ((epoch + 1) % cfg.eval_every == 0 or epoch + 1 == epochs) \
                and x_va is not None:
            t_ev = time.time()
            ev = evaluate_model(model, state.variables(), x_va, y_va, info,
                                eval_step=eval_step, mesh=eval_mesh)
            row.update({f"test_{k}": v for k, v in ev.items()})
            row["eval_time_s"] = round(time.time() - t_ev, 4)
            if cfg.ema_decay > 0:
                # the EMA shadow exists to be *evaluated* (reference
                # model_ema, engines.py:143-150,349) — report it alongside
                # the raw params every eval epoch
                ev_ema = evaluate_model(model, state.variables(use_ema=True),
                                        x_va, y_va, info, eval_step=eval_step, mesh=eval_mesh)
                row.update({f"ema_{k}": v for k, v in ev_ema.items()})
        history.append(row)
        log(json.dumps(row))
        if cfg.checkpoint_dir:
            from ..utils.checkpoint import save_train_state
            save_train_state(cfg.checkpoint_dir, state, {"epoch": epoch})
        if cfg.log_path:
            with open(cfg.log_path, "a") as f:
                f.write(json.dumps(row) + "\n")
        epoch += 1
    if cfg.admm or cfg.profile_dir:
        timer.log(log)
    return state, history


def _is_compressed(name: str) -> bool:
    from ..models.registry import parse_compressed_name
    return parse_compressed_name(name) is not None
