"""CLI driver: the reference's `python main.py` surface (main.py:30-117,
parse_args.py:9-178) over the TPU-native engine.

Pipeline modes:
  (default)          train (dense baseline, or ADMM with --admm)
  --decompose        factorize a dense checkpoint (--model-path) and fine-tune
  --pretrained       load an already-factorized checkpoint (--model-path)
  --eval             evaluation only
  --runtime          latency benchmark only
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="TPU-native tensor-ADMM compression")
    p.add_argument("--model", default="resnet32", type=str)
    p.add_argument("--dataset", default="cifar10", type=str,
                   help="cifar10|cifar100|mnist|synthetic-<name>")
    p.add_argument("--data-dir", default=None, type=str)
    p.add_argument("--num-classes", default=None, type=int)
    p.add_argument("--batch-size", default=256, type=int)
    p.add_argument("--epochs", default=200, type=int)
    p.add_argument("--steps-per-epoch", default=None, type=int)
    p.add_argument("--synthetic-size", default=None, type=int)
    # optimizer / schedule (reference defaults, parse_args.py:30-68)
    p.add_argument("--opt", default="momentum", type=str)
    p.add_argument("--lr", default=0.1, type=float)
    p.add_argument("--momentum", default=0.9, type=float)
    p.add_argument("--weight-decay", default=1e-4, type=float)
    p.add_argument("--sched", default="cosine", type=str)
    p.add_argument("--warmup-epochs", default=0, type=int)
    p.add_argument("--min-lr", default=1e-5, type=float)
    p.add_argument("--decay-epochs", default=30, type=int)
    p.add_argument("--decay-rate", default=0.1, type=float)
    p.add_argument("--clip-grad", default=None, type=float)
    # augmentation
    p.add_argument("--smoothing", default=0.0, type=float)
    p.add_argument("--mixup", default=0.0, type=float)
    p.add_argument("--cutmix", default=0.0, type=float)
    p.add_argument("--aa", default=None, type=str, metavar="rand-mN-mstdS",
                   help="RandAugment policy string (timm syntax, e.g. "
                        "rand-m9-mstd0.5; reference parse_args.py --aa)")
    p.add_argument("--reprob", default=0.0, type=float,
                   help="RandomErasing probability (reference --reprob)")
    p.add_argument("--repeated-aug", default=0, type=int,
                   help="repeated-augmentation views per image (RASampler)")
    p.add_argument("--epochs-per-dispatch", default=8, type=int,
                   help="fuse up to N (Z-step + epoch-scan) units into one "
                        "device program when no per-epoch observability "
                        "(eval/log/checkpoint/verbose) is requested; 1 "
                        "disables")
    p.add_argument("--sampling", default="perm",
                   choices=["perm", "shuffle", "replacement"],
                   help="'perm'/'shuffle' both give the reference "
                        "DataLoader's without-replacement epoch semantics "
                        "(identical batches for a given seed); 'perm' "
                        "gathers per step instead of materializing a "
                        "shuffled dataset copy (~15%% faster, default); "
                        "'replacement' samples uniformly per step")
    # ADMM (parse_args.py:146-164)
    p.add_argument("--admm", action="store_true")
    p.add_argument("--rho", default=0.001, type=float)
    p.add_argument("--format", dest="fmt", default="tk",
                   choices=["none", "tk", "tt", "svd"])
    p.add_argument("--ratio", default="2", type=str)
    p.add_argument("--tt-type", default="general", choices=["general", "special"])
    p.add_argument("--admm-method", default="pallas",
                   choices=["pallas", "subspace", "gram", "svd", "ns"],
                   help="Z-step subspace solver; 'ns' is the matmul-only "
                        "Newton-Schulz path (no LAPACK/eigh custom calls "
                        "anywhere — the mesh-sharding-friendly variant)")
    p.add_argument("--adjust-rho", action="store_true",
                   help="5x rho boost after 85%% of epochs (reference "
                        "admm.py:87-89; its call site is commented out at "
                        "engines.py:272, so off by default)")
    p.add_argument("--orthogonal", action="store_true")
    # pipeline modes
    p.add_argument("--decompose", action="store_true")
    p.add_argument("--pretrained", action="store_true")
    p.add_argument("--model-path", default=None, type=str)
    p.add_argument("--eval", action="store_true")
    p.add_argument("--runtime", action="store_true")
    # distillation
    p.add_argument("--distillation-type", default="none",
                   choices=["none", "soft", "hard"])
    p.add_argument("--distillation-alpha", default=0.5, type=float)
    p.add_argument("--distillation-tau", default=1.0, type=float)
    p.add_argument("--teacher-model", default=None, type=str)
    p.add_argument("--teacher-path", default=None, type=str)
    # misc
    p.add_argument("--ema-decay", default=0.0, type=float)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--fp32", action="store_true", help="disable bf16 compute")
    p.add_argument("--output-dir", default="saved_models", type=str)
    p.add_argument("--save-model", action="store_true")
    p.add_argument("--save-log", action="store_true")
    p.add_argument("--eval-every", default=1, type=int)
    p.add_argument("--resume", default=None, type=str,
                   help="checkpoint dir to resume full training state from")
    p.add_argument("--checkpoint-dir", default=None, type=str,
                   help="save full training state (incl. ADMM duals) per epoch")
    p.add_argument("--verbose", action="store_true",
                   help="per-layer ADMM residual logging (reference --verbose)")
    p.add_argument("--profile-dir", default=None, type=str,
                   help="write a jax.profiler device trace of the first epoch")
    p.add_argument("--export", default=None, type=str, metavar="PATH",
                   help="after loading/training, export the model as a "
                        "StableHLO artifact (the ONNX-exporter role)")
    p.add_argument("--export-savedmodel", default=None, type=str,
                   metavar="DIR",
                   help="export a TF SavedModel via jax2tf (ONNX-convertible "
                        "offline with tf2onnx; cross-runtime deployment)")
    p.add_argument("--export-onnx", default=None, type=str, metavar="PATH",
                   help="emit a real .onnx file directly (no torch/onnx "
                        "dependency; ResNet families, dense or factorized "
                        "— the reference's convert_onnx_resnet.py role)")
    p.add_argument("--layer-shards", default=1, type=int,
                   help="devices along the mesh 'layer' axis (ADMM Z-step "
                        "layer sharding); the rest go to 'data'")
    p.add_argument("--shard-dir", default=None, type=str,
                   help="directory of DCTA record shards (train-*.dcta / "
                        "val-*.dcta) streamed by the native C++ loader — "
                        "the ImageNet-scale input path (reference "
                        "datasets.py:142-239); build shards with "
                        "tools/imagefolder_to_dcta.py")
    p.add_argument("--loader-workers", default=4, type=int,
                   help="decode threads for the native shard loader")
    p.add_argument("--shard-cache", default=None, choices=["hbm"],
                   help="with --shard-dir: load the shards whole into the "
                        "HBM-resident in-jit pipeline instead of streaming "
                        "(for datasets that fit on device; skips the "
                        "per-step host->HBM hop, which dominates behind "
                        "the axon tunnel)")
    p.add_argument("--flops", action="store_true",
                   help="print FLOPs/params accounting for the model "
                        "(reference forward_flops / compute_flops_params)")
    return p.parse_args(argv)


def _aa_magnitude(aa: str):
    """Parse a timm-style RandAugment policy string ('rand-m9-mstd0.5')
    into (magnitude, magnitude_std); None/'' disables (magnitude 0)."""
    if not aa:
        return 0.0, 0.5
    m, mstd = 9.0, 0.5
    for part in aa.split("-"):
        if part.startswith("mstd"):
            mstd = float(part[4:])
        elif part.startswith("m") and part[1:].replace(".", "").isdigit():
            m = float(part[1:])
    return m, mstd


def main(argv=None):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__)))), ".jax_cache"))
    args = parse_args(argv)

    import jax
    if os.environ.get("DCTA_PLATFORM"):
        # The axon TPU plugin ignores JAX_PLATFORMS; this honors an explicit
        # platform request (e.g. DCTA_PLATFORM=cpu for CI/debug runs).
        jax.config.update("jax_platforms", os.environ["DCTA_PLATFORM"])
    # env-var cache config does not reliably initialize the persistent
    # cache under the axon plugin; the explicit config route does
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from ..configs.resolver import get_rank_plan, strip_format_prefix
    from ..data.datasets import dataset_info, load_dataset
    from ..models import create_model, decompose_params, compression_ratio
    from ..models.registry import parse_compressed_name
    from ..parallel.dist import init_distributed, is_main_process
    from ..train import TrainConfig, train_model, evaluate_model, eval_runtime
    from ..utils import save_variables, load_variables
    import jax
    import jax.numpy as jnp

    # multi-host rendezvous FIRST: jax.distributed.initialize must run
    # before any JAX computation (teacher/checkpoint loading below touches
    # device arrays); single-process it is a no-op (reference main.py:100)
    topo = init_distributed()

    compressed = parse_compressed_name(args.model)
    if args.admm and compressed is not None:
        # guard: ADMM trains the *dense* model (reference main.py:31-32)
        raise SystemExit("ERROR: --admm requires an uncompressed model name")

    cfg = TrainConfig(
        model=args.model, dataset=args.dataset, data_dir=args.data_dir,
        num_classes=args.num_classes, batch_size=args.batch_size,
        epochs=args.epochs, steps_per_epoch=args.steps_per_epoch,
        lr=args.lr, opt=args.opt, sched=args.sched, momentum=args.momentum,
        weight_decay=args.weight_decay, warmup_epochs=args.warmup_epochs,
        min_lr=args.min_lr, decay_epochs=args.decay_epochs,
        decay_rate=args.decay_rate, clip_grad=args.clip_grad,
        smoothing=args.smoothing, mixup=args.mixup, cutmix=args.cutmix,
        randaug_magnitude=_aa_magnitude(args.aa)[0],
        randaug_std=_aa_magnitude(args.aa)[1],
        erase_prob=args.reprob, repeated_aug=args.repeated_aug,
        sampling=args.sampling, epochs_per_dispatch=args.epochs_per_dispatch,
        admm=args.admm, rho=args.rho, fmt=args.fmt, ratio=args.ratio,
        tt_type=args.tt_type, admm_method=args.admm_method,
        adjust_rho_late=args.adjust_rho, orthogonal=args.orthogonal,
        distillation_type=args.distillation_type,
        distillation_alpha=args.distillation_alpha,
        distillation_tau=args.distillation_tau,
        teacher_model=args.teacher_model,
        teacher_variables=(load_variables(args.teacher_path)
                           if args.teacher_path else None),
        ema_decay=args.ema_decay, seed=args.seed,
        resume=args.resume, checkpoint_dir=args.checkpoint_dir,
        verbose_admm=args.verbose, profile_dir=args.profile_dir,
        compute_dtype=None if args.fp32 else "bfloat16",
        synthetic_size=args.synthetic_size, eval_every=args.eval_every,
        shard_dir=args.shard_dir, shard_cache=args.shard_cache,
        loader_workers=args.loader_workers,
    )

    info = dataset_info(args.dataset)
    num_classes = args.num_classes or info.num_classes
    dtype = None if args.fp32 else jnp.bfloat16

    if args.flops:
        # analytic + measured cost report (reference prints per-layer
        # forward_flops in every model's __main__, TTConv.py:155-195)
        from ..utils.flops import model_flops_params
        kw = {"ratio": args.ratio, "tt_type": args.tt_type} if compressed else {}
        model = create_model(args.model, num_classes=num_classes, **kw)
        sz = info.input_size
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, sz, sz, len(info.mean))),
                               train=False)
        rep = model_flops_params(model, variables,
                                 (1, sz, sz, len(info.mean)))
        if compressed is not None:
            base, fmt, _ = compressed
            dense = create_model(base, num_classes=num_classes)
            dvars = dense.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, sz, sz, len(info.mean))),
                               train=False)
            drep = model_flops_params(dense, dvars, (1, sz, sz, len(info.mean)))
            rep["dense_params"] = drep["params"]
            rep["dense_flops"] = drep["flops"]
            rep["param_ratio"] = drep["params"] / rep["params"]
            rep["flop_ratio"] = drep["flops"] / rep["flops"]
        print(json.dumps(rep))
        return

    from ..utils import load_any_variables

    def _template(model_name, compressed_kw=False):
        # flax variables template for mapping torch .pth checkpoints
        # (reference dense checkpoints / torchvision / timm weights)
        kw = ({"ratio": args.ratio, "tt_type": args.tt_type}
              if compressed_kw else {})
        m = create_model(model_name, num_classes=num_classes, **kw)
        sz = info.input_size
        return m.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, sz, sz, len(info.mean))), train=False)

    init_variables = None
    if args.decompose:
        if compressed is None:
            raise SystemExit("ERROR: --decompose needs a compressed model name")
        if not args.model_path:
            raise SystemExit("ERROR: --decompose needs --model-path (dense ckpt)")
        base, fmt, _ = compressed
        dense_vars = load_any_variables(args.model_path,
                                        lambda: _template(base))
        plan = get_rank_plan(args.model, "tk" if fmt == "stftk" else fmt,
                             args.ratio, args.tt_type)
        init_variables = decompose_params(dense_vars, plan)
        print(f"decomposed {args.model_path}: compression "
              f"{compression_ratio(dense_vars, init_variables):.2f}x")
    elif args.pretrained:
        if not args.model_path:
            raise SystemExit("ERROR: --pretrained needs --model-path")
        init_variables = load_any_variables(
            args.model_path,
            lambda: _template(args.model, compressed_kw=compressed is not None))

    if args.eval or args.runtime or args.export or args.export_savedmodel \
            or args.export_onnx:
        kw = {"ratio": args.ratio, "tt_type": args.tt_type} if compressed else {}
        model = create_model(args.model, num_classes=num_classes, dtype=dtype, **kw)
        if init_variables is None:
            if not args.model_path:
                raise SystemExit("ERROR: --eval/--runtime/--export need "
                                 "--model-path")
            init_variables = load_any_variables(
                args.model_path,
                lambda: _template(args.model,
                                  compressed_kw=compressed is not None))
        if args.export or args.export_savedmodel or args.export_onnx:
            sz = info.input_size
            shape = (args.batch_size, sz, sz, len(info.mean))
            if args.export_onnx:
                from ..models.vit import _VIT_CFGS
                from ..utils.onnx_export import export_onnx
                heads = next((h for k, (_, _, h) in _VIT_CFGS.items()
                              if args.model.endswith(k)), None)
                export_onnx(init_variables, args.export_onnx,
                            num_classes=num_classes, input_size=sz,
                            num_heads=heads)
                print(f"exported ONNX model to {args.export_onnx}")
            if args.export:
                from ..utils.export import export_model
                export_model(model, init_variables, shape, args.export)
                print(f"exported StableHLO artifact to {args.export}")
            if args.export_savedmodel:
                from ..utils.export import export_savedmodel
                export_savedmodel(model, init_variables, shape,
                                  args.export_savedmodel)
                print(f"exported SavedModel to {args.export_savedmodel}")
            if not (args.eval or args.runtime):
                return
        if args.runtime:
            r = eval_runtime(model, init_variables, info,
                             batch_size=args.batch_size)
            print(json.dumps(r))
        else:
            x, y, _ = load_dataset(args.dataset, False, args.data_dir,
                                   synthetic_size=args.synthetic_size)
            r = evaluate_model(model, init_variables, x, y, info)
            print(json.dumps(r))
        return

    # default data(+layer) mesh when more than one device is visible
    from ..parallel.mesh import make_mesh
    mesh = None
    if topo["global_devices"] > 1:
        n_layer = min(args.layer_shards, topo["global_devices"])
        if topo["global_devices"] % n_layer != 0:
            # make_mesh would silently truncate to n_data*n_layer devices
            # and idle the rest — reject instead
            raise SystemExit(
                f"ERROR: --layer-shards {n_layer} does not divide the "
                f"{topo['global_devices']} global devices; pick a divisor")
        mesh = make_mesh(n_layer=n_layer)
        if is_main_process():
            print(json.dumps({"mesh": {"data": mesh.shape["data"],
                                       "layer": mesh.shape["layer"]},
                              **topo}))

    ts = time.strftime("%m%d-%H%M%S")
    tag = f"{args.model}_{args.dataset}" + ("_admm_" + args.fmt if args.admm else "")
    if args.save_log:
        os.makedirs(args.output_dir, exist_ok=True)
        cfg.log_path = os.path.join(args.output_dir, f"{tag}_{ts}.log")
    state, history = train_model(cfg, init_variables=init_variables, mesh=mesh)
    if args.save_model:
        os.makedirs(args.output_dir, exist_ok=True)
        path = os.path.join(args.output_dir, f"{tag}_{ts}_model.msgpack")
        save_variables(path, state.variables())
        print(f"saved model to {path}")
    return state, history


if __name__ == "__main__":
    main()
