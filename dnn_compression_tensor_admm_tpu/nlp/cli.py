"""NLP subproject CLI — the reference's script entry points
(xcompression/task_distill.py:1045, general_distill.py:189,
run_glue.py:70, run_squad.py:514) as one `python -m
dnn_compression_tensor_admm_tpu.nlp` driver with subcommands.

    python -m dnn_compression_tensor_admm_tpu.nlp task-distill \
        --task sst-2 --data-dir glue/SST-2 --linear-format tt --ratio 2 \
        --stage1-epochs 3 --stage2-epochs 3
    python -m dnn_compression_tensor_admm_tpu.nlp general-distill --epochs 2
    python -m dnn_compression_tensor_admm_tpu.nlp squad \
        --train-json train-v1.1.json --dev-json dev-v1.1.json

Without --data-dir / --*-json the deterministic synthetic corpora run
(offline mode), same as the test suite.
"""

from __future__ import annotations

import argparse
import dataclasses
import json


def _add_bert_flags(p):
    p.add_argument("--hidden-size", type=int, default=None,
                   help="override BERT hidden size (default: base, 768)")
    p.add_argument("--num-layers", type=int, default=None)
    p.add_argument("--num-heads", type=int, default=None)
    p.add_argument("--intermediate-size", type=int, default=None)
    p.add_argument("--max-seq-length", type=int, default=128)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--vocab-path", type=str, default=None)
    # compression plan (the reference's 16 compressed_modeling variants)
    p.add_argument("--dropout", type=float, default=None,
                   help="override hidden+attention dropout (small synthetic "
                        "configs learn poorly at the BERT default 0.1)")
    p.add_argument("--linear-format", default="tt",
                   choices=["tt", "svd", "none"])
    p.add_argument("--ratio", dest="linear_ratio", type=float, default=2.0)
    p.add_argument("--tt-dim", type=int, default=2)
    p.add_argument("--embedding-format", default="svd",
                   choices=["svd", "tt", "ket", "ketxs", "none"])
    p.add_argument("--embedding-ratio", type=float, default=4.5)


def _bert_config(args):
    from .bert import BertConfig
    cfg = BertConfig()
    over = {k: getattr(args, k) for k in
            ("hidden_size", "num_layers", "num_heads", "intermediate_size")
            if getattr(args, k) is not None}
    if over:
        cfg = dataclasses.replace(cfg, **over)
    if getattr(args, "dropout", None) is not None:
        cfg = dataclasses.replace(cfg, dropout=args.dropout,
                                  attn_dropout=args.dropout)
    return dataclasses.replace(cfg, max_position=max(args.max_seq_length,
                                                     cfg.max_position))


def _plan(args):
    from .bert import BertCompressionPlan
    return BertCompressionPlan(
        linear_format=None if args.linear_format == "none" else args.linear_format,
        linear_ratio=args.linear_ratio, tt_dim=args.tt_dim,
        embedding_format=(None if args.embedding_format == "none"
                          else args.embedding_format),
        embedding_ratio=args.embedding_ratio)


def main(argv=None):
    import os
    if os.environ.get("DCTA_PLATFORM"):
        # honor an explicit platform request (e.g. DCTA_PLATFORM=cpu);
        # some PJRT plugins ignore the JAX_PLATFORMS env var, the config
        # update is the reliable route (same handling as cli/main.py:168)
        import jax
        jax.config.update("jax_platforms", os.environ["DCTA_PLATFORM"])
    ap = argparse.ArgumentParser(prog="dnn_compression_tensor_admm_tpu.nlp",
                                 description=__doc__.split("\n")[0])
    sub = ap.add_subparsers(dest="cmd", required=True)

    td = sub.add_parser("task-distill",
                        help="two-stage GLUE task distillation")
    _add_bert_flags(td)
    td.add_argument("--task", default="sst-2")
    td.add_argument("--data-dir", default=None,
                    help="GLUE task directory (TSV files); default synthetic")
    td.add_argument("--n-synthetic", type=int, default=512,
                    help="synthetic-corpus size (offline mode)")
    td.add_argument("--stage1-epochs", type=int, default=1)
    td.add_argument("--stage2-epochs", type=int, default=1)
    td.add_argument("--lr-stage1", type=float, default=5e-5)
    td.add_argument("--lr-stage2", type=float, default=3e-5)
    td.add_argument("--grad-accum-steps", type=int, default=1)
    td.add_argument("--teacher-epochs", type=int, default=4,
                    help="synthetic-mode teacher fine-tune budget")
    td.add_argument("--teacher-lr", type=float, default=1e-3)
    td.add_argument("--teacher-path", default=None,
                    help="msgpack of fine-tuned dense teacher variables")
    td.add_argument("--save", default=None, help="save student variables to")

    gd = sub.add_parser("general-distill",
                        help="pretraining-corpus distillation")
    _add_bert_flags(gd)
    gd.add_argument("--corpus", default=None,
                    help="text file, one document per line; default synthetic")
    gd.add_argument("--epochs", type=int, default=1)
    gd.add_argument("--lr", type=float, default=1e-4)
    gd.add_argument("--save", default=None)

    sq = sub.add_parser("squad", help="extractive QA fine-tune + EM/F1")
    _add_bert_flags(sq)
    sq.add_argument("--train-json", default=None)
    sq.add_argument("--dev-json", default=None)
    sq.add_argument("--epochs", type=int, default=2)
    sq.add_argument("--lr", type=float, default=5e-4)
    sq.add_argument("--doc-stride", type=int, default=64)
    sq.add_argument("--n-best-size", type=int, default=20)
    sq.add_argument("--max-answer-length", type=int, default=30)
    sq.add_argument("--output-dir", default=None,
                    help="write predictions.json / nbest_predictions.json")
    sq.add_argument("--save", default=None)

    args = ap.parse_args(argv)

    if args.cmd == "task-distill":
        from .task_distill import DistillConfig, run_task_distillation
        teacher_vars = None
        if args.teacher_path:
            from ..utils import load_variables
            teacher_vars = load_variables(args.teacher_path)
        cfg = DistillConfig(
            task=args.task, data_dir=args.data_dir,
            n_synthetic=args.n_synthetic,
            vocab_path=args.vocab_path,
            max_seq_length=args.max_seq_length, batch_size=args.batch_size,
            stage1_epochs=args.stage1_epochs, stage2_epochs=args.stage2_epochs,
            lr_stage1=args.lr_stage1, lr_stage2=args.lr_stage2,
            grad_accum_steps=args.grad_accum_steps, seed=args.seed,
            teacher_epochs=args.teacher_epochs, teacher_lr=args.teacher_lr,
            bert=_bert_config(args), plan=_plan(args))
        variables, history = run_task_distillation(cfg, teacher_vars)
        out = history[-1]
    elif args.cmd == "general-distill":
        from .general_distill import (GeneralDistillConfig,
                                      run_general_distillation)
        texts = None
        if args.corpus:
            with open(args.corpus, encoding="utf-8") as f:
                texts = [l.strip() for l in f if l.strip()]
        cfg = GeneralDistillConfig(
            max_seq_length=args.max_seq_length, batch_size=args.batch_size,
            epochs=args.epochs, lr=args.lr, seed=args.seed,
            bert=_bert_config(args), plan=_plan(args))
        variables, history = run_general_distillation(cfg, texts=texts)
        out = history[-1]
    else:  # squad
        from .squad import SquadConfig, run_squad
        cfg = SquadConfig(
            max_seq_length=args.max_seq_length, doc_stride=args.doc_stride,
            n_best_size=args.n_best_size,
            max_answer_length=args.max_answer_length,
            batch_size=args.batch_size, epochs=args.epochs, lr=args.lr,
            seed=args.seed, output_dir=args.output_dir,
            bert=_bert_config(args), plan=_plan(args))
        variables, history = run_squad(cfg, args.train_json, args.dev_json)
        out = history[-1]

    if getattr(args, "save", None):
        from ..utils import save_variables
        save_variables(args.save, variables)
        print(f"saved student variables to {args.save}")
    print(json.dumps({"final": out}))
    return variables, history


if __name__ == "__main__":
    main()
