"""CLI: ``python -m pcseg_tpu.cli {train,infer,bench,synth} [...]``.

The reference has no CLI — its ``__main__`` unconditionally trains then
runs an inference demo (pcs.py:463-484). Here those are subcommands with
every hardcoded literal exposed as a ``--section.field=value`` override
(core/config.py documents the reference defaults).
"""

from __future__ import annotations

import argparse
import json
import sys

from pcseg_tpu.core.config import Config, apply_overrides


def _add_overrides(p: argparse.ArgumentParser):
    p.add_argument(
        "overrides",
        nargs="*",
        help="config overrides, e.g. optim.lr=3e-4 data.batch_size=32",
    )


def cmd_train(args) -> int:
    from pcseg_tpu.api import fit
    from pcseg_tpu.infer import inference_example
    from pcseg_tpu.data.hdf5 import PointCloudDataset

    cfg = Config()
    if args.data:
        cfg.data.data_path = args.data
    if args.labels:
        cfg.data.label_path = args.labels
    apply_overrides(cfg, args.overrides)
    resume_from = args.resume
    if resume_from == "auto":
        # continue from the rolling 'latest' checkpoint if one exists
        import os

        candidate = os.path.join(cfg.train.checkpoint_dir, "latest")
        resume_from = candidate if os.path.isdir(candidate) else None
    result = fit(config=cfg, resume_from=resume_from)
    print(
        json.dumps(
            {
                "best_epoch": result.best_epoch,
                "best_f1_target": result.best_f1_target,
                "best_val_loss": result.best_val_loss,
                "checkpoint": result.checkpoint_path,
            }
        )
    )
    if args.demo:
        # reference __main__ behavior: run the inference demo after
        # training (pcs.py:470-477)
        try:
            with PointCloudDataset(
                cfg.data.data_path, cfg.data.label_path
            ) as ds:
                inference_example(result.checkpoint_path, ds, event_idx=0)
        except Exception as e:  # mirror of pcs.py:473-477
            print(f"inference demo failed: {e}", file=sys.stderr)
    return 0


def cmd_infer(args) -> int:
    from pcseg_tpu.data.hdf5 import PointCloudDataset
    from pcseg_tpu.infer import Predictor

    predictor = Predictor.from_checkpoint(args.checkpoint)
    with PointCloudDataset(args.data, args.labels) as ds:
        points, true_labels = ds[args.event]
        preds = predictor.predict(points)
        acc = float((preds == true_labels).mean()) * 100.0
    print(
        json.dumps(
            {
                "event": args.event,
                "num_points": int(points.shape[0]),
                "accuracy": acc,
                "predictions": preds.tolist() if args.dump else None,
            }
        )
    )
    return 0


def cmd_eval(args) -> int:
    from pcseg_tpu.api import evaluate

    m = evaluate(
        args.checkpoint, data_path=args.data, label_path=args.labels
    )
    m.pop("confusion")
    print(json.dumps(m))
    return 0


def cmd_synth(args) -> int:
    from pcseg_tpu.data.hdf5 import write_event_files
    from pcseg_tpu.data.synthetic import synthetic_events

    n = write_event_files(
        args.data,
        args.labels,
        synthetic_events(
            args.events,
            num_classes=args.classes,
            min_points=args.min_points,
            max_points=args.max_points,
            seed=args.seed,
        ),
    )
    print(json.dumps({"events": n, "data": args.data, "labels": args.labels}))
    return 0


def cmd_export(args) -> int:
    """AOT-export a checkpoint's serving forward (serve.py artifact)."""
    from pcseg_tpu.infer import Predictor
    from pcseg_tpu.serve import export_predictor

    kw = {}
    if args.dtype:
        kw["dtype"] = args.dtype
    predictor = Predictor.from_checkpoint(
        args.checkpoint, fold=not args.no_fold, **kw
    )
    manifest = export_predictor(
        predictor,
        args.out,
        batch_sizes=tuple(int(x) for x in args.batch_sizes.split(",")),
        buckets=(
            tuple(int(x) for x in args.buckets.split(","))
            if args.buckets else None
        ),
        platforms=tuple(args.platforms.split(",")) if args.platforms else None,
    )
    print(json.dumps({"exported": args.out, **manifest}))
    return 0


def cmd_bench(args) -> int:
    from pcseg_tpu import bench

    bench.main()
    return 0


def cmd_convert(args) -> int:
    """Convert checkpoints between framework and reference .pth formats."""
    from pcseg_tpu.ckpt.checkpoint import load_checkpoint, save_checkpoint
    from pcseg_tpu.ckpt.torch_import import (
        export_torch_state_dict,
        load_best_model_pth,
    )

    if args.src.endswith(".pth"):
        variables, meta = load_best_model_pth(args.src)
        save_checkpoint(
            args.dst,
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            metadata=meta,
        )
        print(json.dumps({"converted": args.dst, "from": "pth", **{
            k: meta[k] for k in ("num_classes", "epoch") if k in meta}}))
    else:
        import torch

        raw, meta = load_checkpoint(args.src)
        sd = export_torch_state_dict(
            {"params": raw["params"], "batch_stats": raw["batch_stats"]}
        )
        torch.save(
            {
                "epoch": meta.get("epoch", 0),
                "model_state_dict": {
                    k: torch.tensor(v) for k, v in sd.items()
                },
                "optimizer_state_dict": {},
                "train_loss": meta.get("train_loss", 0.0),
                "val_loss": meta.get("val_loss", 0.0),
                "f1_class2": meta.get("f1_class_target", 0.0),
                "f1_per_class": meta.get("f1_per_class", []),
                "num_classes": meta["num_classes"],
            },
            args.dst,
        )
        print(json.dumps({"converted": args.dst, "to": "pth"}))
    return 0


def main(argv=None) -> int:
    from pcseg_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(prog="pcseg_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("train", help="train a model (reference train_model)")
    p.add_argument("--data", help="HDF5 points file")
    p.add_argument("--labels", help="HDF5 labels file")
    p.add_argument(
        "--demo", action="store_true",
        help="run the post-training inference demo (reference __main__)",
    )
    p.add_argument(
        "--resume",
        default=None,
        help="checkpoint dir to resume from (restores params, opt_state, "
        "epoch, and best-model-selection state); 'auto' resumes from "
        "<checkpoint_dir>/latest when present",
    )
    _add_overrides(p)
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("infer", help="predict one event from a checkpoint")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--data", required=True)
    p.add_argument("--labels", required=True)
    p.add_argument("--event", type=int, default=0)
    p.add_argument("--dump", action="store_true", help="print predictions")
    p.set_defaults(fn=cmd_infer)

    p = sub.add_parser(
        "eval", help="evaluate a checkpoint on a labeled dataset"
    )
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--data", required=True)
    p.add_argument("--labels", required=True)
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("synth", help="generate synthetic event files")
    p.add_argument("--data", required=True)
    p.add_argument("--labels", required=True)
    p.add_argument("--events", type=int, default=1000)
    p.add_argument("--classes", type=int, default=4)
    p.add_argument("--min-points", type=int, default=100)
    p.add_argument("--max-points", type=int, default=2000)
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_synth)

    p = sub.add_parser(
        "export",
        help="AOT-export a checkpoint's serving forward as a "
        "model-code-free jax.export artifact (see pcseg_tpu/serve.py)",
    )
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--out", required=True, help="artifact directory")
    p.add_argument("--batch-sizes", default="1,8")
    p.add_argument(
        "--buckets", default=None,
        help="comma-separated pad buckets (default: predictor's)",
    )
    p.add_argument(
        "--platforms", default=None,
        help="comma-separated lowering platforms (default: this backend)",
    )
    p.add_argument("--dtype", default=None, help="serving compute dtype")
    p.add_argument(
        "--no-fold", action="store_true",
        help="export the exact eval path instead of the BN-folded one",
    )
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser("bench", help="run the benchmark")
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser(
        "convert",
        help="convert checkpoints: best_model.pth <-> framework dir "
        "(direction inferred from the .pth extension of src/dst)",
    )
    p.add_argument("src")
    p.add_argument("dst")
    p.set_defaults(fn=cmd_convert)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
