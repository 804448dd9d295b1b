"""Quality-parity experiment: our framework vs the PyTorch reference.

Trains (a) the reference architecture + training policy in PyTorch
(harness re-implementation from SURVEY.md §2.2/§2.3 — the reference's own
data is not in the snapshot) and (b) this framework, on the SAME synthetic
ragged events with the SAME split, class weights, optimizer, schedule, and
epoch budget. Reports per-epoch val macro-F1 / class-2-F1 for both.

Usage:
    python -m experiments.parity_reference [--epochs 15] [--events 200]

Writes ``parity_results.json`` and prints a summary table. Quality parity
criterion (BASELINE.json "bit-comparable mIoU"): final F1s within noise of
each other (both sides see identical data; remaining variance is init +
dropout randomness).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def run_ours(events, epochs, batch_size, seed, log=print, patience=None):
    from pcseg_tpu.api import fit
    from pcseg_tpu.core.config import Config

    cfg = Config()
    cfg.data.batch_size = batch_size
    cfg.data.buckets = (512,)
    cfg.data.split_seed = seed
    cfg.train.num_epochs = epochs
    # default: no early stop (full trajectory); pass patience=16 for the
    # reference's full protocol (pcs.py:224)
    cfg.train.patience = patience if patience else epochs + 1
    cfg.train.seed = seed
    cfg.train.checkpoint_dir = "/tmp/parity_ckpt"
    cfg.model.compute_dtype = "bfloat16"
    cfg.model.bn_stats = "fused"
    res = fit(events, config=cfg, log=log)
    return [
        {
            "epoch": h["epoch"],
            "val_loss": h["val_loss"],
            "f1_macro": h["f1_macro"],
            "f1_class2": h["f1_target"],
        }
        for h in res.history
    ]


def run_torch_reference(events, epochs, batch_size, seed, log=print,
                        patience=None):
    """Reference training policy (pcs.py:135-396) on the same split.

    ``patience``: enable the reference's best-class-2-F1 selection with
    val-loss tiebreak and early stop (pcs.py:359-391); None = run the
    full epoch budget."""
    import torch
    from sklearn.metrics import f1_score

    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from torch_ref import RefPointNetSeg  # reference architecture, §2.2

    from pcseg_tpu.data.class_stats import scan_classes
    from pcseg_tpu.train.loop import split_indices

    torch.manual_seed(seed)
    stats = scan_classes(events)
    num_classes = stats.num_classes
    weights = torch.tensor(stats.weights)

    train_idx, val_idx = split_indices(len(events), 0.2, seed)
    model = RefPointNetSeg(num_classes)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3, weight_decay=1e-4)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=20, gamma=0.5)
    crit = torch.nn.CrossEntropyLoss(ignore_index=-1, weight=weights)

    def batches(idx, shuffle_seed=None):
        order = np.array(idx)
        if shuffle_seed is not None:
            np.random.default_rng(shuffle_seed).shuffle(order)
        for s in range(0, len(order), batch_size):
            chunk = [events[i] for i in order[s : s + batch_size]]
            m = max(p.shape[0] for p, _ in chunk)
            pts = torch.zeros(len(chunk), m, 4)
            labs = torch.full((len(chunk), m), -1, dtype=torch.long)
            for j, (p, l) in enumerate(chunk):
                pts[j, : p.shape[0]] = torch.tensor(p)
                labs[j, : l.shape[0]] = torch.tensor(l)
            yield pts, labs

    history = []
    best_f1, best_val, patience_ctr = -1.0, float("inf"), 0
    for epoch in range(epochs):
        t0 = time.perf_counter()
        model.train()
        for pts, labs in batches(train_idx, shuffle_seed=(seed, epoch)):
            opt.zero_grad()
            out = model(pts)
            loss = crit(out.reshape(-1, num_classes), labs.reshape(-1))
            loss.backward()
            opt.step()
        model.eval()
        val_losses, preds, trues = [], [], []
        with torch.no_grad():
            for pts, labs in batches(val_idx):
                out = model(pts)
                val_losses.append(
                    float(crit(out.reshape(-1, num_classes), labs.reshape(-1)))
                )
                p = out.argmax(-1).reshape(-1)
                l = labs.reshape(-1)
                keep = l >= 0
                preds.extend(p[keep].tolist())
                trues.extend(l[keep].tolist())
        sched.step()
        f1_per = f1_score(trues, preds, average=None, labels=range(num_classes))
        rec = {
            "epoch": epoch,
            "val_loss": float(np.mean(val_losses)),
            "f1_macro": float(f1_score(trues, preds, average="macro")),
            "f1_class2": float(f1_per[2]) if num_classes > 2 else 0.0,
        }
        history.append(rec)
        log(
            f"torch epoch {epoch + 1}/{epochs}: val {rec['val_loss']:.4f} "
            f"f1_macro {rec['f1_macro']:.4f} f1[2] {rec['f1_class2']:.4f} "
            f"({time.perf_counter() - t0:.1f}s)"
        )
        if patience:
            # best-model selection + early stop (pcs.py:359-391)
            if rec["f1_class2"] > best_f1 or (
                rec["f1_class2"] == best_f1 and rec["val_loss"] < best_val
            ):
                best_f1, best_val, patience_ctr = (
                    rec["f1_class2"], rec["val_loss"], 0
                )
            else:
                patience_ctr += 1
                if patience_ctr >= patience:
                    log(f"torch early stopping at epoch {epoch + 1}")
                    break
    return history


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--events", type=int, default=200)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="parity_results.json")
    ap.add_argument(
        "--patience", type=int, default=0,
        help="full reference protocol: best-class-2-F1 selection + "
             "early stop after N stale epochs (pcs.py:224 uses 16); "
             "0 = run the whole epoch budget",
    )
    args = ap.parse_args()

    from pcseg_tpu.data.synthetic import synthetic_events

    events = list(
        synthetic_events(
            args.events, num_classes=4, min_points=100, max_points=500,
            seed=args.seed,
        )
    )
    patience = args.patience or None
    ours = run_ours(events, args.epochs, args.batch_size, args.seed,
                    patience=patience)
    torch_hist = run_torch_reference(
        events, args.epochs, args.batch_size, args.seed, patience=patience
    )
    result = {
        "config": vars(args),
        "ours": ours,
        "torch_reference": torch_hist,
        "final": {
            "ours_f1_macro": ours[-1]["f1_macro"],
            "torch_f1_macro": torch_hist[-1]["f1_macro"],
            "ours_f1_class2": ours[-1]["f1_class2"],
            "torch_f1_class2": torch_hist[-1]["f1_class2"],
            "ours_best_f1_class2": max(h["f1_class2"] for h in ours),
            "torch_best_f1_class2": max(
                h["f1_class2"] for h in torch_hist
            ),
            "ours_best_f1_macro": max(h["f1_macro"] for h in ours),
            "torch_best_f1_macro": max(h["f1_macro"] for h in torch_hist),
            "ours_epochs": len(ours),
            "torch_epochs": len(torch_hist),
        },
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result["final"], indent=2))


if __name__ == "__main__":
    main()
