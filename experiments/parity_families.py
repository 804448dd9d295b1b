"""Seeded quality A/B for the voxel and sparse families (r4 VERDICT #3).

The PointNet family's quality parity vs the reference policy is closed
(parity_results_full.json / _128ep); the voxel/sparse families' quality
evidence was self-soaks only. This trains (a) this framework's
voxel_unet3d / sparse_voxelnet and (b) an equivalent idiomatic-PyTorch
model (the torch comparators from experiments/bench_*_cpu_baseline.py,
parameterized) on the SAME synthetic events with the SAME split, class
weights, optimizer (Adam 1e-3 / wd 1e-4), StepLR(20, .5) schedule and
epoch budget, and reports per-epoch val macro-F1 / class-2-F1 for both.

Usage:
    python -m experiments.parity_families --family voxel  [--epochs 15]
    python -m experiments.parity_families --family sparse [--epochs 15]

Writes ``parity_<family>.json``. Criterion (BASELINE.json
"bit-comparable mIoU" north star): final/best F1s within noise (both
sides see identical data; remaining variance is init randomness).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

EPS = 1e-6


def run_ours(events, family, epochs, batch_size, seed, r, log=print):
    from pcseg_tpu.api import fit
    from pcseg_tpu.core.config import Config

    cfg = Config()
    cfg.data.batch_size = batch_size
    cfg.data.buckets = (512,)
    cfg.data.split_seed = seed
    cfg.train.num_epochs = epochs
    cfg.train.patience = epochs + 1
    cfg.train.seed = seed
    cfg.train.checkpoint_dir = f"/tmp/parity_{family}_ckpt"
    cfg.model.compute_dtype = "bfloat16"
    cfg.model.grid_size = r
    if family == "voxel":
        cfg.model.name = "voxel_unet3d"
        cfg.model.unet_width = 8
        cfg.model.levels = 2
    else:
        cfg.model.name = "sparse_voxelnet"
        cfg.model.unet_width = 16
        cfg.model.depth = 2
        cfg.model.levels = 2
        cfg.model.impl = "block"
        cfg.model.max_tiles = (r // 8) ** 3   # full tile grid: no drops
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


def _voxelize_t(points, mask, r, trilinear_base=False):
    """Parameterized torch AABB voxelize (scatter-mean + occupancy)."""
    import torch

    b = points.shape[0]
    coords, feats = points[..., :3], points[..., 3:]
    big = torch.tensor(3.4e38)
    m = mask[..., None]
    lo = torch.where(m, coords, big).amin(dim=1)
    hi = torch.where(m, coords, -big).amax(dim=1)
    span = (hi - lo).clamp_min(EPS)
    scale = r / span
    ijk = ((coords - lo[:, None]) * scale[:, None]).floor().long()
    ijk = ijk.clamp(0, r - 1)
    flat = (ijk[..., 0] * r + ijk[..., 1]) * r + ijk[..., 2]
    flat = torch.where(mask, flat, torch.full_like(flat, r ** 3))
    c = feats.shape[-1] + 1
    sums = torch.zeros(b, r ** 3 + 1, c)
    src = torch.cat([feats, torch.ones_like(feats[..., :1])], dim=-1)
    src = torch.where(m, src, torch.zeros_like(src))
    sums.scatter_add_(1, flat[..., None].expand(-1, -1, c), src)
    cnt = sums[..., -1:]
    mean = (sums / cnt.clamp_min(1.0))[:, : r ** 3]
    active = cnt[:, : r ** 3, 0] > 0
    grid = mean.reshape(b, r, r, r, c).permute(0, 4, 1, 2, 3).contiguous()
    return grid, active.reshape(b, r, r, r), flat, lo, scale


def _devox_trilinear_t(grid, points, mask, lo, scale, r):
    import torch

    b, nc = grid.shape[0], grid.shape[1]
    coords = points[..., :3]
    pos = (coords - lo[:, None]) * scale[:, None] - 0.5
    base = pos.floor()
    frac = pos - base
    out = 0.0
    gflat = grid.reshape(b, nc, r ** 3).transpose(1, 2)
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                n = base + torch.tensor([dz, dy, dx], dtype=base.dtype)
                wgt = (
                    torch.where(n[..., 0] == base[..., 0],
                                1 - frac[..., 0], frac[..., 0])
                    * torch.where(n[..., 1] == base[..., 1],
                                  1 - frac[..., 1], frac[..., 1])
                    * torch.where(n[..., 2] == base[..., 2],
                                  1 - frac[..., 2], frac[..., 2])
                )
                valid = ((n >= 0) & (n <= r - 1)).all(-1) & mask
                nn_ = n.clamp(0, r - 1).long()
                idx = (nn_[..., 0] * r + nn_[..., 1]) * r + nn_[..., 2]
                g = torch.gather(
                    gflat, 1, idx[..., None].expand(-1, -1, nc)
                )
                out = out + g * (wgt * valid)[..., None]
    return out


def run_torch_family(events, family, epochs, batch_size, seed, r,
                     log=print):
    import torch
    from sklearn.metrics import f1_score

    from pcseg_tpu.data.class_stats import scan_classes
    from pcseg_tpu.train.loop import split_indices

    torch.manual_seed(seed)
    stats = scan_classes(events)
    num_classes = stats.num_classes
    weights = torch.tensor(stats.weights)

    if family == "voxel":
        from experiments.bench_voxel_cpu_baseline import VoxelUNetTorch

        model = VoxelUNetTorch(2, 8, 2, num_classes)
    else:
        from experiments.bench_sparse_cpu_baseline import SparseUNetTorch

        model = SparseUNetTorch(2, 16, 2, 2, num_classes)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3, weight_decay=1e-4)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=20, gamma=0.5)
    crit = torch.nn.CrossEntropyLoss(ignore_index=-1, weight=weights)
    train_idx, val_idx = split_indices(len(events), 0.2, seed)

    def batches(idx, shuffle_seed=None):
        order = np.array(idx)
        if shuffle_seed is not None:
            np.random.default_rng(shuffle_seed).shuffle(order)
        for s in range(0, len(order), batch_size):
            chunk = [events[i] for i in order[s: s + batch_size]]
            m = max(p.shape[0] for p, _ in chunk)
            pts = torch.zeros(len(chunk), m, 4)
            labs = torch.full((len(chunk), m), -1, dtype=torch.long)
            msk = torch.zeros(len(chunk), m, dtype=torch.bool)
            for j, (p, l) in enumerate(chunk):
                pts[j, : p.shape[0]] = torch.tensor(p)
                labs[j, : l.shape[0]] = torch.tensor(l)
                msk[j, : p.shape[0]] = True
            yield pts, labs, msk

    def forward(pts, msk):
        grid, active, flat, lo, scale = _voxelize_t(pts, msk, r)
        if family == "voxel":
            vlogits = model(grid)
            return _devox_trilinear_t(vlogits, pts, msk, lo, scale, r)
        vlogits = model(grid, active)
        b = pts.shape[0]
        gflat = vlogits.reshape(b, num_classes, r ** 3).transpose(1, 2)
        gflat = torch.cat(
            [gflat, torch.zeros(b, 1, num_classes)], dim=1
        )
        return torch.gather(
            gflat, 1, flat[..., None].expand(-1, -1, num_classes)
        )

    history = []
    for epoch in range(epochs):
        t0 = time.perf_counter()
        model.train()
        for pts, labs, msk in batches(train_idx, shuffle_seed=(seed, epoch)):
            opt.zero_grad()
            out = forward(pts, msk)
            loss = crit(out.reshape(-1, num_classes), labs.reshape(-1))
            loss.backward()
            opt.step()
        model.eval()
        val_losses, preds, trues = [], [], []
        with torch.no_grad():
            for pts, labs, msk in batches(val_idx):
                out = forward(pts, msk)
                val_losses.append(float(
                    crit(out.reshape(-1, num_classes), labs.reshape(-1))
                ))
                pd = out.argmax(-1).reshape(-1)
                lb = labs.reshape(-1)
                keep = lb >= 0
                preds.extend(pd[keep].tolist())
                trues.extend(lb[keep].tolist())
        sched.step()
        f1_per = f1_score(trues, preds, average=None,
                          labels=range(num_classes))
        rec = {
            "epoch": epoch,
            "val_loss": float(np.mean(val_losses)),
            "f1_macro": float(f1_score(trues, preds, average="macro")),
            "f1_class2": float(f1_per[2]) if num_classes > 2 else 0.0,
        }
        history.append(rec)
        log(
            f"torch {family} epoch {epoch + 1}/{epochs}: "
            f"val {rec['val_loss']:.4f} f1_macro {rec['f1_macro']:.4f} "
            f"f1[2] {rec['f1_class2']:.4f} "
            f"({time.perf_counter() - t0:.1f}s)"
        )
    return history


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", choices=("voxel", "sparse"),
                    required=True)
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--events", type=int, default=200)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--grid", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    out = args.out or f"parity_{args.family}.json"

    from pcseg_tpu.data.synthetic import synthetic_events

    events = list(
        synthetic_events(
            args.events, num_classes=4, min_points=100, max_points=500,
            seed=args.seed,
        )
    )
    ours = run_ours(events, args.family, args.epochs, args.batch_size,
                    args.seed, args.grid)
    torch_hist = run_torch_family(
        events, args.family, args.epochs, args.batch_size, args.seed,
        args.grid,
    )
    result = {
        "config": vars(args),
        "ours": ours,
        "torch_comparator": torch_hist,
        "final": {
            "ours_f1_macro": ours[-1]["f1_macro"],
            "torch_f1_macro": torch_hist[-1]["f1_macro"],
            "ours_f1_class2": ours[-1]["f1_class2"],
            "torch_f1_class2": torch_hist[-1]["f1_class2"],
            "ours_best_f1_macro": max(h["f1_macro"] for h in ours),
            "torch_best_f1_macro": max(h["f1_macro"] for h in torch_hist),
            "ours_best_f1_class2": max(h["f1_class2"] for h in ours),
            "torch_best_f1_class2": max(
                h["f1_class2"] for h in torch_hist
            ),
        },
    }
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result["final"], indent=2))


if __name__ == "__main__":
    main()
