"""Torch-CPU baseline for the sparse-family north-star metric.

BENCH_r04 carried `vs_baseline` denominators for the PointNet and voxel
families but none for the sparse family (r4 VERDICT "What's missing" #3).
This measures it: the same computation the block-sparse U-Net performs —
voxelize -> submanifold (occupancy-masked) 3^3 conv stacks with per-site
LayerNorm hierarchy at two resolutions, k=2/s=2 down / transposed up with
skip add, 1x1 head, nearest-voxel per-point readout -> weighted CE ->
Adam(1e-3, weight_decay=1e-4) — in idiomatic PyTorch on CPU (the
reference's fallback device, pcs.py:15) at the driver bench config
B8 x 8192 track-like points, R64, w64, depth 4, levels 2, f32.

Torch-CPU has no production submanifold-sparse conv, so the comparator is
the masked-dense formulation — the same semantics pcseg_tpu's
SparseVoxelNet(impl="dense") computes and the block impl is parity-tested
against (tests/test_block_sparse.py). Labeled baseline-harness code (like
tests/torch_ref.py), not framework code.

Run once, record the number in BASELINE.md and pcseg_tpu/bench.py
(RECORDED_SPARSE_CPU_BASELINE); re-measure live with
PCSEG_BENCH_LIVE_BASELINE=1 there.
"""

from __future__ import annotations

import json
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

B, M, R, W, DEPTH, LEVELS, CLASSES = 8, 8192, 64, 64, 4, 2, 4
WARMUP, ITERS = 1, 3
EPS = 1e-6


def track_batch(rng, b, m):
    """Track-like events — same generator as pcseg_tpu.bench._track_batch."""
    pts = []
    for _ in range(b):
        k = 4
        seg = []
        for _ in range(k):
            a, d = rng.random(3), rng.normal(size=3)
            d /= np.linalg.norm(d)
            s = np.linspace(0, 1, m // k + 1)[:, None]
            seg.append(a + s * d * 0.8)
        p = np.concatenate(seg)[:m]
        e = rng.random((m, 1))
        pts.append(np.concatenate([np.clip(p, 0, 1), e], axis=1))
    return torch.tensor(np.stack(pts).astype(np.float32))


def voxelize(points, mask):
    """(B, M, 4) -> mean-feature grid (B, 2, R^3) + occupancy + indices."""
    coords, feats = points[..., :3], points[..., 3:]
    big = torch.tensor(3.4e38)
    m = mask[..., None]
    lo = torch.where(m, coords, big).amin(dim=1)
    hi = torch.where(m, coords, -big).amax(dim=1)
    span = (hi - lo).clamp_min(EPS)
    scale = R / span
    ijk = ((coords - lo[:, None]) * scale[:, None]).floor().long()
    ijk = ijk.clamp(0, R - 1)
    flat = (ijk[..., 0] * R + ijk[..., 1]) * R + ijk[..., 2]
    flat = torch.where(mask, flat, torch.full_like(flat, R ** 3))
    c = feats.shape[-1] + 1
    sums = torch.zeros(B, R ** 3 + 1, c)
    src = torch.cat([feats, torch.ones_like(feats[..., :1])], dim=-1)
    src = torch.where(m, src, torch.zeros_like(src))
    sums.scatter_add_(1, flat[..., None].expand(-1, -1, c), src)
    cnt = sums[..., -1:]
    mean = (sums / cnt.clamp_min(1.0))[:, : R ** 3]
    active = cnt[:, : R ** 3, 0] > 0                       # (B, R^3)
    grid = mean.reshape(B, R, R, R, c).permute(0, 4, 1, 2, 3).contiguous()
    return grid, active.reshape(B, R, R, R), flat


class SubmBlock(nn.Module):
    """3^3 conv -> per-site LayerNorm(C) -> ReLU, masked to active sites."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv = nn.Conv3d(cin, cout, 3, padding=1)
        self.ln = nn.LayerNorm(cout)

    def forward(self, x, active):
        y = self.conv(x)
        y = self.ln(y.permute(0, 2, 3, 4, 1)).permute(0, 4, 1, 2, 3)
        return F.relu(y) * active[:, None].float()


class SparseUNetTorch(nn.Module):
    def __init__(self, cin, width, depth, levels, num_classes):
        super().__init__()
        self.depth, self.levels = depth, levels
        self.l0 = nn.ModuleList(
            [SubmBlock(cin if i == 0 else width, width) for i in range(depth)]
        )
        self.down = nn.ModuleList()
        self.lv = nn.ModuleList()
        self.up = nn.ModuleList()
        w = width
        for lv in range(1, levels):
            wl = width * 2 ** lv
            self.down.append(
                nn.ModuleDict({
                    "conv": nn.Conv3d(wl // 2, wl, 2, stride=2),
                    "ln": nn.LayerNorm(wl),
                })
            )
            self.lv.append(nn.ModuleList(
                [SubmBlock(wl, wl) for _ in range(depth)]
            ))
            self.up.append(
                nn.ModuleDict({
                    "conv": nn.ConvTranspose3d(wl, wl // 2, 2, stride=2),
                    "ln": nn.LayerNorm(wl // 2),
                })
            )
        self.head = nn.Conv3d(w, num_classes, 1)

    @staticmethod
    def _ln_relu_mask(md, y, active):
        y = md["ln"](y.permute(0, 2, 3, 4, 1)).permute(0, 4, 1, 2, 3)
        return F.relu(y) * active[:, None].float()

    def forward(self, grid, active):
        x = None
        for i, blk in enumerate(self.l0):
            y = blk(grid if i == 0 else x, active)
            x = y if i == 0 else x + y
        skips, actives = [x], [active]
        a = active
        for lv in range(1, self.levels):
            a = F.max_pool3d(a[:, None].float(), 2).squeeze(1) > 0
            h = self._ln_relu_mask(self.down[lv - 1],
                                   self.down[lv - 1]["conv"](skips[-1]), a)
            for i, blk in enumerate(self.lv[lv - 1]):
                y = blk(h, a)
                h = h + y
            skips.append(h)
            actives.append(a)
        h = skips[-1]
        for lv in range(self.levels - 1, 0, -1):
            u = self._ln_relu_mask(self.up[lv - 1],
                                   self.up[lv - 1]["conv"](h),
                                   actives[lv - 1])
            h = skips[lv - 1] + u
        return self.head(h)


def main():
    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    points = track_batch(rng, B, M)
    labels = torch.tensor(
        rng.integers(0, CLASSES, size=(B, M)).astype(np.int64)
    )
    mask = torch.ones(B, M, dtype=torch.bool)

    model = SparseUNetTorch(2, W, DEPTH, LEVELS, CLASSES)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3, weight_decay=1e-4)
    crit = nn.CrossEntropyLoss(ignore_index=-1)

    def step():
        opt.zero_grad()
        grid, active, flat = voxelize(points, mask)
        vlogits = model(grid, active)                    # (B, K, R, R, R)
        gflat = vlogits.reshape(B, CLASSES, R ** 3).transpose(1, 2)
        gflat = torch.cat([gflat, torch.zeros(B, 1, CLASSES)], dim=1)
        logits = torch.gather(
            gflat, 1, flat[..., None].expand(-1, -1, CLASSES)
        )
        loss = crit(logits.reshape(-1, CLASSES), labels.reshape(-1))
        loss.backward()
        opt.step()
        return float(loss)

    for _ in range(WARMUP):
        step()
    t0 = time.perf_counter()
    for _ in range(ITERS):
        loss = step()
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "sparse_unet_train_step_points_per_sec_torch_cpu",
        "value": round(B * M * ITERS / dt, 1),
        "ms_per_step": round(dt / ITERS * 1e3, 1),
        "loss": loss,
        "config": f"B{B}x{M} R{R} w{W} d{DEPTH} L{LEVELS} f32 cpu "
                  f"threads={torch.get_num_threads()}",
    }))


if __name__ == "__main__":
    main()
