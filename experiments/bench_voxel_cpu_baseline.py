"""Torch-CPU baseline for the voxel-family north-star metric.

BASELINE.json's headline is "points/sec/chip end-to-end (voxelize ->
conv3d -> devoxelize) >= 5x CPU baseline"; this measures the denominator:
the same pipeline — per-event AABB voxelize (scatter-mean + occupancy
channel), a 3-level GroupNorm 3D U-Net (stem / 2x conv per level /
stride-2 down / transposed up + skip concat / 1x1 head), trilinear
devoxelize, weighted CE, Adam(1e-3, weight_decay=1e-4) — in idiomatic
PyTorch on CPU (the reference's fallback device, pcs.py:15), at the
driver bench config B8 x 8192 pts, R64, w16, f32.

Labeled baseline-harness code (like tests/torch_ref.py), not framework
code; mirrors pcseg_tpu/models/voxel_unet.py + ops/voxel.py semantics.
Run once, record the number in BASELINE.md and pcseg_tpu/bench.py
(RECORDED_VOX_CPU_BASELINE); re-measure live with
PCSEG_BENCH_LIVE_BASELINE=1 there.
"""

from __future__ import annotations

import json
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

B, M, R, W, LEVELS, CLASSES = 8, 8192, 64, 16, 3, 4
WARMUP, ITERS = 1, 3
EPS = 1e-6


def voxelize(points, mask):
    """(B, M, 4) xyz+energy -> (B, 2, R, R, R) mean-feature grid
    (energy + occupancy), plus (lo, scale) per event."""
    coords, feats = points[..., :3], points[..., 3:]
    big = torch.tensor(3.4e38)
    m = mask[..., None]
    lo = torch.where(m, coords, big).amin(dim=1)
    hi = torch.where(m, coords, -big).amax(dim=1)
    span = (hi - lo).clamp_min(EPS)
    scale = (R * (1 - 1e-6)) / span
    ijk = ((coords - lo[:, None]) * scale[:, None]).floor().long()
    ijk = ijk.clamp(0, R - 1)
    flat = (ijk[..., 0] * R + ijk[..., 1]) * R + ijk[..., 2]
    flat = torch.where(mask, flat, torch.full_like(flat, R ** 3))  # spill
    c = feats.shape[-1] + 1
    sums = torch.zeros(B, R ** 3 + 1, c)
    src = torch.cat([feats, torch.ones_like(feats[..., :1])], dim=-1)
    src = torch.where(m, src, torch.zeros_like(src))
    sums.scatter_add_(1, flat[..., None].expand(-1, -1, c), src)
    cnt = sums[..., -1:]
    mean = sums / cnt.clamp_min(1.0)
    mean = mean[:, : R ** 3].reshape(B, R, R, R, c)
    return mean.permute(0, 4, 1, 2, 3).contiguous(), lo, scale


def devoxelize(grid, points, mask, lo, scale):
    """Trilinear gather of per-voxel logits back to points.
    grid (B, C, R, R, R) -> (B, M, C)."""
    coords = points[..., :3]
    pos = (coords - lo[:, None]) * scale[:, None] - 0.5
    base = pos.floor()
    frac = pos - base
    out = 0.0
    nc = grid.shape[1]
    gflat = grid.reshape(B, nc, R ** 3).transpose(1, 2)  # (B, R^3, C)
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                n = base + torch.tensor([dz, dy, dx], dtype=base.dtype)
                wgt = (
                    torch.where(n[..., 0] == pos[..., 0].floor(),
                                1 - frac[..., 0], frac[..., 0])
                    * torch.where(n[..., 1] == pos[..., 1].floor(),
                                  1 - frac[..., 1], frac[..., 1])
                    * torch.where(n[..., 2] == pos[..., 2].floor(),
                                  1 - frac[..., 2], frac[..., 2])
                )
                valid = ((n >= 0) & (n <= R - 1)).all(-1) & mask
                nn_ = n.clamp(0, R - 1).long()
                idx = (nn_[..., 0] * R + nn_[..., 1]) * R + nn_[..., 2]
                g = torch.gather(
                    gflat, 1, idx[..., None].expand(-1, -1, nc)
                )
                out = out + g * (wgt * valid)[..., None]
    return out


class GNBlock(nn.Module):
    def __init__(self, cin, cout, k=3, stride=1, transpose=False):
        super().__init__()
        conv = nn.ConvTranspose3d if transpose else nn.Conv3d
        pad = 1 if k == 3 else 0
        self.conv = conv(cin, cout, k, stride=stride, padding=pad)
        g = 8
        while cout % g:
            g -= 1
        self.gn = nn.GroupNorm(g, cout)

    def forward(self, x):
        return F.relu(self.gn(self.conv(x)))


class VoxelUNetTorch(nn.Module):
    def __init__(self, cin, width, levels, num_classes):
        super().__init__()
        ws = [width * 2 ** i for i in range(levels)]
        self.stem = GNBlock(cin, ws[0])
        self.enc = nn.ModuleList()
        self.down = nn.ModuleList()
        for i, wi in enumerate(ws):
            self.enc.append(nn.ModuleList([GNBlock(wi, wi), GNBlock(wi, wi)]))
            if i < levels - 1:
                self.down.append(GNBlock(wi, ws[i + 1], k=2, stride=2))
        self.up = nn.ModuleList()
        self.dec = nn.ModuleList()
        for i in range(levels - 2, -1, -1):
            self.up.append(GNBlock(ws[i + 1], ws[i], k=2, stride=2,
                                   transpose=True))
            self.dec.append(nn.ModuleList(
                [GNBlock(2 * ws[i], ws[i]), GNBlock(ws[i], ws[i])]
            ))
        self.head = nn.Conv3d(ws[0], num_classes, 1)
        self.levels = levels

    def forward(self, x):
        x = self.stem(x)
        skips = []
        for i in range(self.levels):
            x = self.enc[i][0](x)
            x = self.enc[i][1](x)
            if i < self.levels - 1:
                skips.append(x)
                x = self.down[i](x)
        for j, i in enumerate(range(self.levels - 2, -1, -1)):
            x = self.up[j](x)
            x = torch.cat([x, skips[i]], dim=1)
            x = self.dec[j][0](x)
            x = self.dec[j][1](x)
        return self.head(x)


def main():
    torch.manual_seed(0)
    torch.set_num_threads(torch.get_num_threads())
    rng = np.random.default_rng(0)
    points = torch.tensor(
        rng.normal(size=(B, M, 4)).astype(np.float32)
    )
    labels = torch.tensor(
        rng.integers(0, CLASSES, size=(B, M)).astype(np.int64)
    )
    mask = torch.ones(B, M, dtype=torch.bool)

    model = VoxelUNetTorch(2, W, LEVELS, CLASSES)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3, weight_decay=1e-4)
    crit = nn.CrossEntropyLoss(ignore_index=-1)

    def step():
        opt.zero_grad()
        grid, lo, scale = voxelize(points, mask)
        vlogits = model(grid)
        logits = devoxelize(vlogits, points, mask, lo, scale)
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
    pts_per_sec = B * M * ITERS / dt
    print(json.dumps({
        "metric": "voxel_unet3d_train_step_points_per_sec_torch_cpu",
        "value": round(pts_per_sec, 1),
        "ms_per_step": round(dt / ITERS * 1e3, 1),
        "loss": loss,
        "config": f"B{B}x{M} R{R} w{W} f32 cpu threads="
                  f"{torch.get_num_threads()}",
    }))


if __name__ == "__main__":
    main()
