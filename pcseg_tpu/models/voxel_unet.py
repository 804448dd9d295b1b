"""VoxelUNet3d — voxelize -> 3D U-Net -> devoxelize, end to end.

The north-star model (BASELINE.json): points in, per-point logits out,
with a dense 3D convolutional encoder-decoder in the middle. Not present
in the reference (whose model is the PointNet in models/pointnet.py); this
is new TPU-first surface:

- channels-last NDHWC grids so convs tile onto the MXU,
- GroupNorm (no cross-replica stats, no train/eval split),
- bf16 compute with f32 params via ``compute_dtype``,
- identical ``init/apply`` duck-type as PointNetSeg, so the same jitted
  train/eval steps, checkpointing, CLI, and DP mesh path drive both model
  families (batch_stats is an empty pytree here).

Architecture (grid R, widths w, 2w, 4w):
  stem conv3x3 -> [enc level: 2x(conv-gn-relu)] -> stride-2 down ...
  bottleneck ... transpose-conv up + skip concat -> [dec level] ...
  1x1x1 head -> per-voxel logits -> trilinear devoxelize -> (B, M, C).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from pcseg_tpu.ops.conv3d import (
    conv3d,
    conv3d_init,
    conv3d_transpose,
    group_norm,
    group_norm_init,
)
from pcseg_tpu.ops.voxel import (
    devoxelize_trilinear,
    devoxelize_trilinear_grid2,
    resolve_devoxelize_impl,
    resolve_voxelize_impl,
    voxelize,
    voxelize_packed,
)


@dataclasses.dataclass(frozen=True)
class VoxelUNet3d:
    num_classes: int
    input_dim: int = 4          # xyz + F features; voxel channels = F-3+1
    grid_size: int = 64
    width: int = 16
    levels: int = 3
    compute_dtype: str = "float32"
    # rematerialize the U-Net in the backward pass (jax.checkpoint):
    # trades ~1 extra forward of FLOPs for dropping all intermediate
    # grids from HBM — enables 128^3+ training configs
    remat: bool = False
    # conv implementation: "xla" (conv_general_dilated), "fused"
    # (lane-packed Pallas block-matmul kernels with the GroupNorm+ReLU
    # prologue and next-GN stats fused in — ops/pallas/conv3d_block.py;
    # measured 1.5x at 64^3/B8 and 3.0x at 128^3/remat full train step,
    # requires bfloat16 compute and width * 2^level dividing 128), or
    # "auto" (fused whenever those conditions hold)
    conv_impl: str = "auto"
    # voxelizer: "scatter" (XLA fused scatter-add), "matmul" (factorized
    # one-hot MXU contraction, ops/voxel.py _voxelize_matmul; feature
    # precision follows compute_dtype), or "auto" (measured crossover)
    voxelize_impl: str = "auto"
    # devoxelize forward: "gather" (8-tap row gathers; f32-exact),
    # "matmul" (mirrored one-hot contraction — the gathers serialize at
    # ~4.1 ms/step at B8 x 8192/R64, the contraction is MXU work), or
    # "auto" (same crossover rule as the voxelizer)
    devox_impl: str = "auto"
    # unused knobs kept for duck-type compatibility with PointNetSeg
    dropout: float = 0.0
    mask_norm_and_pool: bool = True

    @property
    def in_channels(self) -> int:
        return self.input_dim - 3 + 1   # features + occupancy

    def _fused_ok(self) -> bool:
        """Packing constraints of the fused Pallas core (channels divide
        128 lanes; each level's grid edge splits into whole lane blocks)."""
        for i in range(self.levels):
            wi = self.width * (2 ** i)
            ri = self.grid_size // (2 ** i)
            if 128 % wi or ri % (128 // wi) or ri < 2:
                return False
        return True

    def init(self, key: jax.Array) -> dict:
        keys = iter(jax.random.split(key, 64))
        w = self.width
        p: dict = {}
        p["stem"] = conv3d_init(next(keys), 3, self.in_channels, w)
        p["stem_gn"] = group_norm_init(w)
        widths = [w * (2 ** i) for i in range(self.levels)]
        for i, wi in enumerate(widths):
            p[f"enc{i}_a"] = conv3d_init(next(keys), 3, wi, wi)
            p[f"enc{i}_a_gn"] = group_norm_init(wi)
            p[f"enc{i}_b"] = conv3d_init(next(keys), 3, wi, wi)
            p[f"enc{i}_b_gn"] = group_norm_init(wi)
            if i < self.levels - 1:
                p[f"down{i}"] = conv3d_init(next(keys), 2, wi, widths[i + 1])
                p[f"down{i}_gn"] = group_norm_init(widths[i + 1])
        for i in range(self.levels - 2, -1, -1):
            wi, wlow = widths[i], widths[i + 1]
            p[f"up{i}"] = conv3d_init(next(keys), 2, wlow, wi)
            p[f"up{i}_gn"] = group_norm_init(wi)
            p[f"dec{i}_a"] = conv3d_init(next(keys), 3, 2 * wi, wi)
            p[f"dec{i}_a_gn"] = group_norm_init(wi)
            p[f"dec{i}_b"] = conv3d_init(next(keys), 3, wi, wi)
            p[f"dec{i}_b_gn"] = group_norm_init(wi)
        p["head"] = conv3d_init(next(keys), 1, w, self.num_classes)
        return {"params": p, "batch_stats": {}}

    def apply(
        self,
        variables: dict,
        points: jax.Array,
        *,
        train: bool = False,
        mask: Optional[jax.Array] = None,
        dropout_key: Optional[jax.Array] = None,
        axis_name: Optional[str] = None,
    ):
        p = variables["params"]
        dt = jnp.dtype(self.compute_dtype)
        if mask is None:
            mask = jnp.ones(points.shape[:2], bool)

        core = self._unet_core
        impl = self.conv_impl
        if impl == "auto":
            impl = "fused" if (
                dt == jnp.bfloat16 and self._fused_ok()
            ) else "xla"
        if impl == "fused":
            if dt != jnp.bfloat16:
                raise ValueError(
                    "conv_impl='fused' requires compute_dtype='bfloat16' "
                    "(the Pallas block kernels are bf16); got "
                    f"{self.compute_dtype!r}"
                )
            core = self._unet_core_fused
        elif impl != "xla":
            raise ValueError(f"unknown conv_impl {self.conv_impl!r}")

        vox_impl = resolve_voxelize_impl(
            self.voxelize_impl, self.grid_size, self.in_channels
        )
        if impl == "fused" and vox_impl == "matmul":
            # voxelize straight into the Pallas kernels' lane-packed
            # form — skips the 5-D grid whose d-minor XLA layout forced
            # full-grid copies at the pack boundary (ops/voxel.py
            # voxelize_packed; bit-identical values)
            x, lo, scale = voxelize_packed(
                points, mask, self.grid_size, self.width, matmul_dtype=dt
            )
        else:
            grid = voxelize(
                points, mask, self.grid_size, impl=vox_impl,
                matmul_dtype=dt,
            )
            x, lo, scale = grid.features.astype(dt), grid.lo, grid.scale

        # fused core + matmul devox: hand the head output to devoxelize
        # in the flat grid2 layout — the 5-D (B, R, R, R, NC) hand-off
        # costs a full-grid relayout copy each way (head1x1_grid2 /
        # devoxelize_trilinear_grid2 docstrings). Measured and rejected
        # for the GATHER impl (128^3): grid2's (B, R^3, NC) row view is
        # logically a bitcast but XLA relayouts the tiled (R^2, R*NC)
        # form to (R^3, NC) anyway, and the narrow-row gathers from it
        # run slower than from the 5-D grid — 29.6 -> 34.3 ms/step.
        use_grid2 = impl == "fused" and resolve_devoxelize_impl(
            self.devox_impl, self.grid_size, self.num_classes
        ) == "matmul"
        if use_grid2:
            core = functools.partial(core, grid2_out=True)
        if self.remat:
            core = jax.checkpoint(core, static_argnums=())
        voxel_logits = core(p, x)

        # grid-gradient precision follows the model's compute dtype
        # (bf16 models take the fast bf16 contraction; f32 models get
        # full-precision grid gradients — ADVICE r2)
        if use_grid2:
            logits = devoxelize_trilinear_grid2(
                voxel_logits, points, mask, lo, scale, bwd_dtype=dt,
                impl=self.devox_impl,
            )
        else:
            logits = devoxelize_trilinear(
                voxel_logits, points, mask, lo, scale, bwd_dtype=dt,
                impl=self.devox_impl,
            )
        if train:
            return logits, {}
        return logits

    def _unet_core_fused(self, p, x, grid2_out=False):
        """U-Net core on the lane-packed Pallas conv blocks.

        Every 3^3 conv runs as ops/pallas/conv3d_block.fused_conv3x3_p
        with the previous layer's GroupNorm+ReLU folded into the kernel
        prologue and the next GroupNorm's (sum, sumsq) accumulated in the
        kernel epilogue, so activations round-trip HBM exactly once per
        layer. Activations stay in the packed (B, D, rows, 128) form
        through the whole core — XLA lays narrow-C NDHWC grids out
        W-minor, so any 5-D hand-off to/from a Pallas call is a full
        relayout copy (the round-1 profile showed 41 of them, 67-134 MB
        each). Only the XLA pieces (stem, stride-2 down, transposed up,
        1x1 head) unpack, at one boundary copy apiece. The decoder's
        concat is conv([a, b], W) == conv(a, W[:, :w]) + conv(b, W[:, w:])
        with the add fused into the second conv's kernel
        (fused_conv3x3_add_p) — the concat never materializes.
        """
        from pcseg_tpu.ops.pallas.conv3d_block import (
            act_packed,
            fused_conv3x3_add_p,
            fused_conv3x3_p,
            fused_down2x_p,
            fused_head_grid2,
            fused_up2x_p,
            head1x1_packed,
            pack_grid,
            stats_scale_shift,
        )

        dt = jnp.bfloat16
        groups = 8
        widths = [self.width * (2 ** i) for i in range(self.levels)]
        rs = [self.grid_size // (2 ** i) for i in range(self.levels)]
        for i, wi in enumerate(widths):
            if 128 % wi or rs[i] % (128 // wi):
                raise ValueError(
                    f"conv_impl='fused' needs width*2^level dividing 128 "
                    f"and grid/2^level divisible by 128/channels; level "
                    f"{i}: channels={wi}, grid={rs[i]}"
                )

        def fold(st, gn_name, lv):
            gn = p[gn_name]
            return stats_scale_shift(
                st, gn["scale"], gn["bias"], groups, rs[lv] ** 3
            )

        # stem through the fused kernel too (XLA's 2->16 conv at 64^3 was
        # the single slowest piece, ~12 ms f+b): zero-pad input channels
        # to width and embed the (3,3,3,cin,w0) weight in a square zero
        # kernel — the pad columns contribute nothing, grads flow only to
        # the real slice. A 4-D x is already lane-packed + channel-padded
        # (apply's voxelize_packed fast path).
        w0 = widths[0]
        b = x.shape[0]
        if x.ndim == 4:
            cin = self.in_channels
            xp = x
            meta = (self.grid_size, self.grid_size // (128 // w0), w0)
        else:
            cin = x.shape[-1]
            xp, meta = pack_grid(
                jnp.pad(x.astype(dt), ((0, 0),) * 4 + ((0, w0 - cin),))
            )
        kstem = jnp.zeros((3, 3, 3, w0, w0), jnp.float32)
        kstem = kstem.at[..., :cin, :].set(p["stem"]["kernel"])
        zeros = jnp.zeros((b, 128), jnp.float32)
        # need_dx=False: the stem input is the voxelized grid (data, no
        # cotangent), so the backward skips its full-cost dgrad kernel
        xp, st = fused_conv3x3_p(
            xp, kstem, p["stem"]["bias"], zeros, zeros, meta, False, True,
            None, False, False,
        )
        sc, sh = fold(st, "stem_gn", 0)
        skips = []
        for i in range(self.levels):
            xp, st = fused_conv3x3_p(
                xp, p[f"enc{i}_a"]["kernel"], p[f"enc{i}_a"]["bias"],
                sc, sh, meta,
            )
            sc, sh = fold(st, f"enc{i}_a_gn", i)
            xp, st = fused_conv3x3_p(
                xp, p[f"enc{i}_b"]["kernel"], p[f"enc{i}_b"]["bias"],
                sc, sh, meta,
            )
            sc, sh = fold(st, f"enc{i}_b_gn", i)
            if i < self.levels - 1:
                skips.append((xp, sc, sh, meta))
                xp, meta, st = fused_down2x_p(
                    xp, p[f"down{i}"]["kernel"], p[f"down{i}"]["bias"],
                    sc, sh, meta,
                )
                sc, sh = fold(st, f"down{i}_gn", i + 1)
        for i in range(self.levels - 2, -1, -1):
            wi = widths[i]
            up_p, meta, st_u = fused_up2x_p(
                xp, p[f"up{i}"]["kernel"], p[f"up{i}"]["bias"],
                sc, sh, meta,
            )
            sc_u, sh_u = fold(st_u, f"up{i}_gn", i)
            skip_p, sc_s, sh_s, meta = skips[i]
            wk = p[f"dec{i}_a"]["kernel"]
            bias_a = p[f"dec{i}_a"]["bias"]
            y1 = fused_conv3x3_p(
                up_p, wk[:, :, :, :wi], jnp.zeros_like(bias_a),
                sc_u, sh_u, meta, True, False,
            )
            xp, st = fused_conv3x3_add_p(
                skip_p, y1, wk[:, :, :, wi:], bias_a, sc_s, sh_s, meta,
            )
            sc, sh = fold(st, f"dec{i}_a_gn", i)
            xp, st = fused_conv3x3_p(
                xp, p[f"dec{i}_b"]["kernel"], p[f"dec{i}_b"]["bias"],
                sc, sh, meta,
            )
            sc, sh = fold(st, f"dec{i}_b_gn", i)
        if grid2_out:
            # act + head in one kernel, bf16 grid2 out (devoxelize
            # rounds its grid2 operand to bf16 either way)
            return fused_head_grid2(
                xp, p["head"]["kernel"], p["head"]["bias"], sc, sh,
                meta, self.num_classes,
            )
        return head1x1_packed(
            act_packed(xp, sc, sh), p["head"]["kernel"], p["head"]["bias"],
            meta, self.num_classes,
        )

    def _unet_core(self, p, x):
        dt = jnp.dtype(self.compute_dtype)

        def block(name, x, stride=1, transpose=False, k_gn=None):
            conv = conv3d_transpose if transpose else conv3d
            y = conv(p[name], x, stride=stride, compute_dtype=dt)
            y = group_norm(p[k_gn or f"{name}_gn"], y)
            return jnp.maximum(y, 0.0).astype(dt)

        x = block("stem", x)
        skips = []
        for i in range(self.levels):
            x = block(f"enc{i}_a", x)
            x = block(f"enc{i}_b", x)
            if i < self.levels - 1:
                skips.append(x)
                x = block(f"down{i}", x, stride=2)
        for i in range(self.levels - 2, -1, -1):
            x = block(f"up{i}", x, stride=2, transpose=True)
            x = jnp.concatenate([x, skips[i].astype(dt)], axis=-1)
            x = block(f"dec{i}_a", x)
            x = block(f"dec{i}_b", x)
        return conv3d(p["head"], x, compute_dtype=dt).astype(jnp.float32)
