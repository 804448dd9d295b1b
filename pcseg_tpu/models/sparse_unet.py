"""SparseVoxelNet — submanifold sparse conv segmentation over occupied
voxels.

North-star sparse path (BASELINE.json): LiDAR/LArTPC-like events occupy a
tiny fraction of the R^3 grid, so dense 3D convs waste nearly all their
FLOPs on empty space. This model voxelizes, extracts active sites (static
capacity), runs a stack of submanifold sparse conv blocks (ops/sparse.py)
that never leave the occupied set, classifies per site, and reads per-point
logits back out through the site lookup.

Same init/apply duck-type as PointNetSeg / VoxelUNet3d — one train/eval
step implementation drives all three model families.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from pcseg_tpu.ops.sparse import (
    gather_point_logits,
    site_layer_norm,
    site_layer_norm_init,
    sparse_down2x,
    sparse_from_grid,
    sparse_pool,
    sparse_up2x,
    subm_conv,
    subm_conv_dense,
    subm_conv_init,
)
from pcseg_tpu.ops.voxel import devoxelize_nearest, voxelize


@dataclasses.dataclass(frozen=True)
class SparseVoxelNet:
    num_classes: int
    input_dim: int = 4
    grid_size: int = 64
    width: int = 32
    depth: int = 4              # submanifold conv blocks
    max_active: int = 8192      # static active-site capacity per event
    compute_dtype: str = "float32"
    # "block": dense conv on occupied 8^3 tiles (ops/block_sparse.py) —
    # fastest at LArTPC occupancies (2.7 ms vs 7.0 masked-dense vs 29.9
    # gather fwd at R64/C64, BASELINE.md r2; default since r3 after the
    # overflow-surfaced soak). "dense": submanifold semantics via
    # occupancy-masked dense conv3d, no capacity caps. "gather": the
    # classic rulebook gather formulation (per-row gathers serialize).
    impl: str = "block"
    # block impl: static per-event occupied-tile capacity and tile edge
    max_tiles: int = 128
    tile: int = 8
    # optional per-level tile capacities (level 0 first). A coarse level
    # occupies at most as many tiles as the fine one and usually far
    # fewer (measured track events: 36 fine -> 19 coarse at R64/t8), so
    # inheriting the full cap pads the expensive deep levels 2-4x.
    # Empty = max_tiles at every level; capacity exhaustion at ANY level
    # is counted and surfaced (dropped counters / strict_capacity), so
    # schedules are safe to tune per dataset.
    max_tiles_schedule: tuple = ()
    # U-Net hierarchy (all three impls): levels > 1 adds stride-2
    # downsampling stages whose occupancy is the 2^3-pooled active set,
    # with skip connections back up — a sparse U-Net where every
    # resolution only carries occupied voxels (occupied tiles for
    # impl='block'; capacity-capped site sets for impl='gather').
    levels: int = 1
    # voxelizer implementation (ops/voxel.py voxelize): "auto" picks the
    # one-hot-matmul contraction below the measured R^3*(C+1) crossover
    voxelize_impl: str = "auto"
    # fuse the LN+ReLU+mask chain into one Pallas kernel per direction.
    # True: fused on TPU, XLA form elsewhere. False: XLA form always.
    # "interpret": force the fused branch under the Pallas interpreter
    # on any backend — lets CPU CI exercise the model-level plumbing of
    # the fused path (reshape alignment, eps/out_dtype forwarding), not
    # just the kernel in isolation.
    fused_ln: bool | str = True
    # 3^3 conv implementation for impl="block": "auto" runs the
    # halo-free per-event Pallas kernel (ops/pallas/block_conv.py) on
    # TPU whenever the fused-LN path is active (the kernel emits RAW
    # conv outputs for it), falling back to the XLA halo formulation
    # elsewhere; "xla" forces the halo formulation; "interpret" forces
    # the kernel under the Pallas interpreter on any backend (CPU CI of
    # the model-level kernel plumbing).
    conv_impl: str = "auto"
    # duck-type compatibility knobs (unused)
    dropout: float = 0.0
    mask_norm_and_pool: bool = True

    @property
    def in_channels(self) -> int:
        return self.input_dim - 3 + 1

    def _tile_cap(self, lv: int) -> int:
        """Static occupied-tile capacity for hierarchy level ``lv``."""
        if self.max_tiles_schedule:
            return int(
                self.max_tiles_schedule[min(lv,
                                            len(self.max_tiles_schedule) - 1)]
            )
        return self.max_tiles

    def init(self, key: jax.Array) -> dict:
        keys = iter(jax.random.split(key, 4 * self.depth * self.levels + 8))
        p: dict = {}
        cin = self.in_channels
        for i in range(self.depth):
            p[f"conv{i}"] = subm_conv_init(next(keys), cin, self.width)
            p[f"ln{i}"] = site_layer_norm_init(self.width)
            cin = self.width
        if self.levels > 1:
            from pcseg_tpu.ops.conv3d import conv3d_init

            w = self.width
            for lv in range(1, self.levels):
                wl = w * (2 ** lv)
                p[f"down{lv}"] = conv3d_init(next(keys), 2, wl // 2, wl)
                p[f"down{lv}_ln"] = site_layer_norm_init(wl)
                for i in range(self.depth):
                    p[f"l{lv}_conv{i}"] = subm_conv_init(next(keys), wl, wl)
                    p[f"l{lv}_ln{i}"] = site_layer_norm_init(wl)
                p[f"up{lv}"] = conv3d_init(next(keys), 2, wl, wl // 2)
                p[f"up{lv}_ln"] = site_layer_norm_init(wl // 2)
        p["head"] = {
            "kernel": jax.random.uniform(
                next(keys),
                (self.width, self.num_classes),
                jnp.float32,
                -1.0 / jnp.sqrt(jnp.float32(self.width)),
                1.0 / jnp.sqrt(jnp.float32(self.width)),
            ),
            "bias": jnp.zeros((self.num_classes,), jnp.float32),
        }
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
        return_overflow: bool = False,
    ):
        """``return_overflow=True`` (eval mode) additionally returns the
        (B,) dropped-capacity counts the forward already computed, so
        eval/serving don't re-voxelize just to count overflow
        (train mode always carries them in the aux dict)."""
        p = variables["params"]
        dt = jnp.dtype(self.compute_dtype)
        if mask is None:
            mask = jnp.ones(points.shape[:2], bool)

        if self.impl == "block":
            # voxelize straight into the tile-blocked layout — the
            # dense-grid route paid ~3.7 ms/step of 8-dim transpose
            # relayouts (ops/block_sparse.block_sparse_voxelize)
            from pcseg_tpu.ops.block_sparse import block_sparse_voxelize

            bs, _lo, _scale = block_sparse_voxelize(
                points, mask, self.grid_size, self._tile_cap(0),
                self.tile, impl=self.voxelize_impl, matmul_dtype=dt,
            )
            logits, dropped = self._apply_block(p, bs, points, mask, dt)
        elif self.impl == "dense":
            grid = voxelize(points, mask, self.grid_size,
                            impl=self.voxelize_impl, matmul_dtype=dt)
            logits = self._apply_dense(p, grid, points, mask, dt)
            # dense has no capacity caps — nothing can be dropped
            dropped = jnp.zeros(points.shape[0], jnp.int32)
        else:
            grid = voxelize(points, mask, self.grid_size,
                            impl=self.voxelize_impl, matmul_dtype=dt)
            logits, dropped = self._apply_gather(p, grid, points, mask, dt)
        if train:
            aux = {} if self.impl == "dense" else {"__overflow__": dropped}
            return logits, aux
        if return_overflow:
            return logits, dropped
        return logits

    def _gather_stack(self, p, prefix, x, sp, dt):
        for i in range(self.depth):
            y = subm_conv(
                p[f"{prefix}conv{i}"], sp._replace(feats=x), compute_dtype=dt
            )
            y = site_layer_norm(p[f"{prefix}ln{i}"], y)
            y = jnp.maximum(y, 0.0).astype(dt)
            # residual after the first block (channel match); deeper
            # levels' first block adds onto the down conv's output
            x = y if (i == 0 and prefix == "") else (x + y)
        return x

    def _apply_gather(self, p, grid, points, mask, dt):
        """Rulebook-gather path. levels > 1 runs the sparse U-Net on the
        pooled active-site hierarchy (sparse_pool / sparse_down2x /
        sparse_up2x) — same parameters and, at in-capacity sites, the
        same values as the masked-dense hierarchy (test_sparse.py)."""
        sp = sparse_from_grid(grid, self.max_active)
        dropped = sp.dropped
        x = self._gather_stack(p, "", sp.feats.astype(dt), sp, dt)

        if self.levels > 1:
            skips, sps = [x], [sp]
            for lv in range(1, self.levels):
                spc = sparse_pool(sps[-1], self.max_active)
                dropped = dropped + spc.dropped
                h = sparse_down2x(
                    p[f"down{lv}"], skips[-1], sps[-1], spc, compute_dtype=dt
                )
                h = site_layer_norm(p[f"down{lv}_ln"], h)
                h = jnp.maximum(h, 0.0).astype(dt)
                h = self._gather_stack(p, f"l{lv}_", h, spc, dt)
                skips.append(h)
                sps.append(spc)
            h = skips[-1]
            for lv in range(self.levels - 1, 0, -1):
                u = sparse_up2x(
                    p[f"up{lv}"], h, sps[lv], sps[lv - 1], compute_dtype=dt
                )
                u = site_layer_norm(p[f"up{lv}_ln"], u)
                u = jnp.maximum(u, 0.0).astype(dt)
                h = skips[lv - 1] + u
            x = h

        site_logits = (
            jax.lax.dot_general(
                x.astype(dt),
                p["head"]["kernel"].astype(dt),
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + p["head"]["bias"]
        ).astype(jnp.float32)
        return gather_point_logits(site_logits, sp, points, mask), dropped

    def overflow_counts(self, points, mask=None) -> jax.Array:
        """(B,) int32 — occupied sites/tiles beyond the static capacity
        per event (every level of the block hierarchy counted). Zero for
        impl='dense' (no caps). Used by eval metrics and the Predictor
        to surface capacity exhaustion; one voxelize + occupancy scan,
        no conv work (the feature channels are sliced to width 0)."""
        from pcseg_tpu.ops.voxel import VoxelGrid

        if mask is None:
            mask = jnp.ones(points.shape[:2], bool)
        if self.impl == "dense":
            return jnp.zeros(points.shape[0], jnp.int32)
        if self.impl == "block":
            from pcseg_tpu.ops.block_sparse import (
                block_pool,
                block_sparse_voxelize,
            )

            # coords only -> occupancy channel alone rides the scan
            bs, _lo, _scale = block_sparse_voxelize(
                points[..., :3], mask, self.grid_size,
                self._tile_cap(0), self.tile, impl=self.voxelize_impl,
                matmul_dtype=jnp.dtype(self.compute_dtype),
            )
            dropped = bs.dropped
            for lv in range(1, self.levels):
                bs, _slots = block_pool(bs, self._tile_cap(lv))
                dropped = dropped + bs.dropped
            return dropped
        grid = voxelize(points, mask, self.grid_size,
                        impl=self.voxelize_impl,
                        matmul_dtype=jnp.dtype(self.compute_dtype))
        g0 = VoxelGrid(
            features=grid.features[..., :0],
            counts=grid.counts,
            lo=grid.lo,
            scale=grid.scale,
        )
        sp = sparse_from_grid(g0, self.max_active)
        dropped = sp.dropped
        for _ in range(1, self.levels):
            sp = sparse_pool(sp, self.max_active)
            dropped = dropped + sp.dropped
        return dropped

    def _fused_ln_active(self, c: int) -> bool:
        """Trace-time gate for the fused LN kernel path (TPU, or forced
        interpreter for CPU CI; portable-export contexts force it off)."""
        from pcseg_tpu.core.portable import tpu_kernels_enabled

        return (
            bool(self.fused_ln)
            and (tpu_kernels_enabled() or self.fused_ln == "interpret")
            and c % 8 == 0
        )

    def _bias_ln_relu_mask(self, y, pre_bias, ln, active):
        """conv-bias + LN + ReLU + mask as ONE kernel on the RAW bf16
        conv output (ops/pallas/fused_ln.py bias_ln_relu_mask) — the
        separate f32 [upcast + bias + where(active)] chain cost ~2.6 ms
        /step and doubled the LN kernels' input traffic (r5 profile)."""
        from pcseg_tpu.ops.pallas.fused_ln import (
            DEFAULT_TILE,
            bias_ln_relu_mask,
        )

        c = y.shape[-1]
        out = bias_ln_relu_mask(
            y.reshape(-1, c),
            pre_bias,
            ln["scale"],
            ln["bias"],
            active.reshape(-1),
            1e-5,
            jnp.dtype(self.compute_dtype),
            DEFAULT_TILE,
            True if self.fused_ln == "interpret" else None,
        )
        return out.reshape(y.shape)

    def _block_conv_kernel_active(self, cin: int, cout: int,
                                  ntiles: int, t: int) -> bool:
        """The halo-free Pallas conv (ops/pallas/block_conv.py) rides
        the fused-LN path (it emits raw outputs for the bias+LN kernel)
        and wants lane-aligned channels (the stem's 2-channel input
        keeps the XLA halo form) and VMEM-resident shapes (wide upper
        levels fall back to the XLA halo form); portable-export
        contexts force the XLA formulation."""
        from pcseg_tpu.core.portable import tpu_kernels_enabled
        from pcseg_tpu.ops.pallas.block_conv import fits_vmem

        if self.conv_impl == "xla" or not self._fused_ln_active(cout):
            return False
        if cin % 16 or cout % 16:
            # the kernel's packed lanes are t*C; 16-channel multiples
            # keep them 128-lane aligned at t=8
            return False
        if self.conv_impl == "interpret":
            return True
        return (self.conv_impl == "auto" and tpu_kernels_enabled()
                and fits_vmem(ntiles, t, cin, cout))

    def _block_stack(self, p, prefix, x, bs, dt):
        from pcseg_tpu.ops.block_sparse import block_subm_conv

        slots = None
        b, ntiles = x.shape[:2]
        t = bs.tile
        for i in range(self.depth):
            pp = p[f"{prefix}conv{i}"]
            cin = x.shape[-1]
            cout = pp["bias"].shape[0]
            if self._block_conv_kernel_active(cin, cout, ntiles, t):
                from pcseg_tpu.ops.block_sparse import _neighbor_slots
                from pcseg_tpu.ops.pallas.block_conv import block_conv

                if slots is None:
                    slots = _neighbor_slots(bs, +1)  # once per level
                w2 = pp["kernel"].reshape(-1, cout).astype(dt)
                y = block_conv(
                    x.reshape(b, ntiles, t * t * t, cin), slots, w2,
                    True if self.conv_impl == "interpret" else None,
                ).reshape(x.shape[:-1] + (cout,))
                y = self._bias_ln_relu_mask(
                    y, pp["bias"], p[f"{prefix}ln{i}"], bs.active
                )
            elif self._fused_ln_active(cout):
                y = block_subm_conv(pp, bs, feats=x, compute_dtype=dt,
                                    raw=True)
                y = self._bias_ln_relu_mask(
                    y, pp["bias"], p[f"{prefix}ln{i}"], bs.active
                )
            else:
                y = block_subm_conv(pp, bs, feats=x, compute_dtype=dt)
                y = self._ln_relu_mask(y, p[f"{prefix}ln{i}"], bs.active)
            y = y.astype(dt)
            x = y if (i == 0 and prefix == "") else (x + y)
        return x

    def _apply_block(self, p, bs, points, mask, dt):
        """Block-sparse path: dense conv on occupied tiles only (same
        params as the other impls; values at active sites identical).
        levels > 1 builds the pooled tile hierarchy (block_pool /
        block_down2x / block_up2x) — the sparse U-Net on tiles."""
        from pcseg_tpu.ops.block_sparse import (
            block_down2x,
            block_gather_point_logits,
            block_pool,
            block_up2x,
        )

        dropped = bs.dropped
        x = self._block_stack(p, "", bs.feats.astype(dt), bs, dt)

        if self.levels > 1:
            skips, bss, slot_tables = [x], [bs], [None]
            cur = bs
            for lv in range(1, self.levels):
                bsc, slots = block_pool(cur, self._tile_cap(lv))
                dropped = dropped + bsc.dropped
                fused = self._fused_ln_active(
                    p[f"down{lv}"]["bias"].shape[0]
                )
                h = block_down2x(
                    p[f"down{lv}"], skips[-1], bsc, slots, compute_dtype=dt,
                    bs_fine=cur, raw=fused,
                )
                if fused:
                    h = self._bias_ln_relu_mask(
                        h, p[f"down{lv}"]["bias"], p[f"down{lv}_ln"],
                        bsc.active,
                    )
                else:
                    h = self._ln_relu_mask(h, p[f"down{lv}_ln"], bsc.active)
                h = self._block_stack(p, f"l{lv}_", h.astype(dt), bsc, dt)
                skips.append(h)
                bss.append(bsc)
                slot_tables.append(slots)
                cur = bsc
            h = skips[-1]
            for lv in range(self.levels - 1, 0, -1):
                fused = self._fused_ln_active(p[f"up{lv}"]["bias"].shape[0])
                u = block_up2x(
                    p[f"up{lv}"], h, bss[lv], bss[lv - 1], compute_dtype=dt,
                    child_slots=slot_tables[lv], raw=fused,
                )
                if fused:
                    u = self._bias_ln_relu_mask(
                        u, p[f"up{lv}"]["bias"], p[f"up{lv}_ln"],
                        bss[lv - 1].active,
                    )
                else:
                    u = self._ln_relu_mask(u, p[f"up{lv}_ln"],
                                           bss[lv - 1].active)
                u = u.astype(dt)
                h = skips[lv - 1] + u
            x = h

        site_logits = (
            jax.lax.dot_general(
                x.astype(dt),
                p["head"]["kernel"].astype(dt),
                dimension_numbers=(((5,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + p["head"]["bias"]
        ).astype(jnp.float32)
        return (
            block_gather_point_logits(site_logits, bs, points, mask),
            dropped,
        )

    def _ln_relu_mask(self, y, ln, active):
        # On TPU this whole chain is ONE Pallas kernel per direction
        # (ops/pallas/fused_ln.py): the XLA form re-reads the (N, C)
        # activations for the moment reductions, the normalize and the
        # mask select — ~8 ms of the 45 ms block-U-Net step (r4 xplane
        # profile). CPU (tests / virtual-mesh dryrun) keeps the XLA
        # form: the interpreter can't evaluate vma-typed operands.
        from pcseg_tpu.core.portable import tpu_kernels_enabled

        force_interp = self.fused_ln == "interpret"
        if (
            self.fused_ln
            and (tpu_kernels_enabled() or force_interp)
            and y.shape[-1] % 8 == 0
        ):
            from pcseg_tpu.ops.pallas.fused_ln import ln_relu_mask

            c = y.shape[-1]
            out = ln_relu_mask(
                y.reshape(-1, c),
                ln["scale"],
                ln["bias"],
                active.reshape(-1),
                1e-5,
                jnp.dtype(self.compute_dtype),
                interpret=True if force_interp else None,
            )
            return out.reshape(y.shape)
        # single-pass moments (E[x^2] - E[x]^2): one read of y feeds both
        # reductions, halving the LN's HBM traffic vs the two-pass form
        # (the r4 block-U-Net profile showed the LN reduce/normalize
        # chains at ~17 ms/step of the 101 ms; ~1e-6 relative difference
        # in normalized values, same convention as bn_stats="fast")
        yf = y.astype(jnp.float32)
        mean = jnp.mean(yf, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(jnp.square(yf), axis=-1, keepdims=True)
            - jnp.square(mean),
            0.0,
        )
        z = (yf - mean) * jax.lax.rsqrt(var + 1e-5) * ln["scale"] + ln["bias"]
        return jnp.where(active[..., None], jnp.maximum(z, 0.0), 0.0)

    def _subm_stack(self, p, prefix, x, active, dt):
        for i in range(self.depth):
            y = subm_conv_dense(
                p[f"{prefix}conv{i}"], x, active, compute_dtype=dt
            )
            y = self._ln_relu_mask(y, p[f"{prefix}ln{i}"], active).astype(dt)
            x = y if (i == 0 and prefix == "") else (x + y)
        return x

    def _apply_dense(self, p, grid, points, mask, dt):
        """Masked-dense submanifold path (same params as the gather path)."""
        from pcseg_tpu.ops.conv3d import conv3d, conv3d_transpose

        active = grid.counts > 0
        x = grid.features.astype(dt)
        x = self._subm_stack(p, "", x, active, dt)

        if self.levels > 1:
            # encoder-decoder over pooled occupancy hierarchies
            skips, actives = [x], [active]
            a = active
            for lv in range(1, self.levels):
                a = jax.lax.reduce_window(
                    a, False, jax.lax.bitwise_or,
                    (1, 2, 2, 2), (1, 2, 2, 2), "VALID",
                )
                h = conv3d(p[f"down{lv}"], skips[-1], stride=2,
                           compute_dtype=dt)
                h = self._ln_relu_mask(h, p[f"down{lv}_ln"], a).astype(dt)
                h = self._subm_stack(p, f"l{lv}_", h, a, dt)
                skips.append(h)
                actives.append(a)
            h = skips[-1]
            for lv in range(self.levels - 1, 0, -1):
                u = conv3d_transpose(p[f"up{lv}"], h, stride=2,
                                     compute_dtype=dt)
                u = self._ln_relu_mask(
                    u, p[f"up{lv}_ln"], actives[lv - 1]
                ).astype(dt)
                h = skips[lv - 1] + u
            x = h

        voxel_logits = (
            jax.lax.dot_general(
                x.astype(dt),
                p["head"]["kernel"].astype(dt),
                dimension_numbers=(((4,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + p["head"]["bias"]
        ).astype(jnp.float32)
        return devoxelize_nearest(
            voxel_logits, points, mask, grid.lo, grid.scale
        )
