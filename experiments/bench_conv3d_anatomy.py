"""Anatomy of the fused 3^3 conv forward kernel: which piece costs what.

Builds variant Pallas kernels sharing the real kernel's helpers but with
individual pieces removed (edge matmul, row shifts, stats, prologue,
main taps) at the level-0 U-Net shape (B8 x 64^3 x 16ch packed ->
rows=512). Differential scan timing. The deltas vs 'full' locate the
gap between the measured fwd (~1.2-1.5 ms) and its ~0.55 ms MXU floor.

NOT part of the library — a measurement harness.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pcseg_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

from pcseg_tpu.ops.pallas.conv3d_block import (  # noqa: E402
    LANES,
    _conv_core,
    _edge_panel,
    _halo_specs,
    _pick_kd,
    _shift_rows,
    _window_prep_fn,
    pack_grid,
    pack_weights,
)

B, R, C = 8, 64, 16
K = 8


def _variant_kernel(*refs, u, c, kd, mode):
    it = iter(refs)
    xm_ref, x0_ref, xp_ref = next(it), next(it), next(it)
    scale_ref, shift_ref = next(it), next(it)
    wm_ref, we_ref, bias_ref = next(it), next(it), next(it)
    y_ref = next(it)
    stats_ref = next(it)

    activate = mode != "noprep"
    prep = _window_prep_fn(xm_ref, x0_ref, xp_ref, scale_ref, shift_ref,
                           activate, kd, u, c)
    window = [prep(0), prep(1), prep(2)]

    @pl.when(pl.program_id(1) == 0)
    def _():
        stats_ref[0] = jnp.zeros_like(stats_ref[0])

    s_acc = [jnp.zeros((2, LANES), jnp.float32) for _ in range(2)]
    for k in range(kd):
        if k + 1 < kd:
            window.append(prep(k + 3))
        pairs = window[k : k + 3]
        slabs = [s for s, _ in pairs]
        if mode == "onetap":
            acc = jnp.dot(slabs[1], wm_ref[4 * LANES : 5 * LANES],
                          preferred_element_type=jnp.float32)
        elif mode == "noshift":
            acc = jnp.zeros((slabs[0].shape[0], LANES), jnp.float32)
            for t, slab in enumerate(slabs):
                for dy in range(3):
                    acc = acc + jnp.dot(
                        slab, wm_ref[(3 * t + dy) * LANES :
                                     (3 * t + dy + 1) * LANES],
                        preferred_element_type=jnp.float32,
                    )
        elif mode == "noedge":
            acc = jnp.zeros((slabs[0].shape[0], LANES), jnp.float32)
            t = 0
            for slab in slabs:
                for dy in (-1, 0, 1):
                    sh = _shift_rows(slab, dy * u)
                    acc = acc + jnp.dot(
                        sh, wm_ref[t * LANES : (t + 1) * LANES],
                        preferred_element_type=jnp.float32,
                    )
                    t += 1
        elif mode == "edgeonly":
            acc = jnp.zeros((slabs[0].shape[0], LANES), jnp.float32)
            for dz, (_, panel) in enumerate(pairs):
                acc = acc + jnp.dot(
                    panel, we_ref[dz * 6 * c : (dz + 1) * 6 * c],
                    preferred_element_type=jnp.float32,
                )
        else:
            acc = _conv_core(pairs, wm_ref, we_ref, u, c)
        acc = acc + bias_ref[0]
        y_ref[0, k] = acc.astype(y_ref.dtype)
        if mode != "nostats":
            s_acc[k % 2] = s_acc[k % 2] + jnp.stack(
                [jnp.sum(acc, axis=0), jnp.sum(acc * acc, axis=0)]
            )
    stats_ref[0] += s_acc[0] + s_acc[1]


def run_variant(xp, wm, we, bias_lane, scale, shift, meta, mode):
    b, d, rows, _ = xp.shape
    h, u, c = meta
    kd = _pick_kd(d, rows)
    prev, cur, nxt = _halo_specs(rows, kd, d)
    bspec = pl.BlockSpec((1, 1, LANES), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_specs = (
        pl.BlockSpec((1, kd, rows, LANES), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2, LANES), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    )
    out_shape = (
        jax.ShapeDtypeStruct((b, d, rows, LANES), jnp.bfloat16),
        jax.ShapeDtypeStruct((b, 2, LANES), jnp.float32),
    )
    return pl.pallas_call(
        functools.partial(_variant_kernel, u=u, c=c, kd=kd, mode=mode),
        grid=(b, d // kd),
        in_specs=[prev, cur, nxt, bspec, bspec, wspec, wspec,
                  pl.BlockSpec((1, 1, LANES), lambda i, j: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=out_specs,
        out_shape=out_shape,
    )(xp, xp, xp, scale[:, None], shift[:, None],
      wm.astype(jnp.bfloat16), we.astype(jnp.bfloat16),
      bias_lane.reshape(1, 1, LANES))


def timed(step, x0, reps=4):
    def make(k):
        @jax.jit
        def run(x):
            def body(x, _):
                return step(x), None

            out, _ = jax.lax.scan(body, x, None, length=k)
            return out

        return run

    short, long = make(K), make(4 * K)

    def once(run):
        out = run(x0)
        float(jax.tree.leaves(out)[0].reshape(-1)[0])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run(x0)
            float(jax.tree.leaves(out)[0].reshape(-1)[0])
            best = min(best, time.perf_counter() - t0)
        return best

    return (once(long) - once(short)) / (3 * K) * 1e3


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, R, R, R, C)), jnp.bfloat16)
    xp, meta = pack_grid(x)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, C, C)) * 0.05, jnp.float32)
    wm, we = pack_weights(w)
    bias_lane = jnp.zeros((LANES,), jnp.float32)
    scale = jnp.ones((B, LANES), jnp.float32)
    shift = jnp.zeros((B, LANES), jnp.float32)

    for mode in ("full", "nostats", "noedge", "noshift", "noprep",
                 "edgeonly", "onetap"):
        def step(xx, mode=mode):
            y, st = run_variant(xx, wm, we, bias_lane, scale, shift, meta,
                                mode)
            bump = (st[:, 0, 0] * 1e-12).astype(xx.dtype)
            return xx + bump[:, None, None, None]

        t = timed(step, xp)
        print(f"{mode:10s} {t:8.3f} ms")


if __name__ == "__main__":
    main()
