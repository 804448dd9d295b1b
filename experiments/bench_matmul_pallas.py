"""Bare-matmul A/B: Pallas row-tile kernel vs XLA dot at the fused-chain
shapes where bench_fused_variants showed 'matmul-only' 3x off roofline.

If XLA wins big, the fused_block kernels' grid/tiling strategy (1D row
grid, full-width output blocks) is leaving MXU/DMA overlap on the table
and the fix is kernel structure, not prologue/epilogue work.

Run: python -m experiments.bench_matmul_pallas
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

N = 64 * 2048
REPS = 50


def timed(fn, *args):
    out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    # value transfer: relay's block_until_ready returns early
    float(jnp.sum(jax.tree.leaves(fn(*args))[0][0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0][0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / REPS * 1e3


def _mm_kernel(x_ref, w_ref, y_ref):
    y_ref[:] = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(y_ref.dtype)


def pallas_mm(x, w, tile):
    n, cin = x.shape
    cout = w.shape[1]
    return pl.pallas_call(
        _mm_kernel,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile, cin), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, cout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, cout), jnp.bfloat16),
    )(x, w)


def pallas_mm_2d(x, w, tile, ctile):
    n, cin = x.shape
    cout = w.shape[1]
    return pl.pallas_call(
        _mm_kernel,
        grid=(n // tile, cout // ctile),
        in_specs=[
            pl.BlockSpec((tile, cin), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, ctile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, ctile), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, cout), jnp.bfloat16),
    )(x, w)


def main():
    rng = np.random.default_rng(0)
    for name, cin, cout in [
        ("conv5", 128, 1024),
        ("seg2", 512, 256),
        ("global", 1024, 1024),
    ]:
        x = jnp.asarray(
            rng.normal(size=(N, cin)), jnp.bfloat16
        )
        w = jnp.asarray(rng.normal(size=(cin, cout)), jnp.bfloat16)
        gf = 2 * N * cin * cout / 1e9
        tr = (N * cin + N * cout) * 2 / 1e9 + cin * cout * 2 / 1e9
        print(f"--- {name} ({cin}->{cout})  {gf:.1f} GFLOP, "
              f"{tr * 1e3:.0f} MB  floors: mxu {gf / 197:.3f} ms, "
              f"hbm {tr / 0.81:.3f} ms")

        t = timed(jax.jit(lambda x, w: jnp.dot(
            x, w, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)), x, w)
        print(f"xla dot                 {t:6.3f} ms  {gf / t:6.0f} GF/s")

        for tile in (512, 1024, 2048):
            f = jax.jit(functools.partial(pallas_mm, tile=tile))
            t = timed(f, x, w)
            print(f"pallas 1d tile={tile:5d}    {t:6.3f} ms  "
                  f"{gf / t:6.0f} GF/s", flush=True)
        for tile, ctile in ((512, 256), (1024, 256), (2048, 256),
                            (1024, 512), (2048, 512)):
            if ctile > cout:
                continue
            f = jax.jit(functools.partial(
                pallas_mm_2d, tile=tile, ctile=ctile))
            t = timed(f, x, w)
            print(f"pallas 2d {tile:5d}x{ctile:4d}    {t:6.3f} ms  "
                  f"{gf / t:6.0f} GF/s", flush=True)


if __name__ == "__main__":
    main()
