"""Sweep the conv3d_block depth-window ladder under the raised VMEM grant.

The kd ladder in conv3d_block._pick_kd was pinned by Mosaic's DEFAULT
scoped-VMEM limit (~16M): rows=2048 (128^3 at w16) OOMed at kd=2, leaving
the biggest rung at 3x slab re-reads. With compiler_params now granting
`_VMEM_LIMIT_BYTES`, this sweep re-measures each rung's best kd on the
real chip: fused U-Net core f+b at 128^3/B1 (rows 2048/1024/512) and
64^3/B8 (rows 512/256/128), differential scan timing as in
bench_unet_all.py.

Run: python -m experiments.bench_kd_vmem
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from pcseg_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

from pcseg_tpu.models.voxel_unet import VoxelUNet3d  # noqa: E402
from pcseg_tpu.ops.pallas import conv3d_block as cb  # noqa: E402

K = 2


def make_runs(step, k):
    @jax.jit
    def run(x):
        def body(x, _):
            return step(x), None

        out, _ = jax.lax.scan(body, x, None, length=k)
        return out

    return run


def measure_one(step, x0, reps=4):
    s, l = make_runs(step, K), make_runs(step, 4 * K)
    for r in (s, l):
        out = r(x0)
        float(jax.tree.leaves(out)[0].reshape(-1)[0])
    best = [float("inf"), float("inf")]
    for _ in range(reps):
        for i, r in enumerate((s, l)):
            t0 = time.perf_counter()
            out = r(x0)
            float(jax.tree.leaves(out)[0].reshape(-1)[0])
            best[i] = min(best[i], time.perf_counter() - t0)
    return (best[1] - best[0]) / (3 * K) * 1e3


def ladder(table):
    """table: rows-threshold -> (kd, kd_accum)."""

    def pick(d, rows, has_accum=False):
        for thresh, (kd, kda) in table:
            if rows <= thresh:
                kd = kda if has_accum else kd
                break
        else:
            kd = 1
        while kd > 1 and d % kd:
            kd //= 2
        return kd

    return pick


BASE = [(512, (8, 4)), (1024, (2, 1)), (10 ** 9, (1, 1))]
V1 = [(512, (8, 4)), (1024, (2, 2)), (10 ** 9, (2, 2))]
V2 = [(512, (8, 8)), (1024, (4, 4)), (10 ** 9, (4, 4))]
V3 = [(512, (16, 8)), (1024, (8, 4)), (10 ** 9, (4, 2))]


def core_fb(model, p, x0):
    core = model._unet_core_fused

    def step(x):
        def loss(pp, xx):
            return jnp.mean(core(pp, xx).astype(jnp.float32) ** 2)

        gr = jax.grad(loss)(p, x)
        return x + sum(
            jnp.sum(g).astype(jnp.float32) for g in jax.tree.leaves(gr)
        ).astype(x.dtype) * 1e-6

    return step


def main():
    rng = np.random.default_rng(0)
    configs = [
        ("128^3/B1/w16", dict(b=1, r=128, w=16, levels=3)),
        ("64^3/B8/w16", dict(b=8, r=64, w=16, levels=3)),
    ]
    variants = [("base", BASE), ("v1-kd2", V1), ("v2-kd4", V2),
                ("v3-deep", V3)]
    for cname, cfg in configs:
        model = VoxelUNet3d(num_classes=4, grid_size=cfg["r"], width=cfg["w"],
                            levels=cfg["levels"], compute_dtype="bfloat16",
                            conv_impl="fused")
        p = model.init(jax.random.key(0))["params"]
        x0 = jnp.asarray(
            rng.normal(size=(cfg["b"], cfg["r"], cfg["r"], cfg["r"],
                             model.in_channels)), jnp.bfloat16)
        for vname, table in variants:
            cb._pick_kd = ladder(table)
            try:
                t = measure_one(core_fb(model, p, x0), x0)
                print(f"{cname:14s} {vname:8s} core f+b {t:8.2f} ms",
                      flush=True)
            except Exception as e:  # noqa: BLE001 — compile OOM is data
                print(f"{cname:14s} {vname:8s} FAILED: "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)


def refine():
    """Second pass around the first sweep's winners."""
    rng = np.random.default_rng(0)
    configs = [
        ("128^3/B1/w16", dict(b=1, r=128, w=16, levels=3)),
        ("64^3/B8/w16", dict(b=8, r=64, w=16, levels=3)),
    ]
    variants = [
        ("v3-deep", V3),
        ("v4", [(512, (32, 16)), (1024, (8, 8)), (10 ** 9, (4, 4))]),
        ("v5", [(512, (16, 16)), (1024, (8, 8)), (10 ** 9, (8, 4))]),
    ]
    for cname, cfg in configs:
        model = VoxelUNet3d(num_classes=4, grid_size=cfg["r"], width=cfg["w"],
                            levels=cfg["levels"], compute_dtype="bfloat16",
                            conv_impl="fused")
        p = model.init(jax.random.key(0))["params"]
        x0 = jnp.asarray(
            rng.normal(size=(cfg["b"], cfg["r"], cfg["r"], cfg["r"],
                             model.in_channels)), jnp.bfloat16)
        for vname, table in variants:
            cb._pick_kd = ladder(table)
            try:
                t = measure_one(core_fb(model, p, x0), x0)
                print(f"{cname:14s} {vname:8s} core f+b {t:8.2f} ms",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{cname:14s} {vname:8s} FAILED: "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
    refine()
