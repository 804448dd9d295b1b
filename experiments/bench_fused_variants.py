"""Variant sweep for the slowest fused-block layers (r3 profile).

bench_fused_layers.py showed the isolated kernels 11.2 ms vs 7.5 ms
roofline, concentrated in: global fwd (+0.77), conv5 fwd (+0.43),
seg2 f+b (+0.9), seg1 fwd (+0.36). This sweeps the trace-time knobs
(row tile, NUM_HALVES overlap split, DROP_BITS PRNG width) per layer to
find the fastest configuration before baking it into _pick_tile /
pointnet_fused.

Run: python experiments/bench_fused_variants.py  (from /root/repo)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from pcseg_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

from pcseg_tpu.ops.pallas import fused_block as fb  # noqa: E402

N = 64 * 2048
K = 20

# name, cin, cout, norm, drop, emit, rows_per_batch
CASES = {
    "conv5": (128, 1024, True, 0.0, True, 0),
    "global": (1024, 1024, True, 0.0, True, 0),
    "seg1": (64, 512, True, 0.0, True, 2048),
    "seg2": (512, 256, True, 0.3, True, 0),
    "seg3": (256, 128, True, 0.3, True, 0),
}


def timed_scan(step, x0, reps=4):
    def make(k):
        @jax.jit
        def run(x):
            def body(x, _):
                return step(x), None

            out, _ = jax.lax.scan(body, x, None, length=k)
            return out

        return run

    short, long = make(K), make(6 * K)

    def once(run):
        out = run(x0)
        float(out.reshape(-1)[0])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run(x0)
            float(out.reshape(-1)[0])
            best = min(best, time.perf_counter() - t0)
        return best

    return (once(long) - once(short)) / (5 * K) * 1e3


def bench(name, tile, nh, drop_bits, norm_override=None, emit_override=None):
    cin, cout, norm, drop, emit, rpb = CASES[name]
    if norm_override is not None:
        norm = norm_override
    if emit_override is not None:
        emit = emit_override
    rng = np.random.default_rng(0)
    seed = jnp.zeros((1,), jnp.int32)
    x0 = jnp.asarray(rng.normal(size=(N, cin)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(cin, cout)) * 0.05, jnp.bfloat16)
    b = jnp.zeros((cout,), jnp.float32)
    mu = jnp.zeros((cin,), jnp.float32) if norm else None
    inv = jnp.ones((cin,), jnp.float32) if norm else None
    gamma = jnp.ones((cin,), jnp.float32) if norm else None
    beta = jnp.zeros((cin,), jnp.float32) if norm else None
    rb = (
        jnp.asarray(rng.normal(size=(N // rpb, cout)), jnp.float32)
        if rpb else None
    )

    fb.NUM_HALVES = nh
    if drop_bits != 32:
        raise ValueError(
            "sub-32-bit dropout draws were rejected (Mosaic has no "
            "sub-32-bit unsigned compare on this target)"
        )

    def op(x):
        return fb.fused_block(
            x, mu, inv, gamma, beta, w, b, rb, seed,
            norm, drop, emit, rpb, tile, jnp.bfloat16,
        )

    def fwd_step(x):
        y, s1, s2 = op(x)
        return x + jnp.mean(y).astype(x.dtype) * 1e-6

    def loss(x):
        y, s1, s2 = op(x)
        out = jnp.sum(y.astype(jnp.float32))
        if s1 is not None:
            out = out + jnp.sum(s1) + jnp.sum(s2) * 1e-3
        return out

    g = jax.grad(loss)

    def fb_step(x):
        return x + g(x) * 1e-6

    t_f = timed_scan(fwd_step, x0)
    t_fb = timed_scan(fb_step, x0)
    fb.NUM_HALVES = None
    return t_f, t_fb


def main():
    import sys

    if sys.argv[1:2] == ["anatomy"]:
        # isolate prologue/epilogue costs at the default tile
        for name in sys.argv[2:] or ["conv5", "global"]:
            print(f"--- {name} anatomy")
            for norm_o, emit_o, label in [
                (None, None, "full"),
                (None, False, "no-stats"),
                (False, None, "no-norm"),
                (False, False, "matmul-only"),
            ]:
                t_f, t_fb = bench(name, 512, 2, 32, norm_o, emit_o)
                print(f"{label:12s} fwd {t_f:6.3f}  f+b {t_fb:6.3f}",
                      flush=True)
        return

    layers = sys.argv[1:] or list(CASES)
    for name in layers:
        cin, cout, norm, drop, emit, rpb = CASES[name]
        print(f"--- {name} ({cin}->{cout}, drop={drop}, rpb={rpb})")
        # shortlists per layer: compiles are ~30s each on this relay, so
        # sweep only the plausible neighborhood of the current choice
        tiles, nhs = {
            "conv5": ([512, 1024], [2, 4]),
            "global": ([256, 512], [2, 4]),
            "seg1": ([1024, 2048], [2, 4]),
            "seg2": ([512, 1024], [2]),
            "seg3": ([1024], [2]),
        }[name]
        bits = [32]
        for tile in tiles:
            if rpb and rpb % tile != 0:
                continue
            if N % tile != 0:
                continue
            for nh in nhs:
                for db in bits:
                    try:
                        t_f, t_fb = bench(name, tile, nh, db)
                    except Exception as e:  # noqa: BLE001
                        print(f"tile={tile:5d} nh={nh} bits={db:2d}  "
                              f"FAIL {type(e).__name__}")
                        continue
                    print(f"tile={tile:5d} nh={nh} bits={db:2d}  "
                          f"fwd {t_f:6.3f}  f+b {t_fb:6.3f}", flush=True)


if __name__ == "__main__":
    main()
