"""Per-layer microbenchmark of the fused Pallas blocks (fwd and fwd+bwd).

Times each layer of the headline chain (B64 x M2048 -> N=131072 rows) in
isolation against its matmul roofline, to locate the backward's gap
(VERDICT r1: step ~19.4 ms vs ~13 ms roofline; backward is ~2x off).

Per-op dispatch on this relay has a ~2 ms floor with high variance, so a
single call tells you nothing: each measurement runs K iterations of the
op inside ONE jitted lax.scan with a data dependency between iterations,
and the (value-transfer-synced) total is divided by K.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from pcseg_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

from pcseg_tpu.models.pointnet_fused import _pick_tile  # noqa: E402
from pcseg_tpu.ops.pallas.fused_block import fused_block  # noqa: E402

N = 64 * 2048
PEAK_TFLOPS = 148.0  # measured bf16 peak on this chip (BASELINE.md)
K = 20

# (name, cin, cout, normalize, drop, emit_stats, rows_per_batch)
LAYERS = [
    ("conv1", 4, 64, False, 0.0, True, 0),
    ("conv2", 64, 64, True, 0.0, True, 0),
    ("conv3", 64, 64, True, 0.0, True, 0),
    ("conv4", 64, 128, True, 0.0, True, 0),
    ("conv5", 128, 1024, True, 0.0, True, 0),
    ("global", 1024, 1024, True, 0.0, True, 0),
    ("seg1", 64, 512, True, 0.0, True, 2048),
    ("seg2", 512, 256, True, 0.3, True, 0),
    ("seg3", 256, 128, True, 0.3, True, 0),
    ("seg4", 128, 128, True, 0.0, False, 0),  # real cout=4; pad to 128
]


def timed_scan(step, x0, reps=4):
    """ms per step, with the relay's fixed per-call latency cancelled:
    time a K-iteration and a 6K-iteration scan, report the difference."""

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


def main():
    rng = np.random.default_rng(0)
    seed = jnp.zeros((1,), jnp.int32)
    total_f = total_b = total_roof = 0.0
    print(f"{'layer':8s} {'tile':>5s} {'fwd ms':>7s} {'f+b ms':>7s} "
          f"{'bwd ms':>7s} {'roof f':>7s} {'roof b':>7s} {'bwd eff':>7s}")
    for name, cin, cout, norm, drop, emit, rpb in LAYERS:
        x0 = jnp.asarray(rng.normal(size=(N, cin)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(cin, cout)) * 0.05, jnp.bfloat16)
        b = jnp.zeros((cout,), jnp.float32)
        if norm:
            mu = jnp.zeros((cin,), jnp.float32)
            inv = jnp.ones((cin,), jnp.float32)
            gamma = jnp.ones((cin,), jnp.float32)
            beta = jnp.zeros((cin,), jnp.float32)
        else:
            mu = inv = gamma = beta = None
        rb = (
            jnp.asarray(rng.normal(size=(N // rpb, cout)), jnp.float32)
            if rpb else None
        )
        tile = _pick_tile(N, rpb or None, cin, cout)

        def op(x):
            return fused_block(
                x, mu, inv, gamma, beta, w, b, rb, seed,
                norm, drop, emit, rpb, tile, jnp.bfloat16,
            )

        def fwd_step(x):
            y, s1, s2 = op(x)
            # cheap cross-shape dependency back to x's shape
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
        t_b = t_fb - t_f
        flops_f = 2.0 * N * cin * cout
        roof_f = flops_f / (PEAK_TFLOPS * 1e12) * 1e3
        roof_b = 2 * roof_f
        eff = roof_b / t_b if t_b > 0 else float("inf")
        total_f += t_f
        total_b += t_b
        total_roof += roof_f + roof_b
        print(f"{name:8s} {tile:5d} {t_f:7.3f} {t_fb:7.3f} {t_b:7.3f} "
              f"{roof_f:7.3f} {roof_b:7.3f} {eff:6.1%}")
    print(f"{'TOTAL':8s} {'':5s} {total_f:7.3f} {'':7s} {total_b:7.3f} "
          f"roofline f+b {total_roof:7.3f}")


if __name__ == "__main__":
    main()
