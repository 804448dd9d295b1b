"""Micro-bench: Pallas plane_contract/plane_gather vs XLA one-hot dots
at the 64^3/B8 bench shapes (differential scan timing)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from pcseg_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

from pcseg_tpu.ops.pallas.onehot_contract import (  # noqa: E402
    plane_contract,
    plane_gather,
)

K = 2
B, M, R, NC = 8, 8192, 64, 4
ZY = R * R


def timed(fn, *args, reps=4):
    def make(k):
        @jax.jit
        def run(*a):
            def body(c, _):
                out = fn(*a)
                return c + out.reshape(-1)[0].astype(jnp.float32), None

            s, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
            return s

        return run

    short, long = make(K), make(4 * K)
    best = [float("inf")] * 2
    for i, r_ in enumerate((short, long)):
        float(r_(*args))
        for _ in range(reps):
            t0 = time.perf_counter()
            float(r_(*args))
            best[i] = min(best[i], time.perf_counter() - t0)
    return (best[1] - best[0]) / (3 * K) * 1e3


def xla_contract(idx, wt, d):
    z = idx // R
    y = idx % R
    iota = jnp.arange(R)
    a = None
    for k in range(idx.shape[-1]):
        wz = (z[..., k, None] == iota).astype(jnp.bfloat16)
        wy = (y[..., k, None] == iota).astype(jnp.bfloat16)
        term = (wz[..., :, None] * wy[..., None, :])
        if wt is not None:
            term = term * wt[..., k, None, None].astype(jnp.bfloat16)
        a = term if a is None else a + term
    a = a.reshape(B, M, ZY)
    return jax.lax.dot_general(
        a, d, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def main():
    rng = np.random.default_rng(0)
    n = R * 3
    idx1 = jnp.asarray(rng.integers(0, ZY, size=(B, M, 1)), jnp.int32)
    idx4 = jnp.asarray(rng.integers(0, ZY, size=(B, M, 4)), jnp.int32)
    wt4 = jnp.asarray(rng.random(size=(B, M, 4)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(B, M, n)), jnp.bfloat16)
    g = jnp.asarray(rng.normal(size=(B, ZY, R * NC)), jnp.bfloat16)

    for chunk in (512, 1024, 2048):
        t = timed(lambda a, b_: plane_contract(a, None, b_, ZY, chunk=chunk),
                  idx1, d)
        print(f"plane_contract T=1 chunk={chunk}: {t:6.2f} ms")
    t = timed(lambda a, b_: xla_contract(a, None, b_), idx1, d)
    print(f"xla contract T=1          : {t:6.2f} ms")
    dq = jnp.asarray(rng.normal(size=(B, M, R * NC)), jnp.bfloat16)
    for chunk in (512, 1024, 2048):
        t = timed(lambda a, w, b_: plane_contract(a, w, b_, ZY, chunk=chunk),
                  idx4, wt4, dq)
        print(f"plane_contract T=4 chunk={chunk}: {t:6.2f} ms")
    t = timed(lambda a, w, b_: xla_contract(a, w, b_), idx4, wt4, dq)
    print(f"xla contract T=4          : {t:6.2f} ms")
    for chunk in (512, 1024, 2048):
        t = timed(lambda a, w, g_: plane_gather(a, w, g_, chunk=chunk),
                  idx4, wt4, g)
        print(f"plane_gather   T=4 chunk={chunk}: {t:6.2f} ms")


if __name__ == "__main__":
    main()
