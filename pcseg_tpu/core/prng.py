"""PRNG handling.

The reference is unseeded end-to-end (split pcs.py:194, shuffles, dropout),
so its runs are not reproducible. Here every source of randomness flows from
one root key: fold_in by purpose and step so adding a consumer never
perturbs the streams of existing ones.
"""

from __future__ import annotations

import jax

# Stable purpose tags (fold_in data), so streams are independent.
_PURPOSES = {
    "params": 0,
    "dropout": 1,
    "shuffle": 2,
    "split": 3,
    "synthetic": 4,
}


def root_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def purpose_key(root: jax.Array, purpose: str, step: int = 0) -> jax.Array:
    k = jax.random.fold_in(root, _PURPOSES[purpose])
    return jax.random.fold_in(k, step)
