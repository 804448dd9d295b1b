"""Pallas segment-scatter kernel (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from pcseg_tpu.ops.pallas.voxel_scatter import pallas_segment_scatter


def test_pallas_segment_scatter_matches_xla(rng):
    b, m, nseg = 2, 256, 64
    ids = jnp.asarray(rng.integers(0, nseg, size=(b, m)), jnp.int32)
    # some spill entries (masked points)
    ids = ids.at[:, -10:].set(nseg)
    feats = jnp.asarray(rng.normal(size=(b, m, 3)), jnp.float32)

    got = pallas_segment_scatter(ids, feats, nseg)

    def ref_one(i_e, x_e):
        return jnp.zeros((nseg + 1, 3), jnp.float32).at[i_e].add(x_e)[:nseg]

    want = jax.vmap(ref_one)(ids, feats)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
