"""Dump the compiled voxel-train-step HLO and locate the big layout
copies/pads (op metadata carries the source line)."""
import re
import sys

import jax
import jax.numpy as jnp
import numpy as np

from pcseg_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

import bench  # noqa: E402
from pcseg_tpu.models.voxel_unet import VoxelUNet3d  # noqa: E402
from pcseg_tpu.parallel.mesh import MeshSpec, make_mesh, shard_batch  # noqa: E402
from pcseg_tpu.train.optim import make_optimizer  # noqa: E402
from pcseg_tpu.train.steps import create_train_state, make_train_step  # noqa: E402


def main(pattern=r"%(copy\.2350|copy\.2169|copy\.2342|pad\.61|pad\.0 |fusion\.5 |add_convert_fusion)"):
    mesh = make_mesh(MeshSpec(data=len(jax.devices())))
    model = VoxelUNet3d(num_classes=4, grid_size=64, width=16,
                        compute_dtype="bfloat16", conv_impl="fused")
    tx = make_optimizer()
    state = create_train_state(model, jax.random.key(0), tx)
    step = make_train_step(model, tx, mesh, donate=False)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(8, 8192, 4)), jnp.float32)
    lbl = jnp.asarray(rng.integers(0, 4, size=(8, 8192)))
    msk = jnp.ones((8, 8192), bool)
    batch = shard_batch(mesh, (pts, lbl, msk))
    lowered = jax.jit(step).lower(
        state, batch, jnp.float32(1e-3), jax.random.key(7),
        jnp.ones((4,), jnp.float32))
    txt = lowered.compile().as_text()
    with open("/tmp/voxel_step.hlo", "w") as f:
        f.write(txt)
    print(f"HLO: {len(txt)} chars -> /tmp/voxel_step.hlo")
    for line in txt.splitlines():
        if re.search(pattern, line):
            print(line[:600])
            print()


if __name__ == "__main__":
    main(*sys.argv[1:])
