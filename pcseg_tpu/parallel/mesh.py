"""Device mesh + sharding: the TPU-native replacement for DataParallel.

The reference's only parallelism is single-process ``nn.DataParallel``
(pcs.py:209-213 train, :412-420 inference): replicate the module, scatter the
batch over GPUs, gather outputs — CUDA peer copies, no NCCL/MPI. The
TPU-native equivalent is a ``jax.sharding.Mesh`` with a ``data`` axis:

- the batch is sharded over ``data`` (scatter),
- params are replicated (replicate),
- gradients are combined with ``psum`` riding the ICI links (the allreduce
  DataParallel implicitly performs by computing the loss on gathered
  outputs),
- multi-host slices go through ``jax.distributed.initialize`` and the same
  collectives transparently traverse DCN.

The mesh carries extra axes (``model``) so tensor-parallel sharding can be
layered on later without changing call sites; for reference parity only
``data`` is used.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """How to carve ``jax.devices()`` into a logical mesh."""

    data: int = 0    # 0 = all remaining devices
    model: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int]:
        model = max(1, self.model)
        data = self.data if self.data > 0 else max(1, n_devices // model)
        if data * model > n_devices:
            raise ValueError(
                f"mesh {data}x{model} needs {data * model} devices, "
                f"have {n_devices}"
            )
        return data, model


def make_mesh(spec: MeshSpec = MeshSpec(), devices: Optional[list] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    data, model = spec.resolve(len(devices))
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim split over the data axis, rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host batch pytree on the mesh, batch dim over ``data``."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def psum_mean(tree: Any, axis_name: str = DATA_AXIS) -> Any:
    """Mean-allreduce a pytree across the data axis (gradient sync)."""
    n = jax.lax.psum(1, axis_name)
    return jax.tree.map(lambda g: jax.lax.psum(g, axis_name) / n, tree)


_distributed_initialized = False


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Multi-host bring-up (DCN). No-op for single-process runs.

    Replaces the reference's device bootstrap (pcs.py:14-18), which only
    picks cuda-vs-cpu; TPU slices spanning hosts need the jax.distributed
    rendezvous before any mesh is built. Reached from training via
    ``train.coordinator_address`` / ``num_processes`` / ``process_id``
    (core/config.py; train/loop.py calls this before its first device
    query). Idempotent: repeat calls in one process are ignored (JAX
    forbids double initialization). Returns True iff the rendezvous ran.
    """
    global _distributed_initialized
    if coordinator_address is None:
        return False
    if _distributed_initialized:
        prev = _distributed_initialized
        args = (coordinator_address, num_processes, process_id)
        if prev != args:
            # don't silently keep the old topology when the caller asked
            # for a different one — JAX cannot re-initialize in-process
            raise RuntimeError(
                f"jax.distributed already initialized with {prev}; "
                f"cannot re-initialize with {args} in the same process"
            )
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _distributed_initialized = (coordinator_address, num_processes,
                                process_id)
    return True
