"""Device mesh + sharding helpers.

The reference's only parallelism is DDP over 4 GPUs (SURVEY.md §2.6:
Lightning 'ddp_find_unused_parameters_false', NCCL).  TPU-native
replacement: a ``jax.sharding.Mesh`` with a ``data`` axis; the batch is
sharded over ICI, parameters are replicated, and XLA inserts the gradient
all-reduce — no hand-written comm layer.

A ``model`` axis is provisioned for tensor-parallel sharding of the larger
teachers (ViT-L) even though parity never requires it; helpers treat a
size-1 axis as a no-op.

Multi-host: ``initialize_distributed()`` wires ``jax.distributed`` from
explicit args or env; ``create_mesh`` spans the GLOBAL device set and
``shard_batch`` accepts each process's LOCAL batch shard, assembling the
global array (``jax.make_array_from_process_local_data``).  The reference
delegated all of this to Lightning's per-GPU process spawn + NCCL
(main.py:25, image.yaml:67); here a process is a host and the collectives
ride ICI/DCN via XLA.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array

DATA_AXIS = "data"
MODEL_AXIS = "model"

# Active-mesh registry: Pallas kernel entry points consult this to run
# per-shard under shard_map instead of being replicated by the SPMD
# partitioner (ops/_shard.py has the measurements).  ``create_mesh``
# registers the mesh it builds; entry points that tear a mesh down can
# call ``set_active_mesh(None)``.
_ACTIVE_MESH: Optional[Mesh] = None


def set_active_mesh(mesh: Optional[Mesh]) -> Optional[Mesh]:
    """Register the mesh kernels should shard over; returns the previous."""
    global _ACTIVE_MESH
    prev = _ACTIVE_MESH
    _ACTIVE_MESH = mesh
    return prev


def active_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> bool:
    """Initialize ``jax.distributed`` for multi-host runs; no-op single-host.

    Args fall back to the standard env vars (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID — also set by TPU pod runtimes
    automatically, in which case ``initialize()`` needs no arguments).
    Returns True when a multi-process runtime was initialized.

    On the ``cpu`` platform the gloo collectives implementation is selected
    so multi-process validation runs work without TPU hardware (the CI
    answer to "test multi-node without a cluster", SURVEY.md §4).
    """
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and (num_processes is None or num_processes <= 1):
        return False
    # NOTE: must not touch the backend (jax.devices()/default_backend())
    # before jax.distributed.initialize — read the CONFIGURED platform
    platforms = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
    if "cpu" in str(platforms):
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return True


def create_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    Data-parallel only by default: every device goes on the ``data`` axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model != len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} does not cover {len(devices)} devices"
        )
    arr = np.asarray(devices).reshape(n_data, n_model)
    mesh = Mesh(arr, (DATA_AXIS, MODEL_AXIS))
    set_active_mesh(mesh)
    return mesh


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over the data axis for any-rank arrays."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host batch onto the mesh, sharded over the data axis.

    Single-process: a plain sharded device_put of the global batch.
    Multi-process: ``batch`` is this process's LOCAL shard (the loader
    yields per-process slices) and the global array is assembled from the
    per-process pieces without any cross-host copy.
    """
    sharding = batch_sharding(mesh)

    def put(x):
        # idempotent: already-sharded global arrays (DevicePrestagedLoader
        # batches re-entering the trainer's per-step shard_batch) pass
        # through — np.asarray on a non-addressable global array would
        # raise in multi-process runs, and re-putting is wasted work
        if isinstance(x, jax.Array) and x.sharding == sharding:
            return x
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Replicate a host tree over the mesh.

    Multi-process: every process must hold the SAME host values (the tasks
    guarantee this — params come from a seeded init and checkpoints are
    read by every process); the replicated global array is then assembled
    from the identical local copies.
    """
    sharding = replicated(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            tree,
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
