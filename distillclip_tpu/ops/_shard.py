"""Per-shard execution of Pallas kernels under an active device mesh.

``pallas_call`` has no SPMD partitioning rule: under plain ``pjit`` the
XLA partitioner treats the custom call conservatively and REPLICATES it,
all-gathering every operand (measured on an 8-device mesh: one flash
fwd+bwd becomes 150 all-gathers; the head-transform kernel 145
all-gathers + 672 collective-permutes).  On real multi-chip TPU that
destroys scaling; on the 1-core CPU test host the rendezvous storm
deadlocks outright (round-3 suite hang, root-caused here).

The TPU-native contract for batch-parallel kernels is ``shard_map``: each
device runs the kernel on its local rows with ZERO communication, and the
shard_map transpose inserts the one correct ``psum`` for grads of
replicated operands (weights) — the same all-reduce pjit builds for every
other parameter gradient.

``create_mesh`` (parallel/mesh.py) registers the active mesh; entry
points fall back to a direct (replicated) call when no mesh is active,
the data axis does not cover the mesh, or the sample count does not
divide — e.g. single-chip benches and kernel unit tests.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
from jax.sharding import PartitionSpec as P


def shard_rows_call(
    fn: Callable,
    row_args: Sequence[jax.Array],
    rep_args: Sequence[jax.Array],
    samples: int,
):
    """Run ``fn(*row_args, *rep_args)`` with row_args sharded on ``data``.

    ``row_args`` are leading-dim batch/rows tensors (dim 0 divisible by
    the data-axis size times ``samples`` granularity); ``rep_args`` are
    replicated (weights).  ``samples`` is the number of independently
    shardable units along dim 0 (B for [B, N, C] operands, B for
    [B*seq, C] flat rows — shard boundaries must align to whole samples).
    """
    from distillclip_tpu.parallel.mesh import DATA_AXIS, active_mesh

    mesh = active_mesh()
    if mesh is None:
        return fn(*row_args, *rep_args)
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    n = axis_sizes.get(DATA_AXIS, 1)
    if n <= 1 or mesh.size != n or samples % n != 0:
        return fn(*row_args, *rep_args)
    mapped = jax.shard_map(
        lambda *args: fn(*args),
        mesh=mesh,
        in_specs=tuple([P(DATA_AXIS)] * len(row_args) + [P()] * len(rep_args)),
        out_specs=P(DATA_AXIS),
        # pallas_call's out_shape carries no vma annotation; the replicated
        # weights' grads are still psum'd by the in_spec-driven transpose
        # (numerically verified against the unsharded path in
        # tests/test_flash_attention.py::test_sharded_kernel_grads)
        check_vma=False,
    )
    return mapped(*row_args, *rep_args)
