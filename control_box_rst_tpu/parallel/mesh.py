"""Device mesh construction and batch sharding.

No reference equivalent (SURVEY.md §2.7): the reference is single-process
C++; its benchmark sweeps run sequentially
(ref: src/tasks/src/benchmark_task_varying_initial_state.cpp:35-80). Here the
sweep/scenario axis is a first-class *sharded batch axis*: thousands of
independent MPC solves are vmapped, the batch dimension is laid out over a
`jax.sharding.Mesh`, and XLA partitions the (embarrassingly parallel) solves
across chips — collectives only appear for cross-lane reductions (metrics),
riding ICI within a slice.

Mesh axes: ('batch',) is the only axis the MPC workload needs — stage and
KKT parallelism live *inside* each lane as batched tensor ops. A second axis
can shard scenario groups across DCN-connected slices; `make_mesh` accepts
an arbitrary shape for that.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("batch",),
    devices=None,
) -> Mesh:
    """Build a mesh over all (or the given) devices. Default: 1-D 'batch'."""
    devices = jax.devices() if devices is None else devices
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "batch") -> NamedSharding:
    """Sharding that splits the leading (batch) dimension over `axis`."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Mesh, axis: str = "batch"):
    """Place a batched pytree with its leading axis sharded over the mesh."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), x)


def pad_to_multiple(x, multiple: int, axis: int = 0):
    """Pad the batch axis so it divides the device count (returns (x, n_pad))."""
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, 0
    pad_widths = [(0, 0)] * x.ndim
    pad_widths[axis] = (0, rem)
    return np.pad(np.asarray(x), pad_widths, mode="edge"), rem
