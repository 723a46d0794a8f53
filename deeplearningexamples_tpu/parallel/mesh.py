"""Device mesh construction and sharding helpers — the L5 layer.

This module *replaces* the reference's entire launcher + NCCL + DDP stack
(SURVEY.md §2.D, §5.8): ``multiproc.py`` / SLURM ``run.sub`` process spawning,
``dist.init_process_group("nccl")`` (reference ConvNets ``main.py:370-374``),
and DDP gradient allreduce all collapse into one mesh + sharding annotations;
XLA inserts the collectives over ICI/DCN.

Axis conventions (reserved up front so CP/EP can be added without API change,
SURVEY.md §5.7):

- ``data``     — data parallelism (the reference's DDP world)
- ``model``    — tensor/table parallelism (DLRM embedding sharding)
- ``sequence`` — context parallelism (unused by parity scope; reserved)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "MeshSpec",
    "build_mesh",
    "data_sharding",
    "replicated",
    "shard_batch",
    "shard_batch_local",
    "P",
]

DATA_AXIS = "data"
MODEL_AXIS = "model"
SEQ_AXIS = "sequence"


@dataclass(frozen=True)
class MeshSpec:
    """Declarative mesh shape. ``-1`` on one axis means "all remaining devices"."""

    data: int = -1
    model: int = 1
    sequence: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int, int]:
        dims = [self.data, self.model, self.sequence]
        if dims.count(-1) > 1:
            raise ValueError("at most one mesh axis may be -1")
        known = int(np.prod([d for d in dims if d != -1]))
        if -1 in dims:
            if n_devices % known:
                raise ValueError(f"{n_devices} devices not divisible by {known}")
            dims[dims.index(-1)] = n_devices // known
        if int(np.prod(dims)) != n_devices:
            raise ValueError(f"mesh {dims} != {n_devices} devices")
        return tuple(dims)  # type: ignore


def build_mesh(
    spec: MeshSpec | None = None, devices: Sequence[jax.Device] | None = None
) -> Mesh:
    """Build a 3-axis (data, model, sequence) mesh over the given devices.

    Single process or multi-process alike — under multi-host JAX,
    ``jax.devices()`` already spans all hosts after
    ``jax.distributed.initialize`` (which subsumes the reference's
    MASTER_ADDR/RANK env rendezvous, ``dlrm/utils/distributed.py:75-99``).
    """
    devices = list(devices if devices is not None else jax.devices())
    spec = spec or MeshSpec()
    d, m, s = spec.resolve(len(devices))
    arr = np.asarray(devices).reshape(d, m, s)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS, SEQ_AXIS))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Batch-dim-sharded over ``data`` axis, replicated elsewhere."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host-side batch pytree onto the mesh, sharded along dim 0.

    This is the host→device boundary: the TPU-native equivalent of the
    reference's ``PrefetchedWrapper`` side-stream H2D copy
    (``dataloaders.py:354-389``).
    """

    def put(x):
        x = np.asarray(x)
        return jax.device_put(x, data_sharding(mesh, x.ndim))

    return jax.tree_util.tree_map(put, batch)


def shard_batch_local(mesh: Mesh, local_batch: Any) -> Any:
    """Multi-host host→device boundary: each process passes only ITS shard.

    The reference's per-rank DistributedSampler hands every DDP rank a
    disjoint slice of the global batch (``dataloaders.py:440-446``); the
    SPMD analogue is each host process feeding its process-local rows and
    JAX assembling one global jax.Array sharded along the ``data`` axis.
    Assumes the usual DP layout: dim 0 split evenly across processes
    (global rows = local rows × process_count). Single-process this
    degenerates to :func:`shard_batch` and takes that exact path
    (``device_put`` is the plain single-host transfer).
    """
    if jax.process_count() == 1:
        return shard_batch(mesh, local_batch)

    def put(x):
        x = np.asarray(x)
        if x.ndim == 0:
            raise ValueError(
                "shard_batch_local: got a 0-d leaf — every leaf must be "
                "batch-led (dim 0 = this process's rows). Broadcast scalars "
                "to the batch dim or pass them outside the batch pytree."
            )
        gshape = (x.shape[0] * jax.process_count(), *x.shape[1:])
        return jax.make_array_from_process_local_data(
            data_sharding(mesh, x.ndim), x, gshape
        )

    return jax.tree_util.tree_map(put, local_batch)
