"""Multi-host bootstrap.

Replaces the reference's launcher zoo (``multiproc.py`` env rendezvous,
SLURM ``run.sub``, OpenMPI env bootstrap ``dlrm/utils/distributed.py:75-99``)
with one call around ``jax.distributed.initialize``:

- explicit flags (coordinator address, process count/index), or
- SLURM autodetect (``SLURM_*`` env), or
- single-process fallback (the reference's ``WORLD_SIZE`` unset path,
  ``main.py:360-368``).

After ``initialize``, ``jax.devices()`` spans all hosts and the mesh layer
(``parallel/mesh.py``) sees the global device set — no per-rank code.
"""

from __future__ import annotations

import os

import jax

__all__ = ["initialize_distributed"]


def initialize_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> dict:
    """Returns {"process_index", "process_count", "device_count"}."""
    if coordinator is None and "SLURM_JOB_NUM_NODES" in os.environ:
        # SLURM autodetect (the run.sub role)
        nodes = int(os.environ["SLURM_JOB_NUM_NODES"])
        if nodes > 1:
            nodelist = os.environ.get("SLURM_STEP_NODELIST", "")
            head = nodelist.split(",")[0].replace("[", "").split("-")[0]
            # port overridable so parallel jobs on one host (or a coordinator
            # socket lingering in TIME_WAIT) can't collide on the default
            port = int(os.environ.get("COORDINATOR_PORT", "12345"))
            coordinator = f"{head}:{port}"
            num_processes = nodes
            process_id = int(os.environ.get("SLURM_PROCID", 0))
    if coordinator is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "device_count": jax.device_count(),
    }
