"""Real multi-node (multi-process) SPMD: 2 coordinated JAX processes.

The reference tests its launchers only implicitly (DDP smoke via
``torch.distributed.launch``); here the multi-host path runs for real on
one box: two OS processes × 4 virtual CPU devices each join through
``jax.distributed.initialize`` into a single 8-device mesh, train a model
with cross-process gradient collectives, and must agree with each other
AND with a single-process 8-device oracle of the same global program.

Covers SURVEY.md §2.D multi-node: ``parallel/dist.py`` explicit-flags and
SLURM-autodetect rendezvous, ``shard_batch_local`` per-process feeding
(the DistributedSampler analogue), and cross-host gradient psum.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "multinode_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _launch(mode: str, port: int):
    env = {
        k: v
        for k, v in os.environ.items()
        # workers must not inherit the single-process test env
        if not k.startswith(("SLURM_", "JAX_", "XLA_"))
    }
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port), mode],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    return outs


def _check(outs):
    for o in outs:
        assert o["process_count"] == 2
        assert o["device_count"] == 8
    # the two hosts run one SPMD program — identical results required
    assert outs[0]["losses"] == outs[1]["losses"]
    assert outs[0]["param_digest"] == outs[1]["param_digest"]

    # and the distributed run must match a single-process 8-device oracle
    # (same mesh shape, same global data, in-process collectives)
    if HERE not in sys.path:
        sys.path.insert(0, HERE)
    import multinode_worker

    oracle_losses, oracle_digest = multinode_worker.run_steps(multihost=False)
    assert np.all(np.isfinite(oracle_losses))
    np.testing.assert_allclose(outs[0]["losses"], oracle_losses, rtol=1e-5)
    np.testing.assert_allclose(outs[0]["param_digest"], oracle_digest, rtol=1e-5)


@pytest.mark.slow
def test_two_process_training_matches_single_process():
    _check(_launch("explicit", _free_port()))


@pytest.mark.slow
def test_slurm_autodetect_rendezvous():
    # Workers set the SLURM_* env themselves and call
    # initialize_distributed() with no args; the SLURM branch reads the
    # head-node port from COORDINATOR_PORT (default 12345), which the
    # worker sets to a freshly bound free port to avoid collisions.
    _check(_launch("slurm", _free_port()))
