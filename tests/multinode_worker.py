"""One 'host' process of the 2-process multi-node test (test_multinode.py).

Each process owns 4 virtual CPU devices; ``jax.distributed.initialize``
joins them into one 8-device SPMD job — the TPU-native replacement for the
reference's per-rank launchers (ConvNets ``multiproc.py`` env rendezvous,
DLRM ``utils/distributed.py:75-99`` MPI bootstrap, BERT SLURM ``run.sub``).

Usage: python multinode_worker.py <pid> <nproc> <port> <explicit|slurm>

Prints one JSON line: {"pid": .., "process_count": .., "device_count": ..,
"losses": [..], "param_digest": ..} — the parent asserts the two processes
agree and match a single-process oracle run of the same global program.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

GLOBAL_BATCH = 16
STEPS = 3


def run_steps(multihost: bool):
    """3 DP train steps of a tiny ResNet over the full 8-device mesh.

    Deterministic everywhere: every process regenerates the same global
    batch from a fixed seed; under ``multihost`` each feeds only its own
    slice through ``shard_batch_local``. Returns (losses, param_digest).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deeplearningexamples_tpu.core import optimizers as opt
    from deeplearningexamples_tpu.core.train import (
        create_train_state,
        make_train_step,
    )
    from deeplearningexamples_tpu.models.convnets import ARCHS, ClassificationTask, ResNet
    from deeplearningexamples_tpu.parallel import (
        MeshSpec,
        build_mesh,
        shard_batch,
        shard_batch_local,
    )

    mesh = build_mesh(MeshSpec(data=jax.device_count()))
    arch = ARCHS["resnet50"].__class__(layers=(1, 1, 1, 1), widths=(8, 8, 8, 8))
    task = ClassificationTask(
        ResNet(arch, num_classes=8, dtype=jnp.float32),
        label_smoothing=0.1,
        num_classes=8,
    )
    params, mstate = task.init(jax.random.key(0), image_shape=(16, 16, 3))
    tx = opt.sgd(opt.lr_cosine_policy(0.1, 0, 2, steps_per_epoch=2), weight_decay=1e-4,
                 params_for_mask=params)
    state = create_train_state(params, tx, jax.random.key(1), mstate, ema=True)
    step = make_train_step(task.loss_fn, tx, accum_steps=1, ema_decay=0.99)

    losses = []
    for i in range(STEPS):
        rng = np.random.default_rng(100 + i)
        batch = {
            "image": rng.normal(size=(GLOBAL_BATCH, 16, 16, 3)).astype(np.float32),
            "label": rng.integers(0, 8, size=(GLOBAL_BATCH,)).astype(np.int32),
        }
        if multihost:
            import jax as _jax

            per = GLOBAL_BATCH // _jax.process_count()
            lo = _jax.process_index() * per
            local = {k: v[lo : lo + per] for k, v in batch.items()}
            dev_batch = shard_batch_local(mesh, local)
        else:
            dev_batch = shard_batch(mesh, batch)
        state, metrics = step(state, dev_batch)
        losses.append(float(metrics["loss"]))

    digest = float(
        jax.jit(
            lambda p: sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(p))
        )(state.params)
    )
    return losses, digest


if __name__ == "__main__":
    pid, nproc, port, mode = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        sys.argv[3],
        sys.argv[4],
    )

    import jax

    # Force CPU in-process: the axon site hook freezes env-var platform choice.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    jax.config.update("jax_threefry_partitionable", True)

    from deeplearningexamples_tpu.parallel.dist import initialize_distributed

    if mode == "slurm":
        # Exercise the SLURM autodetect branch for real: nodelist parsing
        # picks the head node ("localhost"), SLURM_PROCID supplies the rank.
        os.environ["SLURM_JOB_NUM_NODES"] = str(nproc)
        os.environ["SLURM_STEP_NODELIST"] = "localhost"
        os.environ["SLURM_PROCID"] = str(pid)
        # a freshly-bound free port from the parent, so parallel CI jobs (or
        # a coordinator socket in TIME_WAIT) can't collide on the default
        os.environ["COORDINATOR_PORT"] = str(port)
        info = initialize_distributed()
    else:
        info = initialize_distributed(
            coordinator=f"localhost:{port}", num_processes=nproc, process_id=pid
        )

    losses, digest = run_steps(multihost=True)
    print(
        json.dumps(
            {
                "pid": pid,
                "process_count": info["process_count"],
                "device_count": info["device_count"],
                "losses": losses,
                "param_digest": digest,
            }
        ),
        flush=True,
    )
