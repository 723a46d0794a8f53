"""Model repository export/load — the deployment-toolkit analogue.

Reference: the versioned ``triton/deployment_toolkit`` (``core.py:32-180``
``BaseLoader/BaseSaver/BaseRunner/BaseConverter`` + format/precision enums)
converts checkpoints into Triton model repositories with a ``config.pbtxt``.
Here a "model repository" is a directory per model::

    <repo>/<name>/config.json     # inputs/outputs spec, batch buckets, dtype
    <repo>/<name>/weights/        # orbax checkpoint of inference params

``save_model_repository`` writes it from live params; ``load_model_repository``
restores params and the spec so a server process can register the endpoint
without importing training code.
"""

from __future__ import annotations

import json
import os
from typing import Any, Mapping

import jax
import numpy as np
import orbax.checkpoint as ocp

__all__ = ["save_model_repository", "load_model_repository"]


def save_model_repository(
    repo_dir: str,
    name: str,
    params: Any,
    input_spec: Mapping[str, tuple],  # name -> (shape-without-batch, dtype str)
    output_names: tuple = (),
    batch_buckets: tuple = (1, 2, 4, 8, 16, 32),
    precision: str = "bf16",
    metadata: Mapping[str, Any] | None = None,
) -> str:
    model_dir = os.path.join(os.path.abspath(repo_dir), name)
    os.makedirs(model_dir, exist_ok=True)
    config = {
        "name": name,
        "inputs": {k: {"shape": list(s), "dtype": d} for k, (s, d) in input_spec.items()},
        "outputs": list(output_names),
        "batch_buckets": list(batch_buckets),
        "precision": precision,
        "metadata": dict(metadata or {}),
    }
    with open(os.path.join(model_dir, "config.json"), "w") as f:
        json.dump(config, f, indent=2)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(model_dir, "weights"), params, force=True)
    ckptr.wait_until_finished()
    return model_dir


def load_model_repository(repo_dir: str, name: str, params_template: Any = None):
    """Returns (params, config). ``params_template`` (a pytree of
    ShapeDtypeStructs or arrays) enables sharded/typed restore; without it
    the checkpoint restores with saved metadata."""
    model_dir = os.path.join(os.path.abspath(repo_dir), name)
    with open(os.path.join(model_dir, "config.json")) as f:
        config = json.load(f)
    ckptr = ocp.StandardCheckpointer()
    path = os.path.join(model_dir, "weights")
    if params_template is not None:
        params = ckptr.restore(path, params_template)
    else:
        params = ckptr.restore(path)
    return params, config
