"""Unified sharded checkpoint manager.

The reference ships five distinct checkpoint formats (SURVEY.md §5.4):
monolithic ``.pth.tar`` dicts (ConvNets ``utils.py:54-80``), step-indexed
``ckpt_{step}.pt`` with scaler state (BERT ``run_pretraining.py:497-504``),
RNG-complete (Tacotron2 ``train.py:185-226``), sharded directories (DLRM
``utils/checkpointing/distributed.py``), and weights-only hub checkpoints.

Here there is exactly one: an orbax-backed sharded checkpoint of the whole
``TrainState`` pytree, which covers all five cases structurally —
- step metadata is the checkpoint key,
- no scaler state exists (bf16),
- the PRNG key is part of ``TrainState`` so every checkpoint is RNG-complete,
- sharded arrays (DLRM tables) save/restore shard-wise natively,
- keep-last-N + best tracking mirror ``Checkpointer`` (``utils.py:39-80``).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager"]


class CheckpointManager:
    """Keep-last-N checkpoints with best-metric tracking.

    ``save(step, state, metric=...)`` / ``restore(state_template)``.
    """

    def __init__(
        self,
        directory: str,
        keep: int = 3,
        best_mode: str = "max",
    ):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.best_mode = best_mode
        options = ocp.CheckpointManagerOptions(
            max_to_keep=keep,
            best_fn=(lambda m: m.get("metric", -np.inf)) if best_mode else None,
            best_mode=best_mode,
            keep_checkpoints_without_metrics=True,
            enable_async_checkpointing=False,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any, metric: float | None = None) -> None:
        metrics = {"metric": float(metric)} if metric is not None else None
        self._mgr.save(
            int(step), args=ocp.args.StandardSave(state), metrics=metrics
        )
        self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def best_step(self) -> int | None:
        return self._mgr.best_step()

    def restore(self, state_template: Any, step: int | None = None) -> Any:
        """Restore into the structure/shardings of ``state_template``."""
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self._mgr.restore(
            int(step), args=ocp.args.StandardRestore(state_template)
        )

    def close(self) -> None:
        self._mgr.close()
