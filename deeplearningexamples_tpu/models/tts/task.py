"""TTS training tasks — the unified two-model trainer.

Reference: one harness trains both models selected by ``--model-name``
(``Tacotron2/train.py:345-566``, ``models.py:get_model``); losses
``Tacotron2Loss`` (``tacotron2/loss_function.py:30-45``) and ``WaveGlowLoss``
(``waveglow/loss_function.py:30-48``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from .tacotron2 import Tacotron2, Tacotron2Config, tacotron2_loss
from .waveglow import WaveGlow, WaveGlowConfig, waveglow_loss

__all__ = ["Tacotron2Task", "WaveGlowTask"]


@dataclass
class Tacotron2Task:
    cfg: Tacotron2Config = Tacotron2Config()
    dtype: Any = jnp.bfloat16

    def __post_init__(self):
        self.model = Tacotron2(self.cfg, self.dtype)

    def init(self, rng, text_len=32, mel_len=64, batch=2):
        init_rng, drop_rng = jax.random.split(rng)
        variables = self.model.init(
            {"params": init_rng, "dropout": drop_rng},
            jnp.zeros((batch, text_len), jnp.int32),
            jnp.full((batch,), text_len, jnp.int32),
            jnp.zeros((batch, mel_len, self.cfg.n_mel_channels)),
            jnp.full((batch,), mel_len, jnp.int32),
        )
        params = variables["params"]
        model_state = {k: v for k, v in variables.items() if k != "params"}
        return params, model_state

    def loss_fn(self, params, model_state, batch, rng):
        (mel, mel_post, gates, _), mutated = self.model.apply(
            {"params": params, **model_state},
            batch["text"], batch["text_lengths"],
            batch["mel"], batch["mel_lengths"],
            deterministic=False,
            rngs={"dropout": rng},
            mutable=list(model_state.keys()) or False,
        )
        if not model_state:
            mutated = {}
        # gate target: 1 at and after the last valid frame
        t = batch["mel"].shape[1]
        gate_target = (
            jnp.arange(t)[None, :] >= (batch["mel_lengths"][:, None] - 1)
        ).astype(jnp.float32)
        loss = tacotron2_loss(mel, mel_post, gates, batch["mel"], gate_target)
        return loss, (dict(mutated), {})

    def infer_fn(self, params, model_state, text, text_lengths, max_steps=None, rng=None):
        return self.model.apply(
            {"params": params, **model_state}, text, text_lengths, max_steps,
            method=self.model.infer,
            rngs={"dropout": rng if rng is not None else jax.random.key(0)},
        )


@dataclass
class WaveGlowTask:
    cfg: WaveGlowConfig = WaveGlowConfig()
    dtype: Any = jnp.bfloat16
    sigma: float = 1.0

    def __post_init__(self):
        self.model = WaveGlow(self.cfg, self.dtype)

    def init(self, rng, batch=1):
        t_mel = self.cfg.segment_length // self.cfg.hop_length + 1
        variables = self.model.init(
            rng,
            jnp.zeros((batch, self.cfg.segment_length)),
            jnp.zeros((batch, t_mel, self.cfg.n_mel_channels)),
        )
        return variables["params"], {}

    def loss_fn(self, params, model_state, batch, rng):
        z, log_s, log_det = self.model.apply(
            {"params": params}, batch["audio"], batch["mel"]
        )
        loss = waveglow_loss(z, log_s, log_det, self.sigma)
        return loss, (model_state, {})

    def infer_fn(self, params, mel, sigma=0.9, rng=None):
        return self.model.apply(
            {"params": params}, mel, sigma,
            rng if rng is not None else jax.random.key(0),
            method=self.model.infer,
        )
