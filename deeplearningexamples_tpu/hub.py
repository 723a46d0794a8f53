"""Model zoo entry points (the TorchHub API analogue).

The reference exposes its models through a repo-root ``hubconf.py:1-31``
(``nvidia_resnet50``, ``nvidia_ssd``, ``nvidia_tacotron2``, ``nvidia_waveglow``
etc., with NGC checkpoint remapping in ``models/model.py:62-151``). Here the
same surface is a plain registry: each entry builds the flax model and can
initialize params, restore them from a model repository
(``serving/export.py``), or import a reference torch checkpoint
(``utils/torch_import.py``).

    >>> from deeplearningexamples_tpu import hub
    >>> model, params = hub.load("resnet50", pretrained="/path/to/model.pth.tar")
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

__all__ = ["list_models", "create", "load"]

_REGISTRY: dict[str, Callable[..., Any]] = {}


def list_models() -> list[str]:
    return sorted(_REGISTRY)


def create(name: str, **kwargs):
    """Build the model object (no params)."""
    if name not in _REGISTRY:
        raise KeyError(f"unknown model {name!r}; available: {list_models()}")
    return _REGISTRY[name](**kwargs)


def load(name: str, pretrained: str | None = None, seed: int = 0, **kwargs):
    """Build model + params. ``pretrained`` may be a torch checkpoint path
    (``.pt``/``.pth``/``.pth.tar``) or a model-repository directory."""
    model = create(name, **kwargs)
    init = _INIT[name]
    variables = init(model, jax.random.key(seed))
    if pretrained is None:
        return model, variables
    if pretrained.endswith((".pt", ".pth", ".pth.tar")):
        conv = _TORCH_CONVERTERS.get(name)
        if conv is None:
            raise NotImplementedError(f"no torch converter for {name}")
        return model, conv(model, pretrained)
    from .serving.export import load_model_repository
    import os

    repo, model_name = os.path.split(pretrained.rstrip("/"))
    params, _ = load_model_repository(repo, model_name)
    return model, params


# -- entries -----------------------------------------------------------------


def _make_convnet_entry(arch):
    def entry(num_classes: int = 1000, dtype=jnp.bfloat16):
        from .models.convnets import build_model

        return build_model(arch, num_classes, dtype)

    return entry


for _arch in ("resnet50", "resnext101-32x4d", "se-resnext101-32x4d",
              "efficientnet-b0", "efficientnet-b4",
              "efficientnet-widese-b0", "efficientnet-widese-b4",
              "gpunet-0", "gpunet-1", "gpunet-2"):
    _REGISTRY[_arch] = _make_convnet_entry(_arch)


def _ssd_entry(num_classes: int = 81, dtype=jnp.bfloat16):
    from .models.ssd import SSD300

    return SSD300(num_classes, dtype)


def _bert_entry(size: str = "large", dtype=jnp.bfloat16):
    from .models.bert import BERT_CONFIGS, BertModel

    return BertModel(BERT_CONFIGS[size], dtype)


def _tacotron2_entry(dtype=jnp.bfloat16):
    from .models.tts import Tacotron2

    return Tacotron2(dtype=dtype)


def _waveglow_entry(dtype=jnp.bfloat16):
    from .models.tts import WaveGlow

    return WaveGlow(dtype=dtype)


def _dlrm_entry(categorical_cardinalities=None, dtype=jnp.bfloat16):
    from .models.dlrm import Dlrm, DlrmConfig

    cards = tuple(categorical_cardinalities or [100_000] * 26)
    return Dlrm(DlrmConfig(categorical_cardinalities=cards), dtype)


def _transformer_entry(dtype=jnp.bfloat16):
    from .models.translation import Transformer

    return Transformer(dtype=dtype)


def _ncf_entry(dtype=jnp.bfloat16):
    from .models.ncf import NcfConfig, NeuMF

    return NeuMF(NcfConfig(), dtype)


def _efficientdet_entry(dtype=jnp.bfloat16):
    from .models.efficientdet import EfficientDet, EfficientDetConfig

    return EfficientDet(EfficientDetConfig(), dtype)


def _maskrcnn_entry(dtype=jnp.bfloat16):
    from .models.maskrcnn import MaskRCNN, MaskRCNNConfig

    return MaskRCNN(MaskRCNNConfig(image_size=256), dtype)


def _moflow_entry(dtype=jnp.float32):
    from .models.moflow import MoFlow, ZINC250K_CONFIG

    return MoFlow(ZINC250K_CONFIG)


def _se3_entry(dtype=jnp.float32):
    from .models.se3_transformer import SE3Config, SE3Transformer

    return SE3Transformer(SE3Config())


def _fastpitch_entry(cfg=None, dtype=jnp.bfloat16):
    """Reference ``hubconf.py:29`` (``nvidia_fastpitch``)."""
    from .models.tts import FastPitch, FastPitchConfig

    return FastPitch(cfg or FastPitchConfig(), dtype)


def _hifigan_entry(cfg=None, dtype=jnp.bfloat16):
    """Reference ``hubconf.py:31`` (``nvidia_hifigan`` — the generator;
    inference deployments never ship the discriminators)."""
    from .models.tts import HiFiGanConfig, HiFiGanGenerator

    return HiFiGanGenerator(cfg or HiFiGanConfig(), dtype)


def _tft_entry(cfg=None, dtype=jnp.float32):
    """Reference ``hubconf.py:34`` (``nvidia_tft``)."""
    from .models.tft import TFT, TFTConfig

    return TFT(cfg or TFTConfig(), dtype)


_REGISTRY.update(
    ssd300=_ssd_entry, bert=_bert_entry, tacotron2=_tacotron2_entry,
    waveglow=_waveglow_entry, dlrm=_dlrm_entry,
    transformer=_transformer_entry, ncf=_ncf_entry,
    efficientdet=_efficientdet_entry, maskrcnn=_maskrcnn_entry,
    moflow=_moflow_entry, se3_transformer=_se3_entry,
    fastpitch=_fastpitch_entry, hifigan=_hifigan_entry, tft=_tft_entry,
)


# -- init fns ----------------------------------------------------------------


def _img_init(size):
    def init(model, rng):
        return model.init(
            {"params": rng, "dropout": jax.random.key(1)},
            jnp.zeros((1, size, size, 3)), train=False,
        )

    return init


def _bert_init(model, rng):
    ids = jnp.zeros((1, 16), jnp.int32)
    return model.init(rng, ids, ids, ids, deterministic=True)


def _taco_init(model, rng):
    return model.init(
        {"params": rng, "dropout": jax.random.key(1)},
        jnp.zeros((1, 16), jnp.int32), jnp.full((1,), 16, jnp.int32),
        jnp.zeros((1, 20, 80)), jnp.full((1,), 20, jnp.int32),
    )


def _wg_init(model, rng):
    t_mel = model.cfg.segment_length // model.cfg.hop_length + 1
    return model.init(
        rng, jnp.zeros((1, model.cfg.segment_length)),
        jnp.zeros((1, t_mel, model.cfg.n_mel_channels)),
    )


def _transformer_init(model, rng):
    ids = jnp.full((1, 8), model.cfg.pad_id, jnp.int32)
    return model.init({"params": rng, "dropout": jax.random.key(1)}, ids, ids)


def _ncf_init(model, rng):
    u = jnp.zeros((1,), jnp.int32)
    return model.init({"params": rng, "dropout": jax.random.key(1)}, u, u)


def _dlrm_init(model, rng):
    cfg = model.cfg
    return model.init(
        rng, jnp.zeros((1, cfg.num_numerical)),
        jnp.zeros((1, len(cfg.categorical_cardinalities)), jnp.int32),
    )


def _effdet_init(model, rng):
    s = model.cfg.image_size
    return model.init(
        {"params": rng, "dropout": jax.random.key(1)},
        jnp.zeros((1, s, s, 3)), train=False,
    )


def _maskrcnn_init(model, rng):
    s = model.cfg.image_size
    return model.init(rng, jnp.zeros((1, s, s, 3)), train=False)


def _moflow_init(model, rng):
    cfg = model.cfg
    return model.init(
        rng, jnp.zeros((1, cfg.n_bond_types, cfg.n_node, cfg.n_node)),
        jnp.zeros((1, cfg.n_node, cfg.n_atom_types)), train=False,
    )


def _se3_init(model, rng):
    cfg = model.cfg
    return model.init(
        rng, jnp.zeros((1, 8, 3)),
        jnp.zeros((1, 8, cfg.node_feature_dim)), jnp.ones((1, 8)),
    )


def _fastpitch_init(model, rng):
    text = jnp.ones((1, 16), jnp.int32)
    return model.init(
        {"params": rng, "dropout": jax.random.key(1)},
        text, text, jnp.zeros((1, 16)), max_mel_len=32,
    )


def _hifigan_init(model, rng):
    return model.init(rng, jnp.zeros((1, 32, model.cfg.n_mels)))


def _tft_init(model, rng):
    cfg = model.cfg
    x = {
        "s_cat": jnp.zeros((1, cfg.num_static_vars), jnp.int32),
        "k_cont": jnp.zeros((1, cfg.example_length, cfg.n_known)),
        "target": jnp.zeros((1, cfg.encoder_len, 1)),
    }
    if cfg.n_observed_cont:
        x["o_cont"] = jnp.zeros((1, cfg.encoder_len, cfg.n_observed_cont))
    return model.init({"params": rng, "dropout": jax.random.key(1)}, x)


_INIT: dict[str, Callable] = {
    **{a: _img_init(380 if "b4" in a else 224) for a in (
        "resnet50", "resnext101-32x4d", "se-resnext101-32x4d",
        "efficientnet-b0", "efficientnet-b4",
        "efficientnet-widese-b0", "efficientnet-widese-b4")},
    "gpunet-0": _img_init(320), "gpunet-1": _img_init(288),
    "gpunet-2": _img_init(384),
    "ssd300": _img_init(300),
    "bert": _bert_init,
    "tacotron2": _taco_init,
    "waveglow": _wg_init,
    "dlrm": _dlrm_init,
    "transformer": _transformer_init,
    "ncf": _ncf_init,
    "efficientdet": _effdet_init,
    "maskrcnn": _maskrcnn_init,
    "moflow": _moflow_init,
    "se3_transformer": _se3_init,
    "fastpitch": _fastpitch_init,
    "hifigan": _hifigan_init,
    "tft": _tft_init,
}


# -- torch converters --------------------------------------------------------


def _convert_resnet50(model, path):
    from .utils.torch_import import convert_resnet50, load_torch_state_dict

    params, stats = convert_resnet50(load_torch_state_dict(path))
    return {"params": params, "batch_stats": stats}


def _convert_bert(model, path):
    from .utils.torch_import import convert_bert, load_torch_state_dict

    params = convert_bert(
        load_torch_state_dict(path), model.cfg.padded_vocab, model.cfg.num_layers
    )
    return {"params": params}


def _make_gpunet_converter(arch_name):
    def conv(model, path):
        from .models.convnets import GPUNET_ARCHS
        from .utils.torch_import import convert_gpunet, load_torch_state_dict

        params, stats = convert_gpunet(load_torch_state_dict(path),
                                       GPUNET_ARCHS[arch_name])
        return {"params": params, "batch_stats": stats}

    return conv


def _convert_fastpitch(model, path):
    from .utils.torch_import import convert_fastpitch, load_torch_state_dict

    cfg = model.cfg
    params = convert_fastpitch(
        load_torch_state_dict(path), cfg.encoder_layers, cfg.decoder_layers,
        n_pred_layers=cfg.predictor_layers, energy=cfg.energy)
    return {"params": params}


def _convert_hifigan(model, path):
    from .utils.torch_import import (
        convert_hifigan_generator, load_torch_state_dict,
    )

    cfg = model.cfg
    params = convert_hifigan_generator(
        load_torch_state_dict(path), len(cfg.upsample_rates),
        len(cfg.resblock_kernels), len(cfg.resblock_dilations[0]))
    return {"params": params}


def _convert_tft(model, path):
    from .utils.torch_import import convert_tft, load_torch_state_dict

    cfg = model.cfg
    params = convert_tft(load_torch_state_dict(path), cfg.num_static_vars,
                         cfg.num_historic_vars, cfg.num_future_vars)
    return {"params": params}


_TORCH_CONVERTERS: dict[str, Callable] = {
    "resnet50": _convert_resnet50,
    "bert": _convert_bert,
    **{a: _make_gpunet_converter(a)
       for a in ("gpunet-0", "gpunet-1", "gpunet-2")},
    "fastpitch": _convert_fastpitch,
    "hifigan": _convert_hifigan,
    "tft": _convert_tft,
}
