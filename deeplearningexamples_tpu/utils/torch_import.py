"""Import reference/zoo PyTorch checkpoints into this framework's params.

The reference publishes NGC checkpoints consumed through TorchHub key
remapping (``image_classification/models/model.py:100-150``) and saves
training state as ``.pth.tar`` dicts (SURVEY.md §5.4). This module reads
those files (via CPU torch, which is part of the image) and remaps them onto
our flax parameter trees — the weight-level parity bridge the build plan
calls for (SURVEY.md §7.2 item 7).

Converters:
- ``convert_resnet50``: torchvision/NVIDIA ConvNets layout -> models/convnets
- ``convert_bert``: HuggingFace/NVIDIA BERT layout -> models/bert (qkv fused,
  vocab padded to the lane multiple)
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

__all__ = ["load_torch_state_dict", "convert_resnet50", "convert_bert"]


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Read a torch checkpoint file to numpy. Accepts raw state_dicts and the
    reference's ``{"state_dict": ...}`` .pth.tar wrapper, stripping DDP
    ``module.`` prefixes."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        if hasattr(v, "numpy"):
            out[k.removeprefix("module.")] = v.detach().cpu().numpy()
    return out


def _conv(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _dense(w: np.ndarray) -> np.ndarray:
    """torch (out, in) -> flax (in, out)."""
    return np.transpose(w)


def _bn(sd: Mapping[str, np.ndarray], prefix: str) -> tuple[dict, dict]:
    params = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    stats = {"mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]}
    return params, stats


def convert_resnet50(sd: Mapping[str, np.ndarray]) -> tuple[dict, dict]:
    """torchvision/reference resnet50 state_dict -> (params, batch_stats)."""
    params: dict = {}
    stats: dict = {}

    def put_bn(name, prefix):
        p, s = _bn(sd, prefix)
        params.setdefault(name[0], {})[name[1]] = p
        stats.setdefault(name[0], {})[name[1]] = s

    params["conv1"] = {"kernel": _conv(sd["conv1.weight"])}
    p, s = _bn(sd, "bn1")
    params["bn1"], stats["bn1"] = p, s
    layers = [3, 4, 6, 3]
    for li, n in enumerate(layers):
        for bi in range(n):
            src = f"layer{li + 1}.{bi}"
            dst = f"layer{li + 1}_{bi}"
            blk_p: dict = {}
            blk_s: dict = {}
            for ci in (1, 2, 3):
                blk_p[f"conv{ci}"] = {"kernel": _conv(sd[f"{src}.conv{ci}.weight"])}
                bp, bs = _bn(sd, f"{src}.bn{ci}")
                blk_p[f"bn{ci}"], blk_s[f"bn{ci}"] = bp, bs
            if f"{src}.downsample.0.weight" in sd:
                blk_p["downsample_conv"] = {
                    "kernel": _conv(sd[f"{src}.downsample.0.weight"])
                }
                bp, bs = _bn(sd, f"{src}.downsample.1")
                blk_p["downsample_bn"], blk_s["downsample_bn"] = bp, bs
            params[dst], stats[dst] = blk_p, blk_s
    params["fc"] = {"kernel": _dense(sd["fc.weight"]), "bias": sd["fc.bias"]}
    return params, stats


def convert_bert(
    sd: Mapping[str, np.ndarray], padded_vocab: int, num_layers: int
) -> dict:
    """HuggingFace/NVIDIA BERT encoder state_dict -> models/bert params for
    ``BertModel`` (the ``bert`` subtree). Prefixes ``bert.`` are stripped."""
    sd = {k.removeprefix("bert."): v for k, v in sd.items()}

    def pad_vocab(w):
        out = np.zeros((padded_vocab, w.shape[1]), w.dtype)
        out[: w.shape[0]] = w
        return out

    params: dict = {
        "embeddings": {
            "word_embeddings": {
                "embedding": pad_vocab(sd["embeddings.word_embeddings.weight"])
            },
            "position_embeddings": {
                "embedding": sd["embeddings.position_embeddings.weight"]
            },
            "token_type_embeddings": {
                "embedding": sd["embeddings.token_type_embeddings.weight"]
            },
            "LayerNorm": {
                "scale": sd["embeddings.LayerNorm.weight"],
                "bias": sd["embeddings.LayerNorm.bias"],
            },
        },
        "pooler": {
            "kernel": _dense(sd["pooler.dense.weight"]),
            "bias": sd["pooler.dense.bias"],
        },
    }
    for i in range(num_layers):
        src = f"encoder.layer.{i}"
        qkv_w = np.concatenate(
            [
                _dense(sd[f"{src}.attention.self.{n}.weight"])
                for n in ("query", "key", "value")
            ],
            axis=1,
        )
        qkv_b = np.concatenate(
            [sd[f"{src}.attention.self.{n}.bias"] for n in ("query", "key", "value")]
        )
        params[f"layer_{i}"] = {
            "attention": {
                "qkv": {"kernel": qkv_w, "bias": qkv_b},
                "output": {
                    "kernel": _dense(sd[f"{src}.attention.output.dense.weight"]),
                    "bias": sd[f"{src}.attention.output.dense.bias"],
                },
            },
            "attention_ln": {
                "scale": sd[f"{src}.attention.output.LayerNorm.weight"],
                "bias": sd[f"{src}.attention.output.LayerNorm.bias"],
            },
            "intermediate": {
                "kernel": _dense(sd[f"{src}.intermediate.dense.weight"]),
                "bias": sd[f"{src}.intermediate.dense.bias"],
            },
            "ffn_output": {
                "kernel": _dense(sd[f"{src}.output.dense.weight"]),
                "bias": sd[f"{src}.output.dense.bias"],
            },
            "output_ln": {
                "scale": sd[f"{src}.output.LayerNorm.weight"],
                "bias": sd[f"{src}.output.LayerNorm.bias"],
            },
        }
    return params
