"""Import reference/zoo PyTorch checkpoints into this framework's params.

The reference publishes NGC checkpoints consumed through TorchHub key
remapping (``image_classification/models/model.py:100-150``) and saves
training state as ``.pth.tar`` dicts (SURVEY.md §5.4). This module reads
those files (via CPU torch, which is part of the image) and remaps them onto
our flax parameter trees — the weight-level parity bridge the build plan
calls for (SURVEY.md §7.2 item 7).

Converters:
- ``convert_resnet50``: torchvision/NVIDIA ConvNets layout -> models/convnets
- ``convert_bert``: HuggingFace/NVIDIA BERT layout -> models/bert (separate q/k/v,
  vocab padded to the lane multiple)
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

import numpy as np

__all__ = [
    "load_torch_state_dict",
    "convert_resnet50",
    "convert_bert",
    "convert_bert_tf",
    "load_bert_encoder",
    "convert_ssd300",
    "convert_tacotron2",
    "convert_waveglow",
    "convert_dlrm",
    "convert_ncf",
    "convert_gnmt",
    "convert_tft",
    "convert_jasper",
    "convert_hifigan_generator",
    "convert_fastpitch",
    "convert_efficientnet",
    "convert_gpunet",
    "convert_maskrcnn_heads",
    "convert_moflow",
    "convert_brats_unet3d",
    "convert_efficientdet_d0",
    "convert_transformer_xl",
    "convert_wav2vec2",
    "convert_bart",
    "convert_nmt_transformer",
]


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


def load_bert_encoder(path: str, padded_vocab: int, num_layers: int) -> dict:
    """Dispatch a BERT encoder import by checkpoint format: a TF v1 bundle
    (``x.ckpt`` with an ``x.ckpt.index`` sibling — the NGC/Google format)
    goes through ``convert_bert_tf``; anything else is read as a torch
    pickle via ``load_torch_state_dict`` + ``convert_bert``."""
    import os

    if os.path.exists(path + ".index"):
        return convert_bert_tf(path, padded_vocab, num_layers)
    return convert_bert(load_torch_state_dict(path), padded_vocab, num_layers)


def convert_bert_tf(ckpt_path: str, padded_vocab: int, num_layers: int) -> dict:
    """TF v1 BERT checkpoint (the format NGC/Google checkpoints ship in) ->
    models/bert params. The role of the reference's
    ``load_tf_weights_in_bert`` (``LanguageModeling/BERT/modeling.py:61``),
    except TF kernels are already (in, out) — flax layout — so no transposes.
    LayerNorm gamma/beta map to scale/bias; q/k/v import as separate denses."""
    from tensorflow.python.training import py_checkpoint_reader

    reader = py_checkpoint_reader.NewCheckpointReader(ckpt_path)
    g = reader.get_tensor

    def pad_vocab(w):
        out = np.zeros((padded_vocab, w.shape[1]), w.dtype)
        out[: w.shape[0]] = w
        return out

    params: dict = {
        "embeddings": {
            "word_embeddings": {
                "embedding": pad_vocab(g("bert/embeddings/word_embeddings"))
            },
            "position_embeddings": {
                "embedding": g("bert/embeddings/position_embeddings")
            },
            "token_type_embeddings": {
                "embedding": g("bert/embeddings/token_type_embeddings")
            },
            "LayerNorm": {
                "scale": g("bert/embeddings/LayerNorm/gamma"),
                "bias": g("bert/embeddings/LayerNorm/beta"),
            },
        },
        "pooler": {
            "kernel": g("bert/pooler/dense/kernel"),
            "bias": g("bert/pooler/dense/bias"),
        },
    }
    for i in range(num_layers):
        src = f"bert/encoder/layer_{i}"
        params[f"layer_{i}"] = {
            "attention": {
                **{
                    n: {
                        "kernel": g(f"{src}/attention/self/{n}/kernel"),
                        "bias": g(f"{src}/attention/self/{n}/bias"),
                    }
                    for n in ("query", "key", "value")
                },
                "output": {
                    "kernel": g(f"{src}/attention/output/dense/kernel"),
                    "bias": g(f"{src}/attention/output/dense/bias"),
                },
            },
            "attention_ln": {
                "scale": g(f"{src}/attention/output/LayerNorm/gamma"),
                "bias": g(f"{src}/attention/output/LayerNorm/beta"),
            },
            "intermediate": {
                "kernel": g(f"{src}/intermediate/dense/kernel"),
                "bias": g(f"{src}/intermediate/dense/bias"),
            },
            "ffn_output": {
                "kernel": g(f"{src}/output/dense/kernel"),
                "bias": g(f"{src}/output/dense/bias"),
            },
            "output_ln": {
                "scale": g(f"{src}/output/LayerNorm/gamma"),
                "bias": g(f"{src}/output/LayerNorm/beta"),
            },
        }
    return params


def _conv1d(w: np.ndarray) -> np.ndarray:
    """torch Conv1d (out, in, k) -> flax (k, in, out)."""
    return np.transpose(w, (2, 1, 0))


def _wn_fold(sd: Mapping[str, np.ndarray], prefix: str) -> np.ndarray:
    """Fold torch ``weight_norm`` (weight_g, weight_v) into an effective
    Conv1d weight: w = g * v / ||v||, norm over (in, k) per output channel.
    Checkpoints saved after ``remove_weight_norm`` (the reference's inference
    export path) carry a plain ``.weight`` instead — pass it through."""
    if f"{prefix}.weight_g" not in sd:
        return sd[f"{prefix}.weight"]
    g = sd[f"{prefix}.weight_g"]
    v = sd[f"{prefix}.weight_v"]
    norm = np.sqrt((v * v).sum(axis=(1, 2), keepdims=True))
    return g * v / norm


def _lstm(
    sd: Mapping[str, np.ndarray], prefix: str, suffix: str = ""
) -> dict:
    """torch LSTM/LSTMCell params -> flax ``OptimizedLSTMCell`` tree.

    torch packs gates as rows [i, f, g, o] of ``weight_ih``/``weight_hh``
    and carries two bias vectors (summed here); flax keeps one Dense per
    gate: ``ii/if/ig/io`` (input, no bias) + ``hi/hf/hg/ho`` (hidden, bias).
    """
    w_ih = sd[f"{prefix}.weight_ih{suffix}"]
    w_hh = sd[f"{prefix}.weight_hh{suffix}"]
    b = sd[f"{prefix}.bias_ih{suffix}"] + sd[f"{prefix}.bias_hh{suffix}"]
    h = w_hh.shape[1]
    out = {}
    for gi, gate in enumerate("ifgo"):
        sl = slice(gi * h, (gi + 1) * h)
        out[f"i{gate}"] = {"kernel": _dense(w_ih[sl])}
        out[f"h{gate}"] = {"kernel": _dense(w_hh[sl]), "bias": b[sl]}
    return out


def convert_ssd300(
    sd: Mapping[str, np.ndarray], num_classes: int = 81
) -> tuple[dict, dict]:
    """Reference SSD300 state_dict (``ssd/model.py:55-129``) ->
    (params, batch_stats) for ``models/ssd/SSD300``.

    The loc/conf heads need an output-channel permutation: the reference's
    ``bbox_view`` reshape (:106-113) reads conv channels coordinate-major
    (coord*num_anchors + anchor) while our NHWC reshape reads them
    anchor-major (anchor*width + coord).
    """
    params: dict = {}
    stats: dict = {}

    def bn(dst_p: dict, dst_s: dict, name: str, prefix: str):
        p, s = _bn(sd, prefix)
        dst_p[name], dst_s[name] = p, s

    # backbone: feature_extractor.feature_extractor.{0=conv1,1=bn1,4..6=layer1..3}
    bb_p: dict = {}
    bb_s: dict = {}
    fe = "feature_extractor.feature_extractor"
    bb_p["conv1"] = {"kernel": _conv(sd[f"{fe}.0.weight"])}
    bn(bb_p, bb_s, "bn1", f"{fe}.1")
    for li, (slot, n_blocks) in enumerate(zip((4, 5, 6), (3, 4, 6))):
        for bi in range(n_blocks):
            src = f"{fe}.{slot}.{bi}"
            blk_p: dict = {}
            blk_s: dict = {}
            for ci in (1, 2, 3):
                blk_p[f"conv{ci}"] = {"kernel": _conv(sd[f"{src}.conv{ci}.weight"])}
                bn(blk_p, blk_s, f"bn{ci}", f"{src}.bn{ci}")
            if f"{src}.downsample.0.weight" in sd:
                blk_p["downsample_conv"] = {
                    "kernel": _conv(sd[f"{src}.downsample.0.weight"])
                }
                bn(blk_p, blk_s, "downsample_bn", f"{src}.downsample.1")
            bb_p[f"layer{li + 1}_{bi}"] = blk_p
            bb_s[f"layer{li + 1}_{bi}"] = blk_s
    params["backbone"], stats["backbone"] = bb_p, bb_s

    # extra feature blocks: additional_blocks.{i}.{0=conv1x1,1=bn,3=conv3x3,4=bn}
    for i in range(5):
        src = f"additional_blocks.{i}"
        params[f"extra{i}_conv1"] = {"kernel": _conv(sd[f"{src}.0.weight"])}
        p, s = _bn(sd, f"{src}.1")
        params[f"extra{i}_bn1"], stats[f"extra{i}_bn1"] = p, s
        params[f"extra{i}_conv2"] = {"kernel": _conv(sd[f"{src}.3.weight"])}
        p, s = _bn(sd, f"{src}.4")
        params[f"extra{i}_bn2"], stats[f"extra{i}_bn2"] = p, s

    # heads with channel permutation
    anchors = (4, 6, 6, 6, 4, 4)
    for i, na in enumerate(anchors):
        loc_perm = np.array(
            [k * na + a for a in range(na) for k in range(4)]
        )
        conf_perm = np.array(
            [c * na + a for a in range(na) for c in range(num_classes)]
        )
        params[f"loc{i}"] = {
            "kernel": _conv(sd[f"loc.{i}.weight"])[..., loc_perm],
            "bias": sd[f"loc.{i}.bias"][loc_perm],
        }
        params[f"conf{i}"] = {
            "kernel": _conv(sd[f"conf.{i}.weight"])[..., conf_perm],
            "bias": sd[f"conf.{i}.bias"][conf_perm],
        }
    return params, stats


def convert_tacotron2(sd: Mapping[str, np.ndarray]) -> tuple[dict, dict]:
    """Reference Tacotron2 state_dict (``tacotron2/model.py:598-691``) ->
    (params, batch_stats) for ``models/tts/Tacotron2``."""
    params: dict = {}
    stats: dict = {}

    enc_p: dict = {"embedding": {"embedding": sd["embedding.weight"]}}
    enc_s: dict = {}
    for i in range(3):
        src = f"encoder.convolutions.{i}"
        enc_p[f"conv{i}"] = {
            "kernel": _conv1d(sd[f"{src}.0.conv.weight"]),
            "bias": sd[f"{src}.0.conv.bias"],
        }
        p, s = _bn(sd, f"{src}.1")
        enc_p[f"bn{i}"], enc_s[f"bn{i}"] = p, s
    # the RNN cells are Encoder-scope children (constructed inline, flax
    # names them in creation order: 0 = forward, 1 = backward)
    enc_p["OptimizedLSTMCell_0"] = _lstm(sd, "encoder.lstm", "_l0")
    enc_p["OptimizedLSTMCell_1"] = _lstm(sd, "encoder.lstm", "_l0_reverse")
    params["encoder"], stats["encoder"] = enc_p, enc_s

    params["memory_layer"] = {
        "kernel": _dense(sd["decoder.attention_layer.memory_layer.linear_layer.weight"])
    }

    att = "decoder.attention_layer"
    cell_p: dict = {
        "prenet": {
            "fc0": {"kernel": _dense(sd["decoder.prenet.layers.0.linear_layer.weight"])},
            "fc1": {"kernel": _dense(sd["decoder.prenet.layers.1.linear_layer.weight"])},
        },
        "attention_rnn": _lstm(sd, "decoder.attention_rnn"),
        "location_conv": {
            "kernel": _conv1d(sd[f"{att}.location_layer.location_conv.conv.weight"])
        },
        "location_dense": {
            "kernel": _dense(sd[f"{att}.location_layer.location_dense.linear_layer.weight"])
        },
        "query_layer": {"kernel": _dense(sd[f"{att}.query_layer.linear_layer.weight"])},
        "v": {"kernel": _dense(sd[f"{att}.v.linear_layer.weight"])},
        "decoder_rnn": _lstm(sd, "decoder.decoder_rnn"),
        "linear_projection": {
            "kernel": _dense(sd["decoder.linear_projection.linear_layer.weight"]),
            "bias": sd["decoder.linear_projection.linear_layer.bias"],
        },
        "gate_layer": {
            "kernel": _dense(sd["decoder.gate_layer.linear_layer.weight"]),
            "bias": sd["decoder.gate_layer.linear_layer.bias"],
        },
    }
    params["cell"] = cell_p

    post_p: dict = {}
    post_s: dict = {}
    for i in range(5):
        src = f"postnet.convolutions.{i}"
        post_p[f"conv{i}"] = {
            "kernel": _conv1d(sd[f"{src}.0.conv.weight"]),
            "bias": sd[f"{src}.0.conv.bias"],
        }
        p, s = _bn(sd, f"{src}.1")
        post_p[f"bn{i}"], post_s[f"bn{i}"] = p, s
    params["postnet"], stats["postnet"] = post_p, post_s
    return params, stats


def convert_waveglow(
    sd: Mapping[str, np.ndarray],
    n_flows: int = 12,
    n_layers: int = 8,
    n_mel: int = 80,
    n_group: int = 8,
) -> dict:
    """Reference WaveGlow state_dict (``waveglow/model.py:160-381``) ->
    params for ``models/tts/WaveGlow``.

    Three re-layouts beyond plain transposes:
    - ``upsample`` ConvTranspose1d (in, out, k) -> flax (k, in, out) with the
      spatial axis REVERSED (lax.conv_transpose correlates, torch convolves);
    - ``cond_layer`` input channels: the reference's spect unfold (:202-204)
      is mel-major (mel*n_group + group), ours is group-major;
    - WN ``end``: the reference reads b from the FIRST half and log_s from
      the SECOND (:225-227); we emit (log_s, b) — output rows swap.
    Weight-normed convs (weight_g/weight_v) are folded to effective weights.
    """
    params: dict = {
        "upsample": {
            "kernel": np.ascontiguousarray(
                np.transpose(sd["upsample.weight"], (2, 0, 1))[::-1]
            ),
            "bias": sd["upsample.bias"],
        }
    }
    # group-major index g*n_mel + m <- mel-major index m*n_group + g
    cond_perm = np.array(
        [m * n_group + g for g in range(n_group) for m in range(n_mel)]
    )
    for k in range(n_flows):
        # convinv: torch conv1d weight (c, c, 1), out = W @ z; ours z @ w => w = W^T
        w = sd[f"convinv.{k}.conv.weight"][..., 0]
        params[f"conv1x1_{k}"] = {"weight": np.transpose(w)}

        wn_src = f"WN.{k}"
        # the reference keeps one cond conv per WN layer (``cond_layers``
        # ModuleList, :124-126); ours is a single fused conv over all layers
        # — stack along the output-channel axis in layer order
        cond_w = np.concatenate(
            [
                _conv1d(_wn_fold(sd, f"{wn_src}.cond_layers.{i}"))
                for i in range(n_layers)
            ],
            axis=2,
        )
        cond_b = np.concatenate(
            [sd[f"{wn_src}.cond_layers.{i}.bias"] for i in range(n_layers)]
        )
        wn: dict = {
            "start": {
                "kernel": _conv1d(_wn_fold(sd, f"{wn_src}.start")),
                "bias": sd[f"{wn_src}.start.bias"],
            },
            "cond_layer": {"kernel": cond_w[:, cond_perm, :], "bias": cond_b},
        }
        for i in range(n_layers):
            wn[f"in_layer{i}"] = {
                "kernel": _conv1d(_wn_fold(sd, f"{wn_src}.in_layers.{i}")),
                "bias": sd[f"{wn_src}.in_layers.{i}.bias"],
            }
            wn[f"res_skip{i}"] = {
                "kernel": _conv1d(_wn_fold(sd, f"{wn_src}.res_skip_layers.{i}")),
                "bias": sd[f"{wn_src}.res_skip_layers.{i}.bias"],
            }
        end_w = sd[f"{wn_src}.end.weight"]
        end_b = sd[f"{wn_src}.end.bias"]
        n_half = end_w.shape[0] // 2
        swap = np.concatenate([np.arange(n_half, 2 * n_half), np.arange(n_half)])
        wn["end"] = {"kernel": _conv1d(end_w[swap]), "bias": end_b[swap]}
        params[f"wn_{k}"] = wn
    return params


def convert_dlrm(
    bottom_weights: list[np.ndarray],
    bottom_biases: list[np.ndarray],
    embedding_tables: list[np.ndarray],
    top_weights: list[np.ndarray],
    top_biases: list[np.ndarray],
    total_rows: int,
) -> dict:
    """Reference DLRM tensors (``dlrm/nn/parts.py:27-135``) -> params for
    ``models/dlrm/Dlrm``: per-table embeddings concatenate row-wise into the
    joint table (pad rows zero), MLP (out,in) weights transpose, and the
    reference's top MLP split (hidden stack + separate ``out`` Linear) maps
    onto our single ``top_mlp_*`` chain."""
    params: dict = {}
    for i, (w, b) in enumerate(zip(bottom_weights, bottom_biases)):
        params[f"bottom_mlp_{i}"] = {"kernel": _dense(w), "bias": b}
    for i, (w, b) in enumerate(zip(top_weights, top_biases)):
        params[f"top_mlp_{i}"] = {"kernel": _dense(w), "bias": b}
    joint = np.concatenate(embedding_tables, axis=0)
    if joint.shape[0] < total_rows:
        pad = np.zeros((total_rows - joint.shape[0], joint.shape[1]), joint.dtype)
        joint = np.concatenate([joint, pad], axis=0)
    params["embedding_table"] = joint
    return params


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
        params[f"layer_{i}"] = {
            "attention": {
                **{
                    n: {
                        "kernel": _dense(sd[f"{src}.attention.self.{n}.weight"]),
                        "bias": sd[f"{src}.attention.self.{n}.bias"],
                    }
                    for n in ("query", "key", "value")
                },
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


def convert_ncf(sd: Mapping[str, np.ndarray], n_mlp_layers: int) -> dict:
    """Reference NeuMF state_dict (``Recommendation/NCF/neumf.py:39-98``) ->
    ``models/ncf.NeuMF`` params: four embedding tables, the MLP pyramid
    (torch (out,in) -> flax (in,out)), and the fused final Linear."""
    params: dict = {
        "mf_user": {"embedding": sd["mf_user_embed.weight"]},
        "mf_item": {"embedding": sd["mf_item_embed.weight"]},
        "mlp_user": {"embedding": sd["mlp_user_embed.weight"]},
        "mlp_item": {"embedding": sd["mlp_item_embed.weight"]},
        "final": {"kernel": _dense(sd["final.weight"]),
                  "bias": sd["final.bias"]},
    }
    for i in range(n_mlp_layers):
        params[f"mlp_{i}"] = {
            "kernel": _dense(sd[f"mlp.{i}.weight"]),
            "bias": sd[f"mlp.{i}.bias"],
        }
    return params


def convert_gnmt(sd: Mapping[str, np.ndarray], padded_vocab: int,
                 num_layers: int) -> dict:
    """Reference GNMT state_dict (``Translation/GNMT/seq2seq/models/``:
    ``gnmt.py`` + ``encoder.py:30-120`` + ``decoder.py:113-244`` +
    ``attention.py:30-140``) -> ``models/translation/Gnmt`` params.

    Shared embedding pads to the lane multiple; the classifier's padded
    vocab columns get -1e9 bias so they never win a softmax."""

    def pad_vocab(w):
        out = np.zeros((padded_vocab, w.shape[1]), w.dtype)
        out[: w.shape[0]] = w
        return out

    params: dict = {
        "embed": {"embedding": pad_vocab(sd["encoder.embedder.weight"])},
        "enc_fwd": {"cell": _lstm(sd, "encoder.rnn_layers.0", "_l0")},
        "enc_bwd": {"cell": _lstm(sd, "encoder.rnn_layers.0", "_l0_reverse")},
        "dec_l0": {"cell": _lstm(sd, "decoder.att_rnn.rnn", "_l0")},
        "attn": {
            "q": {"kernel": _dense(sd["decoder.att_rnn.attn.linear_q.weight"])},
            "k": {"kernel": _dense(sd["decoder.att_rnn.attn.linear_k.weight"])},
            "v": sd["decoder.att_rnn.attn.linear_att"],
            "g": sd["decoder.att_rnn.attn.normalize_scalar"].reshape(()),
            "bias": sd["decoder.att_rnn.attn.normalize_bias"],
        },
    }
    for i in range(1, num_layers):
        params[f"enc_{i}"] = {"cell": _lstm(sd, f"encoder.rnn_layers.{i}", "_l0")}
        params[f"dec_{i}"] = {
            "cell": _lstm(sd, f"decoder.rnn_layers.{i - 1}", "_l0")
        }
    cw = _dense(sd["decoder.classifier.classifier.weight"])  # (H, V)
    cb = sd["decoder.classifier.classifier.bias"]
    kernel = np.zeros((cw.shape[0], padded_vocab), cw.dtype)
    kernel[:, : cw.shape[1]] = cw
    bias = np.full((padded_vocab,), -1e9, cb.dtype)
    bias[: cb.shape[0]] = cb
    params["classifier"] = {"kernel": kernel, "bias": bias}
    return params


def _tft_grn(sd: Mapping[str, np.ndarray], p: str) -> dict:
    """Reference TFT GRN (``Forecasting/TFT/modeling.py:48-77``) ->
    models/tft.GRN params. Optional pieces (context dense, out_proj,
    MaybeLayerNorm) map only when present in the state_dict."""
    out = {
        "lin_a": {"kernel": _dense(sd[f"{p}.lin_a.weight"]),
                  "bias": sd[f"{p}.lin_a.bias"]},
        "lin_i": {"kernel": _dense(sd[f"{p}.lin_i.weight"]),
                  "bias": sd[f"{p}.lin_i.bias"]},
        "glu": {"lin": {"kernel": _dense(sd[f"{p}.glu.lin.weight"]),
                        "bias": sd[f"{p}.glu.lin.bias"]}},
    }
    if f"{p}.lin_c.weight" in sd:
        out["lin_c"] = {"kernel": _dense(sd[f"{p}.lin_c.weight"])}
    if f"{p}.out_proj.weight" in sd:
        out["out_proj"] = {"kernel": _dense(sd[f"{p}.out_proj.weight"]),
                           "bias": sd[f"{p}.out_proj.bias"]}
    if f"{p}.layer_norm.ln.weight" in sd:
        out["ln"] = {"scale": sd[f"{p}.layer_norm.ln.weight"],
                     "bias": sd[f"{p}.layer_norm.ln.bias"]}
    return out


def _tft_vsn(sd: Mapping[str, np.ndarray], p: str, num_inputs: int) -> dict:
    out = {"joint_grn": _tft_grn(sd, f"{p}.joint_grn")}
    for i in range(num_inputs):
        out[f"var_grn_{i}"] = _tft_grn(sd, f"{p}.var_grns.{i}")
    return out


def _tft_glu(sd: Mapping[str, np.ndarray], p: str) -> dict:
    return {"lin": {"kernel": _dense(sd[f"{p}.lin.weight"]),
                    "bias": sd[f"{p}.lin.bias"]}}


def _tft_ln(sd: Mapping[str, np.ndarray], p: str) -> dict:
    return {"scale": sd[f"{p}.weight"], "bias": sd[f"{p}.bias"]}


def convert_tft(sd: Mapping[str, np.ndarray], n_static: int,
                num_historic_vars: int, num_future_vars: int) -> dict:
    """Reference TemporalFusionTransformer state_dict
    (``Forecasting/TFT/modeling.py:435-468``) -> ``models/tft.TFT`` params."""
    emb: dict = {
        "k_cont_vectors": sd["embedding.t_cont_k_embedding_vectors"],
        "k_cont_bias": sd["embedding.t_cont_k_embedding_bias"],
        "target_vectors": sd["embedding.t_tgt_embedding_vectors"],
        "target_bias": sd["embedding.t_tgt_embedding_bias"],
    }
    if "embedding.t_cont_o_embedding_vectors" in sd:
        emb["o_cont_vectors"] = sd["embedding.t_cont_o_embedding_vectors"]
        emb["o_cont_bias"] = sd["embedding.t_cont_o_embedding_bias"]
    for i in range(n_static):
        emb[f"s_cat_{i}"] = {"embedding": sd[f"embedding.s_cat_embed.{i}.weight"]}

    params: dict = {
        "embedding": emb,
        "static_encoder": {
            "vsn": _tft_vsn(sd, "static_encoder.vsn", n_static),
            **{f"context_grn_{i}": _tft_grn(sd, f"static_encoder.context_grns.{i}")
               for i in range(4)},
        },
        "history_vsn": _tft_vsn(sd, "TFTpart2.history_vsn", num_historic_vars),
        "future_vsn": _tft_vsn(sd, "TFTpart2.future_vsn", num_future_vars),
        "history_encoder": _lstm(sd, "TFTpart2.history_encoder", "_l0"),
        "future_encoder": _lstm(sd, "TFTpart2.future_encoder", "_l0"),
        "input_gate": _tft_glu(sd, "TFTpart2.input_gate"),
        "input_gate_ln": _tft_ln(sd, "TFTpart2.input_gate_ln"),
        "enrichment_grn": _tft_grn(sd, "TFTpart2.enrichment_grn"),
        "attention": {
            "qkv": {"kernel": _dense(sd["TFTpart2.attention.qkv_linears.weight"])},
            "out_proj": {"kernel": _dense(sd["TFTpart2.attention.out_proj.weight"])},
        },
        "attention_gate": _tft_glu(sd, "TFTpart2.attention_gate"),
        "attention_ln": _tft_ln(sd, "TFTpart2.attention_ln"),
        "positionwise_grn": _tft_grn(sd, "TFTpart2.positionwise_grn"),
        "decoder_gate": _tft_glu(sd, "TFTpart2.decoder_gate"),
        "decoder_ln": _tft_ln(sd, "TFTpart2.decoder_ln"),
        "quantile_proj": {"kernel": _dense(sd["TFTpart2.quantile_proj.weight"]),
                          "bias": sd["TFTpart2.quantile_proj.bias"]},
    }
    return params


def convert_jasper(sd: Mapping[str, np.ndarray],
                   blocks: "Sequence") -> tuple[dict, dict]:
    """Reference Jasper state_dict (``SpeechRecognition/Jasper/jasper/
    model.py:88-223``) -> (params, batch_stats) for ``models/asr.Jasper``.

    Each block's ModuleList interleaves [conv, bn, act, dropout] per repeat
    (act/dropout hold no params), so repeat r's conv sits at index 4r;
    residual adapters are ``res.{p}.{0=conv,1=bn}``; blocks arrive as our
    ``JasperBlock`` dataclasses to recover the repeat/residual structure."""

    def conv1d(w):
        return np.transpose(w, (2, 1, 0))  # (out, in, k) -> (k, in, out)

    def bn(prefix):
        p = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
        s = {"mean": sd[f"{prefix}.running_mean"],
             "var": sd[f"{prefix}.running_var"]}
        return p, s

    params: dict = {}
    stats: dict = {}
    n_dense = 0
    for bi, blk in enumerate(blocks):
        src = f"encoder.layers.{bi}"
        for r in range(blk.repeats):
            name = f"b{bi}_{r}"
            bp, bs = bn(f"{src}.conv.{4 * r + 1}")
            params[name] = {
                "conv": {"kernel": conv1d(sd[f"{src}.conv.{4 * r}.weight"])},
                "bn": bp,
            }
            stats[name] = {"bn": bs}
        if blk.residual:
            n_panes = (n_dense + 1) if blk.dense else 1
            for p in range(n_panes):
                name = f"b{bi}_res{p}"
                bp, bs = bn(f"{src}.res.{p}.1")
                params[name] = {
                    "conv": {"kernel": conv1d(sd[f"{src}.res.{p}.0.weight"])},
                    "bn": bp,
                }
                stats[name] = {"bn": bs}
            if blk.dense:
                n_dense += 1
    params["head"] = {"kernel": conv1d(sd["decoder.layers.0.weight"]),
                      "bias": sd["decoder.layers.0.bias"]}
    return params, stats


def convert_hifigan_generator(sd: Mapping[str, np.ndarray],
                              n_up: int, n_kernels: int,
                              n_convs: int) -> dict:
    """Reference HiFi-GAN Generator state_dict (``SpeechSynthesis/HiFiGAN/
    hifigan/models.py:140-233``, weight-normed) -> ``HiFiGanGenerator``
    params. ConvTranspose kernels transpose (in,out,k)->(k,in,out) AND flip
    the spatial axis: torch's ConvTranspose1d(padding=(k-u)//2) equals flax
    ``ConvTranspose(padding="SAME")`` with a mirrored kernel (verified
    numerically to 6e-8)."""

    def conv(prefix):
        w = _wn_fold(sd, prefix)  # (out, in, k)
        return {"kernel": np.transpose(w, (2, 1, 0)),
                "bias": sd[f"{prefix}.bias"]}

    def convt(prefix):
        w = _wn_fold(sd, prefix)  # (in, out, k)
        kern = np.transpose(w, (2, 0, 1))[::-1].copy()
        return {"kernel": kern, "bias": sd[f"{prefix}.bias"]}

    params: dict = {"pre": conv("conv_pre"), "post": conv("conv_post")}
    for i in range(n_up):
        params[f"up_{i}"] = convt(f"ups.{i}")
        for j in range(n_kernels):
            blk: dict = {}
            for m in range(n_convs):
                blk[f"c1_{m}"] = conv(f"resblocks.{i}.{j}.convs1.{m}")
                blk[f"c2_{m}"] = conv(f"resblocks.{i}.{j}.convs2.{m}")
            params[f"mrf_{i}_{j}"] = blk
    return params


def convert_fastpitch(sd: Mapping[str, np.ndarray], n_enc: int, n_dec: int,
                      n_pred_layers: int = 2, energy: bool = True) -> dict:
    """Reference FastPitch state_dict (``SpeechSynthesis/FastPitch/
    fastpitch/{model,transformer}.py``) -> ``models/tts/FastPitch`` params.
    The ConvAttention aligner's weights (training-data machinery) are
    skipped."""

    def conv1d(prefix):
        return {"kernel": np.transpose(sd[f"{prefix}.weight"], (2, 1, 0)),
                "bias": sd[f"{prefix}.bias"]}

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    def fft_layer(prefix):
        return {
            "qkv": {"kernel": _dense(sd[f"{prefix}.dec_attn.qkv_net.weight"]),
                    "bias": sd[f"{prefix}.dec_attn.qkv_net.bias"]},
            "o_net": {"kernel": _dense(sd[f"{prefix}.dec_attn.o_net.weight"])},
            "ln1": ln(f"{prefix}.dec_attn.layer_norm"),
            "conv1": conv1d(f"{prefix}.pos_ff.CoreNet.0"),
            "conv2": conv1d(f"{prefix}.pos_ff.CoreNet.2"),
            "ln2": ln(f"{prefix}.pos_ff.layer_norm"),
        }

    def predictor(prefix):
        out = {"fc": {"kernel": _dense(sd[f"{prefix}.fc.weight"]),
                      "bias": sd[f"{prefix}.fc.bias"]}}
        for i in range(n_pred_layers):
            out[f"conv{i}"] = conv1d(f"{prefix}.layers.{i}.conv")
            out[f"ln{i}"] = ln(f"{prefix}.layers.{i}.norm")
        return out

    params: dict = {
        "embed": {"embedding": sd["encoder.word_emb.weight"]},
        "duration_predictor": predictor("duration_predictor"),
        "pitch_predictor": predictor("pitch_predictor"),
        "pitch_embed": conv1d("pitch_emb"),
        "mel_proj": {"kernel": _dense(sd["proj.weight"]),
                     "bias": sd["proj.bias"]},
    }
    if energy:
        params["energy_predictor"] = predictor("energy_predictor")
        params["energy_embed"] = conv1d("energy_emb")
    for i in range(n_enc):
        params[f"enc_{i}"] = fft_layer(f"encoder.layers.{i}")
    for i in range(n_dec):
        params[f"dec_{i}"] = fft_layer(f"decoder.layers.{i}")
    return params


def convert_efficientnet(sd: Mapping[str, np.ndarray], num_repeat,
                         expansion) -> tuple[dict, dict]:
    """Reference EfficientNet state_dict (``Classification/ConvNets/
    image_classification/models/efficientnet.py:175-466``) ->
    (params, batch_stats) for ``models/convnets/EfficientNet``.
    ``num_repeat``/``expansion`` are the (scaled) per-stage lists."""
    params: dict = {}
    stats: dict = {}

    def put(dst, conv_src, bn_src, depthwise=False):
        w = _conv(sd[f"{conv_src}.weight"])
        if depthwise:
            # torch depthwise (C,1,k,k) -> _conv gives (k,k,1,C) — already
            # the flax feature_group_count layout
            pass
        p, s = _bn(sd, bn_src)
        return w, p, s

    w, p, s = put("stem", "stem.conv", "stem.bn")
    params["stem_conv"] = {"kernel": w}
    params["stem_bn"], stats["stem_bn"] = p, s
    for si, (r, e) in enumerate(zip(num_repeat, expansion)):
        for j in range(r):
            src = f"layers.{si}.block{j}"
            dst = f"stage{si}_{j}"
            blk_p: dict = {}
            blk_s: dict = {}
            if e != 1:
                w, p, s = put(dst, f"{src}.expand.conv", f"{src}.expand.bn")
                blk_p["expand_conv"] = {"kernel": w}
                blk_p["expand_bn"], blk_s["expand_bn"] = p, s
            w, p, s = put(dst, f"{src}.depsep.conv", f"{src}.depsep.bn",
                          depthwise=True)
            blk_p["depthwise_conv"] = {"kernel": w}
            blk_p["depthwise_bn"], blk_s["depthwise_bn"] = p, s
            blk_p["se"] = {
                "squeeze": {"kernel": _dense(sd[f"{src}.se.squeeze.weight"]),
                            "bias": sd[f"{src}.se.squeeze.bias"]},
                "expand": {"kernel": _dense(sd[f"{src}.se.expand.weight"]),
                           "bias": sd[f"{src}.se.expand.bias"]},
            }
            w, p, s = put(dst, f"{src}.proj.conv", f"{src}.proj.bn")
            blk_p["project_conv"] = {"kernel": w}
            blk_p["project_bn"], blk_s["project_bn"] = p, s
            params[dst], stats[dst] = blk_p, blk_s
    w, p, s = put("head", "features.conv", "features.bn")
    params["head_conv"] = {"kernel": w}
    params["head_bn"], stats["head_bn"] = p, s
    params["fc"] = {"kernel": _dense(sd["classifier.fc.weight"]),
                    "bias": sd["classifier.fc.bias"]}
    return params, stats


def convert_maskrcnn_heads(sd: Mapping[str, np.ndarray], pool: int = 7
                           ) -> dict:
    """Reference Mask R-CNN FPN/RPN/ROI-head weights -> params for
    ``models/maskrcnn.{FPN,RPNHead,BoxHead,MaskHead}``. ``sd`` merges the
    reference modules' state_dicts under the prefixes ``fpn./rpn./box_ext./
    box_pred./mask_ext./mask_pred.``. Re-layouts beyond plain transposes:
    fc6's flattened input permutes (C,p,p)->(p,p,C) (the reference pools
    NCHW and flattens channel-major, we pool NHWC); ``conv5_mask``
    ConvTranspose2d (in,out,2,2) -> flax (2,2,in,out) with both spatial
    axes reversed (lax.conv_transpose correlates, torch convolves).
    Reference: ``maskrcnn_benchmark/modeling/backbone/fpn.py:15-69``,
    ``rpn/rpn.py:15-38``, ``roi_heads/box_head/roi_box_feature_extractors
    .py:50-82`` + ``roi_box_predictors.py:33-52``, ``roi_heads/mask_head/
    roi_mask_feature_extractors.py:11-57`` + ``roi_mask_predictors
    .py:10-37``."""
    def convp(p):
        return {"kernel": _conv(sd[f"{p}.weight"]), "bias": sd[f"{p}.bias"]}

    fpn = {}
    for i in range(4):
        fpn[f"lateral_{i}"] = convp(f"fpn.fpn_inner{i + 1}")
        fpn[f"out_{i}"] = convp(f"fpn.fpn_layer{i + 1}")
    rpn = {"conv": convp("rpn.conv"), "logits": convp("rpn.cls_logits"),
           "deltas": convp("rpn.bbox_pred")}
    w6 = sd["box_ext.fc6.weight"]  # (fc, C*pool*pool), channel-major input
    c = w6.shape[1] // (pool * pool)
    w6 = (w6.reshape(-1, c, pool, pool).transpose(2, 3, 1, 0)
          .reshape(pool * pool * c, -1))
    box = {
        "fc6": {"kernel": w6, "bias": sd["box_ext.fc6.bias"]},
        "fc7": {"kernel": _dense(sd["box_ext.fc7.weight"]),
                "bias": sd["box_ext.fc7.bias"]},
        "cls": {"kernel": _dense(sd["box_pred.cls_score.weight"]),
                "bias": sd["box_pred.cls_score.bias"]},
        "box": {"kernel": _dense(sd["box_pred.bbox_pred.weight"]),
                "bias": sd["box_pred.bbox_pred.bias"]},
    }
    mask = {}
    for i in range(4):
        mask[f"fcn{i}"] = convp(f"mask_ext.mask_fcn{i + 1}")
    wt = sd["mask_pred.conv5_mask.weight"]  # (in, out, 2, 2)
    mask["deconv"] = {
        "kernel": np.ascontiguousarray(
            np.transpose(wt, (2, 3, 0, 1))[::-1, ::-1]),
        "bias": sd["mask_pred.conv5_mask.bias"],
    }
    mask["predict"] = convp("mask_pred.mask_fcn_logits")
    return {"fpn": fpn, "rpn": rpn, "box": box, "mask": mask}


def convert_gpunet(sd: Mapping[str, np.ndarray], arch) -> tuple[dict, dict]:
    """Reference GPUNet state_dict (``Classification/GPUNet/models/
    gpunet_builder.py:228-311`` ``_get_model`` over the released
    batch1/GV100 configs) -> (params, batch_stats) for
    ``models/convnets/GPUNet``. The reference net is one ``nn.Sequential``
    whose child names embed stage/counter strings; children are matched
    positionally against ``arch.layers`` (child 0 = Prologue, last =
    Epilogue, the order *is* the architecture)."""
    children: dict[str, dict[str, np.ndarray]] = {}
    for k, v in sd.items():
        child, sub = k.removeprefix("network.").split(".", 1)
        children.setdefault(child, {})[sub] = v
    order = list(children.values())
    if len(order) != len(arch.layers) + 2:
        raise ValueError(f"GPUNet child count {len(order)} != "
                         f"{len(arch.layers)} layers + head + tail")

    params: dict = {}
    stats: dict = {}

    def bn(csd, src):
        p = {"scale": csd[f"{src}.weight"], "bias": csd[f"{src}.bias"]}
        s = {"mean": csd[f"{src}.running_mean"],
             "var": csd[f"{src}.running_var"]}
        return p, s

    def se(csd):  # SqueezeExcite 1x1 convs -> our Dense pair
        return {
            "reduce": {"kernel": csd["se.conv_reduce.weight"][:, :, 0, 0].T,
                       "bias": csd["se.conv_reduce.bias"]},
            "expand": {"kernel": csd["se.conv_expand.weight"][:, :, 0, 0].T,
                       "bias": csd["se.conv_expand.bias"]},
        }

    head = order[0]
    params["stem_conv"] = {"kernel": _conv(head["net.0.weight"])}
    params["stem_bn"], stats["stem_bn"] = bn(head, "net.1")
    for i, l in enumerate(arch.layers):
        csd = order[i + 1]
        p = f"l{i}"
        if l.kind == "conv":
            params[f"{p}_conv"] = {"kernel": _conv(csd["conv.weight"])}
            params[f"{p}_bn"], stats[f"{p}_bn"] = bn(csd, "bn1")
        elif l.kind == "fused_irb":
            params[f"{p}_exp"] = {"kernel": _conv(csd["conv_exp.weight"])}
            params[f"{p}_bn1"], stats[f"{p}_bn1"] = bn(csd, "bn1")
            if l.se:
                params[f"{p}_se"] = se(csd)
            params[f"{p}_proj"] = {"kernel": _conv(csd["conv_pwl.weight"])}
            params[f"{p}_bn2"], stats[f"{p}_bn2"] = bn(csd, "bn2")
        else:  # irb
            params[f"{p}_pw"] = {"kernel": _conv(csd["conv_pw.weight"])}
            params[f"{p}_bn1"], stats[f"{p}_bn1"] = bn(csd, "bn1")
            params[f"{p}_dw"] = {"kernel": _conv(csd["conv_dw.weight"])}
            params[f"{p}_bn2"], stats[f"{p}_bn2"] = bn(csd, "bn2")
            if l.se:
                params[f"{p}_se"] = se(csd)
            params[f"{p}_pwl"] = {"kernel": _conv(csd["conv_pwl.weight"])}
            params[f"{p}_bn3"], stats[f"{p}_bn3"] = bn(csd, "bn3")
    tail = order[-1]
    params["head_conv"] = {"kernel": _conv(tail["net.0.weight"])}
    params["head_bn"], stats["head_bn"] = bn(tail, "net.1")
    params["fc"] = {"kernel": _dense(tail["net.6.weight"]),
                    "bias": tail["net.6.bias"]}
    return params, stats


def convert_moflow(sd: Mapping[str, np.ndarray], bond_n_flow: int,
                   bond_hidden, atom_n_flow: int, atom_hidden_gnn,
                   atom_hidden_lin) -> tuple[dict, dict]:
    """Reference MoFlow state_dict (``DrugDiscovery/MoFlow/moflow/model/``)
    -> (params, batch_stats) for ``models/moflow.MoFlow`` (conv_lu=2
    single-block configuration, which is what both published recipes use)."""
    params: dict = {"bond_glow": {}, "atom_flow": {}}
    stats: dict = {"bond_glow": {}, "atom_flow": {}}

    def bn(prefix):
        return ({"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]},
                {"mean": sd[f"{prefix}.running_mean"],
                 "var": sd[f"{prefix}.running_var"]})

    for i in range(bond_n_flow):
        src = f"bond_model.blocks.0.flows.{i}"
        params["bond_glow"][f"actnorm{i}"] = {
            "loc": sd[f"{src}.actnorm.loc"].reshape(-1),
            "scale": sd[f"{src}.actnorm.scale"].reshape(-1),
        }
        cp: dict = {}
        cs: dict = {}
        for j in range(len(bond_hidden)):
            cp[f"conv{j}"] = {
                "kernel": _conv(sd[f"{src}.coupling.layers.{3 * j}.weight"]),
                "bias": sd[f"{src}.coupling.layers.{3 * j}.bias"],
            }
            cp[f"bn{j}"], cs[f"bn{j}"] = bn(f"{src}.coupling.layers.{3 * j + 1}")
        jout = 3 * len(bond_hidden)
        cp["out"] = {
            "kernel": _conv(sd[f"{src}.coupling.layers.{jout}.weight"]),
            "bias": sd[f"{src}.coupling.layers.{jout}.bias"],
        }
        params["bond_glow"][f"coupling{i}"] = cp
        stats["bond_glow"][f"coupling{i}"] = cs

    for i in range(atom_n_flow):
        src = f"atom_model.blocks.0.flows.{i}"
        params["atom_flow"][f"actnorm{i}"] = {
            "loc": sd[f"{src}.actnorm.loc"].reshape(-1),
            "scale": sd[f"{src}.actnorm.scale"].reshape(-1),
        }
        cp = {}
        cs = {}
        for k in range(len(atom_hidden_gnn)):
            g = f"{src}.coupling.net_conv.{k}"
            cp[f"gnn{k}"] = {
                "self": {"kernel": _dense(sd[f"{g}.graph_conv.graph_linear_self.weight"]),
                         "bias": sd[f"{g}.graph_conv.graph_linear_self.bias"]},
                "edge": {"kernel": _dense(sd[f"{g}.graph_conv.graph_linear_edge.weight"]),
                         "bias": sd[f"{g}.graph_conv.graph_linear_edge.bias"]},
            }
            cp[f"gnn_bn{k}"], cs[f"gnn_bn{k}"] = bn(f"{g}.bn")
        for k in range(len(atom_hidden_lin)):
            li = f"{src}.coupling.net_lin.{k}"
            cp[f"lin{k}"] = {"kernel": _dense(sd[f"{li}.lin.weight"]),
                             "bias": sd[f"{li}.lin.bias"]}
            cp[f"lin_bn{k}"], cs[f"lin_bn{k}"] = bn(f"{li}.bn")
        kout = len(atom_hidden_lin)
        cp["out"] = {"kernel": _dense(sd[f"{src}.coupling.net_lin.{kout}.weight"]),
                     "bias": sd[f"{src}.coupling.net_lin.{kout}.bias"]}
        params["atom_flow"][f"coupling{i}"] = cp
        stats["atom_flow"][f"coupling{i}"] = cs
    return params, stats


def convert_brats_unet3d(sd: Mapping[str, np.ndarray], n_levels: int
                         ) -> dict:
    """Reference BraTS22 UNet3D state_dict (``Segmentation/nnUNet/nnunet/
    brats22_model.py``) -> ``models/unet.BratsUNet3D`` params. torch 3D
    conv (O,I,D,H,W) -> flax (D,H,W,I,O); instance norms are affine-only."""

    def conv3d(prefix):
        return {"kernel": np.transpose(sd[f"{prefix}.weight"],
                                       (2, 3, 4, 1, 0))}

    def layer(prefix):
        return {
            "conv": conv3d(f"{prefix}.conv"),
            "in_scale": sd[f"{prefix}.norm.weight"],
            "in_bias": sd[f"{prefix}.norm.bias"],
        }

    def block(prefix):
        return {"conv1": layer(f"{prefix}.conv1"),
                "conv2": layer(f"{prefix}.conv2")}

    params: dict = {
        "in_conv1": conv3d("input_block.conv1"),
        "in_conv2": conv3d("input_block.conv2"),
        "in_scale": sd["input_block.norm.weight"],
        "in_bias": sd["input_block.norm.bias"],
        "out_conv": {"kernel": np.transpose(sd["output_block.conv.weight"],
                                            (2, 3, 4, 1, 0)),
                     "bias": sd["output_block.conv.bias"]},
    }
    n_down = n_levels - 2  # levels minus input block and bottleneck
    for i in range(n_down):
        params[f"down_{i}"] = block(f"downsamples.{i}")
    params["bottleneck"] = block("bottleneck")
    for i in range(n_down + 1):
        params[f"up_{i}"] = block(f"upsamples.{i}.conv_block")
    for j in range(2):
        if f"deep_supervision_heads.{j}.conv.weight" in sd:
            params[f"ds_{j}"] = {
                "kernel": np.transpose(
                    sd[f"deep_supervision_heads.{j}.conv.weight"],
                    (2, 3, 4, 1, 0)),
                "bias": sd[f"deep_supervision_heads.{j}.conv.bias"],
            }
    return params


def convert_efficientdet_d0(sd: Mapping[str, np.ndarray], num_repeat,
                            expansion, fpn_cell_repeats: int = 3,
                            head_repeats: int = 3, num_levels: int = 5
                            ) -> tuple[dict, dict]:
    """Reference EfficientDet state_dict (``Detection/Efficientdet/effdet/
    model.py:464-506`` with its own backbone ``efficientnet.py``) ->
    (params, batch_stats) for ``models/efficientdet.EfficientDet``.
    The reference flattens MBConv blocks; ``num_repeat`` recovers our
    stage{s}_{j} naming."""
    params: dict = {}
    stats: dict = {}

    def bn(prefix):
        return ({"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]},
                {"mean": sd[f"{prefix}.running_mean"],
                 "var": sd[f"{prefix}.running_var"]})

    # ---- backbone (flat mbconv_blocks.{i} -> stage{s}_{j}) ----
    bb_p: dict = {"stem_conv": {"kernel": _conv(sd["backbone.input_conv.0.weight"])}}
    bb_s: dict = {}
    bb_p["stem_bn"], bb_s["stem_bn"] = bn("backbone.input_conv.1")
    flat = 0
    for si, (r, e) in enumerate(zip(num_repeat, expansion)):
        for j in range(r):
            src = f"backbone.mbconv_blocks.{flat}"
            blk_p: dict = {}
            blk_s: dict = {}
            if e != 1:
                blk_p["expand_conv"] = {
                    "kernel": _conv(sd[f"{src}.expand_conv.0.weight"])}
                blk_p["expand_bn"], blk_s["expand_bn"] = bn(f"{src}.expand_conv.1")
            blk_p["depthwise_conv"] = {
                "kernel": _conv(sd[f"{src}.depthwise_conv.0.weight"])}
            blk_p["depthwise_bn"], blk_s["depthwise_bn"] = bn(
                f"{src}.depthwise_conv.1")
            blk_p["se"] = {
                "squeeze": {"kernel": _dense(sd[f"{src}.squeeze_and_excitation.squeeze.weight"]),
                            "bias": sd[f"{src}.squeeze_and_excitation.squeeze.bias"]},
                "expand": {"kernel": _dense(sd[f"{src}.squeeze_and_excitation.expand.weight"]),
                           "bias": sd[f"{src}.squeeze_and_excitation.expand.bias"]},
            }
            blk_p["project_conv"] = {
                "kernel": _conv(sd[f"{src}.project_conv.0.weight"])}
            blk_p["project_bn"], blk_s["project_bn"] = bn(f"{src}.project_conv.1")
            bb_p[f"stage{si}_{j}"], bb_s[f"stage{si}_{j}"] = blk_p, blk_s
            flat += 1
    params["backbone"], stats["backbone"] = bb_p, bb_s

    # ---- extra pyramid level resamples (module-dict keyed by LEVEL:
    # resample.3 = P6 with conv+bn, resample.4 = P7 pool-only) ----
    params["resample_p6"] = {
        "conv": {"kernel": _conv(sd["fpn.resample.3.conv.conv.weight"])}}
    p, s = bn("fpn.resample.3.conv.bn")
    params["resample_p6"]["bn"] = p
    stats["resample_p6"] = {"bn": s}

    # ---- BiFPN cells ----
    for rep in range(fpn_cell_repeats):
        cell_p: dict = {}
        cell_s: dict = {}
        for ni in range(8):
            src = f"fpn.cell.{rep}.fnode.{ni}"
            cell_p[f"node{ni}_weights"] = sd[f"{src}.combine.edge_weights"]
            for key in sd:
                pre = f"{src}.combine.resample."
                if key.startswith(pre) and key.endswith(".conv.conv.weight"):
                    off = key[len(pre):].split(".")[0]
                    rp: dict = {"conv": {"kernel": _conv(sd[key])}}
                    bp, bs = bn(f"{pre}{off}.conv.bn")
                    rp["bn"] = bp
                    cell_p[f"node{ni}_resample_{off}"] = rp
                    cell_s[f"node{ni}_resample_{off}"] = {"bn": bs}
            cell_p[f"node{ni}_conv"] = {
                "dw": {"kernel": _conv(sd[f"{src}.after_combine.conv.conv_dw.weight"])},
                "pw": {"kernel": _conv(sd[f"{src}.after_combine.conv.conv_pw.weight"])},
            }
            bp, bs = bn(f"{src}.after_combine.conv.bn")
            cell_p[f"node{ni}_bn"] = bp
            cell_s[f"node{ni}_bn"] = bs
        params[f"bifpn_{rep}"], stats[f"bifpn_{rep}"] = cell_p, cell_s

    # ---- heads ----
    for net in ("class_net", "box_net"):
        hp: dict = {}
        hs: dict = {}
        for i in range(head_repeats):
            hp[f"conv_{i}"] = {
                "dw": {"kernel": _conv(sd[f"{net}.conv_rep.{i}.conv_dw.weight"])},
                "pw": {"kernel": _conv(sd[f"{net}.conv_rep.{i}.conv_pw.weight"])},
            }
            for lvl in range(num_levels):
                bp, bs = bn(f"{net}.bn_rep.{i}.{lvl}.bn")
                hp[f"bn_{lvl}_{i}"] = bp
                hs[f"bn_{lvl}_{i}"] = bs
        hp["predict"] = {
            "dw": {"kernel": _conv(sd[f"{net}.predict.conv_dw.weight"])},
            "pw": {"kernel": _conv(sd[f"{net}.predict.conv_pw.weight"]),
                   "bias": sd[f"{net}.predict.conv_pw.bias"]},
        }
        params[net], stats[net] = hp, hs
    return params, stats


def convert_transformer_xl(
    sd: Mapping[str, np.ndarray], n_layers: int, padded_vocab: int
) -> dict:
    """Reference ``MemTransformerLM`` state_dict (``Transformer-XL/pytorch/
    mem_transformer.py:516``, attn_type=0, div_val=1, no cutoffs) ->
    ``models/transformer_xl.TransformerXL`` params.

    The fused ``qkv_net`` (3*h*dh rows) splits into our separate q/k/v
    Denses; ``r_w_bias``/``r_r_bias`` are the global biases; the tied
    softmax's untied bias maps to ``softmax_bias`` (vocab rows padded)."""
    emb = sd["word_emb.emb_layers.0.weight"]
    emb_p = np.zeros((padded_vocab, emb.shape[1]), emb.dtype)
    emb_p[: emb.shape[0]] = emb
    bias = sd["crit.out_layers_biases.0"]
    bias_p = np.zeros((padded_vocab,), bias.dtype)
    bias_p[: bias.shape[0]] = bias
    params: dict = {
        "embed": {"embedding": emb_p},
        "r_w_bias": sd["r_w_bias"],
        "r_r_bias": sd["r_r_bias"],
        "softmax_bias": bias_p,
    }
    for i in range(n_layers):
        src = f"layers.{i}"
        qkv = sd[f"{src}.dec_attn.qkv_net.weight"]  # (3*h*dh, d)
        n = qkv.shape[0] // 3
        params[f"layer_{i}"] = {
            "attn": {
                "q": {"kernel": _dense(qkv[:n])},
                "k": {"kernel": _dense(qkv[n:2 * n])},
                "v": {"kernel": _dense(qkv[2 * n:])},
                "r": {"kernel": _dense(sd[f"{src}.dec_attn.r_net.weight"])},
                "o": {"kernel": _dense(sd[f"{src}.dec_attn.o_net.weight"])},
            },
            "ln1": {
                "scale": sd[f"{src}.dec_attn.layer_norm.weight"],
                "bias": sd[f"{src}.dec_attn.layer_norm.bias"],
            },
            "ff1": {
                "kernel": _dense(sd[f"{src}.pos_ff.CoreNet.0.weight"]),
                "bias": sd[f"{src}.pos_ff.CoreNet.0.bias"],
            },
            "ff2": {
                "kernel": _dense(sd[f"{src}.pos_ff.CoreNet.3.weight"]),
                "bias": sd[f"{src}.pos_ff.CoreNet.3.bias"],
            },
            "ln2": {
                "scale": sd[f"{src}.pos_ff.layer_norm.weight"],
                "bias": sd[f"{src}.pos_ff.layer_norm.bias"],
            },
        }
    return params


def convert_wav2vec2(sd: Mapping[str, np.ndarray], n_layers: int,
                     n_convs: int, extractor_mode: str = "group_norm",
                     n_groups: int = 2, n_entries: int = 320) -> dict:
    """Reference ``Wav2Vec2Model`` state_dict (``SpeechRecognition/wav2vec2/
    wav2vec2/model.py:159-276``) -> params for ``models/wav2vec2.Wav2Vec2``.

    Layout notes: the feature extractor blocks are Sequentials
    [conv, dropout, (norm), GELU], so the norm (GroupNorm in "default" mode
    on block 0, per-conv LayerNorm at Sequential index 2.1 in "layer_norm"
    mode) sits at key index 2. The encoder's pos_conv is weight-normed
    (dim=2); callers must ``remove_weight_norm`` first so ``weight`` is
    materialized. Separate q/k/v projections concatenate into our fused
    qkv Dense in (q, k, v) order (``jnp.split`` order in ContextBlock).
    """

    def dense(w):
        return np.transpose(w)  # torch Linear (out, in) -> (in, out)

    def conv1d(w):
        return np.transpose(w, (2, 1, 0))  # (out, in/g, k) -> (k, in/g, out)

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    enc: dict = {}
    for i in range(n_convs):
        src = f"feature_extractor.conv_layers.{i}"
        enc[f"conv{i}"] = {"kernel": conv1d(sd[f"{src}.0.weight"])}
        if extractor_mode == "layer_norm":
            enc[f"ln{i}"] = ln(f"{src}.2.1")
        elif i == 0:
            enc["gn0"] = ln(f"{src}.2")

    vars_ = sd["quantizer.vars"]  # (1, groups*entries, var_dim)
    params: dict = {
        "encoder": enc,
        "feat_ln": ln("layer_norm"),
        "feat_proj": {"kernel": dense(sd["post_extract_proj.weight"]),
                      "bias": sd["post_extract_proj.bias"]},
        "mask_embedding": sd["mask_emb"],
        "pos_conv": {"kernel": conv1d(sd["encoder.pos_conv.0.weight"]),
                     "bias": sd["encoder.pos_conv.0.bias"]},
        "encoder_ln": ln("encoder.layer_norm"),
        "final_proj": {"kernel": dense(sd["final_proj.weight"]),
                       "bias": sd["final_proj.bias"]},
        "project_q": {"kernel": dense(sd["project_q.weight"]),
                      "bias": sd["project_q.bias"]},
        "quantizer": {
            "proj": {"kernel": dense(sd["quantizer.weight_proj.weight"]),
                     "bias": sd["quantizer.weight_proj.bias"]},
            "codevectors": vars_.reshape(n_groups, n_entries, -1),
        },
    }
    for i in range(n_layers):
        src = f"encoder.layers.{i}"
        qkv_w = np.concatenate([sd[f"{src}.self_attn.q_proj.weight"],
                                sd[f"{src}.self_attn.k_proj.weight"],
                                sd[f"{src}.self_attn.v_proj.weight"]], axis=0)
        qkv_b = np.concatenate([sd[f"{src}.self_attn.q_proj.bias"],
                                sd[f"{src}.self_attn.k_proj.bias"],
                                sd[f"{src}.self_attn.v_proj.bias"]], axis=0)
        params[f"block_{i}"] = {
            "qkv": {"kernel": dense(qkv_w), "bias": qkv_b},
            "attn_out": {"kernel": dense(sd[f"{src}.self_attn.out_proj.weight"]),
                         "bias": sd[f"{src}.self_attn.out_proj.bias"]},
            "ln1": ln(f"{src}.self_attn_layer_norm"),
            "ln2": ln(f"{src}.final_layer_norm"),
            "ff1": {"kernel": dense(sd[f"{src}.fc1.weight"]),
                    "bias": sd[f"{src}.fc1.bias"]},
            "ff2": {"kernel": dense(sd[f"{src}.fc2.weight"]),
                    "bias": sd[f"{src}.fc2.bias"]},
        }
    return params


def convert_bart(sd: Mapping[str, np.ndarray], enc_layers: int,
                 dec_layers: int, padded_vocab: int) -> dict:
    """Reference ``BartForConditionalGeneration`` state_dict
    (``LanguageModeling/BART/bart/modeling/modeling_bart.py:1267``) ->
    params for ``models/bart.BartModel``. The shared embedding is padded
    with zero rows to the MXU-friendly vocab; positional tables keep the
    fairseq +2 offset rows; ``final_logits_bias`` is a zeros buffer
    upstream and is dropped."""

    def dense(w):
        return np.transpose(w)

    def ln(p):
        return {"scale": sd[f"{p}.weight"], "bias": sd[f"{p}.bias"]}

    def attn(src):
        return {
            name: {"kernel": dense(sd[f"{src}.{t}_proj.weight"]),
                   "bias": sd[f"{src}.{t}_proj.bias"]}
            for name, t in (("q", "q"), ("k", "k"), ("v", "v"), ("out", "out"))
        }

    emb = sd["model.shared.weight"]
    if emb.shape[0] < padded_vocab:
        emb = np.concatenate(
            [emb, np.zeros((padded_vocab - emb.shape[0], emb.shape[1]),
                           emb.dtype)])
    params: dict = {
        "embed": {"embedding": emb},
        "enc_pos": {"embedding": sd["model.encoder.embed_positions.weight"]},
        "dec_pos": {"embedding": sd["model.decoder.embed_positions.weight"]},
        "enc_emb_ln": ln("model.encoder.layernorm_embedding"),
        "dec_emb_ln": ln("model.decoder.layernorm_embedding"),
    }
    for i in range(enc_layers):
        src = f"model.encoder.layers.{i}"
        params[f"enc_{i}"] = {
            "self_attn": attn(f"{src}.self_attn"),
            "ln1": ln(f"{src}.self_attn_layer_norm"),
            "ff1": {"kernel": dense(sd[f"{src}.fc1.weight"]),
                    "bias": sd[f"{src}.fc1.bias"]},
            "ff2": {"kernel": dense(sd[f"{src}.fc2.weight"]),
                    "bias": sd[f"{src}.fc2.bias"]},
            "ln2": ln(f"{src}.final_layer_norm"),
        }
    for i in range(dec_layers):
        src = f"model.decoder.layers.{i}"
        params[f"dec_{i}"] = {
            "self_attn": attn(f"{src}.self_attn"),
            "cross_attn": attn(f"{src}.encoder_attn"),
            "ln1": ln(f"{src}.self_attn_layer_norm"),
            "ln_cross": ln(f"{src}.encoder_attn_layer_norm"),
            "ff1": {"kernel": dense(sd[f"{src}.fc1.weight"]),
                    "bias": sd[f"{src}.fc1.bias"]},
            "ff2": {"kernel": dense(sd[f"{src}.fc2.weight"]),
                    "bias": sd[f"{src}.fc2.bias"]},
            "ln2": ln(f"{src}.final_layer_norm"),
        }
    return params


def convert_nmt_transformer(sd: Mapping[str, np.ndarray], enc_layers: int,
                            dec_layers: int, padded_vocab: int) -> dict:
    """Reference fairseq ``TransformerModel`` state_dict
    (``Translation/Transformer/fairseq/models/transformer.py:62``) ->
    params for ``models/translation/transformer.Transformer``.

    The reference's q/k/v projections are applied as ``input @ W``
    (``multihead_attention.py:102-113`` — NOT nn.Linear's ``input @ W.T``),
    so those kernels copy over untransposed; ``out_proj``/``fc1``/``fc2``
    are nn.Linear and transpose. Attention is bias-free. The shared
    embedding is zero-padded to the MXU-friendly vocab."""

    def linear(p):
        return {"kernel": np.transpose(sd[f"{p}.weight"]),
                "bias": sd[f"{p}.bias"]}

    def ln(p):
        return {"scale": sd[f"{p}.ln.weight"], "bias": sd[f"{p}.ln.bias"]}

    def attn(src):
        out = {
            t: {"kernel": np.asarray(sd[f"{src}.in_proj_weight_{t}"])}
            for t in ("q", "k", "v")
        }
        out["out"] = {"kernel": np.transpose(sd[f"{src}.out_proj.weight"])}
        return out

    emb = sd["encoder.embed_tokens.weight"]
    if emb.shape[0] < padded_vocab:
        emb = np.concatenate(
            [emb, np.zeros((padded_vocab - emb.shape[0], emb.shape[1]),
                           emb.dtype)])
    params: dict = {"embed": {"embedding": emb}}
    for i in range(enc_layers):
        src = f"encoder.layers.{i}"
        params[f"enc_{i}"] = {
            "self_attn": attn(f"{src}.self_attn"),
            "ln1": ln(f"{src}.maybe_ln1"),
            "ff1": linear(f"{src}.fc1"),
            "ff2": linear(f"{src}.fc2"),
            "ln2": ln(f"{src}.maybe_ln2"),
        }
    for i in range(dec_layers):
        src = f"decoder.layers.{i}"
        params[f"dec_{i}"] = {
            "self_attn": attn(f"{src}.self_attn"),
            "cross_attn": attn(f"{src}.encoder_attn"),
            "ln1": ln(f"{src}.self_attn_layer_norm"),
            "ln_cross": ln(f"{src}.encoder_attn_layer_norm"),
            "ff1": linear(f"{src}.fc1"),
            "ff2": linear(f"{src}.fc2"),
            "ln2": ln(f"{src}.final_layer_norm"),
        }
    return params
