"""Gradient parity vs the installed torch reference (VERDICT r3 missing #1).

Forward parity (``test_reference_parity.py``) proves the functions match;
these tests prove the DERIVATIVES match — ``loss.backward()`` on the
reference torch model vs ``jax.grad`` on the converted params, asserted
leaf-for-leaf. This audits every custom VJP on the training path: flash
attention backward, mask-regenerating dropout, the scan-decoder LSTM chain,
and the embedding-gather backward.

Technique: the torch->flax weight converters in ``utils/torch_import.py``
are linear maps (transpose / permute / slice / concat / zero-pad), so a
state_dict holding ``p.grad`` per parameter converts into exactly the grad
tree ``jax.grad`` should produce. Two deliberate exceptions are handled:

- LSTM bias pairs: torch keeps ``bias_ih + bias_hh`` (summed by the
  converter) while ours has one bias; both torch grads equal ours, so the
  ``bias_hh`` slots are zeroed before converting.
- WaveGlow weight_norm: ``g*v/||v||`` is nonlinear, so the test calls the
  reference's own ``remove_weightnorm`` first (forward-identical, and
  ``_wn_fold`` passes plain ``.weight`` through).

Reference loss/model entry points per family are cited in
``test_reference_parity.py``; the same instances are reused here.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402

import test_reference_parity as fp  # noqa: E402  (stubs + setup reuse)

REF = "/root/reference/PyTorch"


def grad_state_dict(module: "torch.nn.Module") -> dict[str, np.ndarray]:
    """state_dict-shaped dict holding parameter grads (buffers -> zeros)."""
    out = {k: np.zeros(tuple(v.shape), np.float32)
           for k, v in module.state_dict().items()}
    for k, p in module.named_parameters():
        if p.grad is not None:
            out[k] = p.grad.detach().cpu().numpy().astype(np.float32)
    return out


def assert_grad_tree_close(ours, theirs, rtol=2e-3, floor=1e-6, prefix=""):
    """Leaf-wise comparison with an atol scaled to each leaf's grad
    magnitude (fp32 backward accumulates rounding ~1e-6 per term)."""
    flat_o = jax.tree_util.tree_flatten_with_path(ours)[0]
    flat_t = jax.tree_util.tree_flatten_with_path(theirs)[0]
    assert len(flat_o) == len(flat_t), (
        f"{prefix}: tree size mismatch {len(flat_o)} vs {len(flat_t)}")
    for (path_o, leaf_o), (path_t, leaf_t) in zip(flat_o, flat_t):
        name = jax.tree_util.keystr(path_o)
        o = np.asarray(leaf_o, np.float32)
        t = np.asarray(leaf_t, np.float32)
        assert o.shape == t.shape, f"{prefix}{name}: {o.shape} vs {t.shape}"
        atol = max(float(np.abs(t).max()) * 1e-4, floor)
        np.testing.assert_allclose(
            o, t, rtol=rtol, atol=atol, err_msg=f"{prefix}{name}")


# ---------------------------------------------------------------------------
# BERT (HF layout — same baseline as test_torch_import's forward parity)
# ---------------------------------------------------------------------------


def test_bert_gradient_parity():
    import test_torch_import as ti

    HFConfig, HFBert = ti._import_hf_bert()
    from deeplearningexamples_tpu.models.bert import BertConfig, BertModel
    from deeplearningexamples_tpu.utils.torch_import import convert_bert

    fp.seed_all(20)
    hf_cfg = HFConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    hf = HFBert(hf_cfg).eval()
    cfg = BertConfig(
        vocab_size=128, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, max_position_embeddings=64,
        hidden_dropout=0.0, attention_dropout=0.0, gelu_approximate=False,
    )
    model = BertModel(cfg, dtype=jnp.float32)
    params = convert_bert({k: v.numpy() for k, v in hf.state_dict().items()},
                          cfg.padded_vocab, cfg.num_layers)

    rng = np.random.default_rng(21)
    ids = rng.integers(1, 128, (2, 10))
    mask = np.ones((2, 10), np.int64)
    mask[1, 7:] = 0
    mvalid = torch.tensor(mask, dtype=torch.float32)[..., None]

    hf_out = hf(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask))
    # scalar readout over VALID positions only (padded positions differ by
    # construction) + the pooled head, so every layer gets nonzero grads
    ref_loss = ((hf_out.last_hidden_state ** 2) * mvalid).mean() \
        + (hf_out.pooler_output ** 2).mean()
    ref_loss.backward()

    def loss_fn(p):
        seq, pooled = model.apply(
            {"params": p}, jnp.asarray(ids, jnp.int32),
            jnp.asarray(mask, jnp.int32),
            jnp.zeros_like(jnp.asarray(ids, jnp.int32)), deterministic=True)
        m = jnp.asarray(mask, jnp.float32)[..., None]
        return jnp.mean(jnp.square(seq) * m) + jnp.mean(jnp.square(pooled))

    ours = jax.grad(loss_fn)(params)
    theirs = convert_bert(grad_state_dict(hf), cfg.padded_vocab, cfg.num_layers)
    assert_grad_tree_close(ours, theirs, prefix="bert")


# ---------------------------------------------------------------------------
# SSD300 (model grads THROUGH the multibox loss, plus input-image grads)
# ---------------------------------------------------------------------------


def test_ssd300_gradient_parity():
    fp._install_torchvision_stub()
    if REF + "/Detection/SSD" not in sys.path:
        sys.path.insert(0, REF + "/Detection/SSD")
    from ssd import model as ssd_ref
    from ssd.utils import dboxes300_coco as ref_dboxes

    from deeplearningexamples_tpu.models.ssd.model import SSD300
    from deeplearningexamples_tpu.models.ssd.task import multibox_loss
    from deeplearningexamples_tpu.utils.torch_import import convert_ssd300

    fp.seed_all(22)
    ref = ssd_ref.SSD300(backbone=ssd_ref.ResNet("resnet50")).eval()
    fp.randomize_bn_stats(ref)
    params, stats = convert_ssd300(fp.sd_numpy(ref))
    model = SSD300(dtype=jnp.float32)

    rng = np.random.default_rng(23)
    b, n = 2, 8732
    x = rng.standard_normal((b, 3, 300, 300)).astype(np.float32)
    glabel = np.zeros((b, n), np.int64)
    pos_idx = rng.choice(n, 30, replace=False)
    glabel[0, pos_idx[:20]] = rng.integers(1, 81, 20)
    glabel[1, pos_idx[20:]] = rng.integers(1, 81, 10)
    dboxes = ref_dboxes()
    d = dboxes(order="xywh").numpy()  # (n, 4)
    gloc = np.tile(d.T[None], (b, 1, 1)).astype(np.float32)
    jitter = 0.05 * rng.standard_normal((b, 4, n)).astype(np.float32)
    gloc[:, :2] += jitter[:, :2]
    gloc[:, 2:] *= np.exp(jitter[:, 2:])

    xt = torch.tensor(x, requires_grad=True)
    ploc, pconf = ref(xt)
    ref_loss_mod = ssd_ref.Loss(dboxes)
    ref_loss = ref_loss_mod(ploc, pconf, torch.tensor(gloc),
                            torch.tensor(glabel))
    ref_loss.backward()

    # encoded offsets for our loss (reference _loc_vec, ssd/model.py:158-165)
    scale_xy, scale_wh = 10.0, 5.0
    gxy = scale_xy * (gloc[:, :2] - d.T[None, :2]) / d.T[None, 2:]
    gwh = scale_wh * np.log(gloc[:, 2:] / d.T[None, 2:])
    loc_t = jnp.asarray(
        np.concatenate([gxy, gwh], axis=1).transpose(0, 2, 1))
    label_t = jnp.asarray(glabel.astype(np.int32))

    def loss_fn(p, img):
        loc, conf = model.apply(
            {"params": p, "batch_stats": stats}, img, train=False)
        return multibox_loss(loc, conf, loc_t, label_t)

    g_params, g_img = jax.grad(loss_fn, argnums=(0, 1))(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)))

    theirs, _ = convert_ssd300(grad_state_dict(ref))
    assert_grad_tree_close(g_params, theirs, prefix="ssd")
    np.testing.assert_allclose(
        np.asarray(g_img), xt.grad.numpy().transpose(0, 2, 3, 1),
        rtol=2e-3, atol=float(np.abs(xt.grad.numpy()).max()) * 1e-4 + 1e-7)


# ---------------------------------------------------------------------------
# Tacotron2 (scan decoder + LSTM cells + location attention backward)
# ---------------------------------------------------------------------------


def test_tacotron2_gradient_parity(monkeypatch):
    taco_model, taco_loss_mod = fp.taco_ref.__wrapped__()
    from deeplearningexamples_tpu.models.tts.tacotron2 import (
        Tacotron2, Tacotron2Config, tacotron2_loss,
    )
    from deeplearningexamples_tpu.utils.torch_import import convert_tacotron2

    monkeypatch.setattr(
        taco_model.F, "dropout",
        lambda x, p=0.5, training=False, inplace=False: x,
    )

    fp.seed_all(24)
    # mask_padding=False: the reference masks outputs IN-PLACE via
    # ``.data.masked_fill_`` (parse_output :646-656) which modern torch
    # autograd rejects under backward. Full-length sequences below make our
    # always-on output masking an identity, so parity is unaffected (the
    # variable-length path is covered by the forward-parity test).
    ref = taco_model.Tacotron2(
        mask_padding=False, n_mel_channels=80, n_symbols=148,
        symbols_embedding_dim=512, encoder_kernel_size=5,
        encoder_n_convolutions=3, encoder_embedding_dim=512,
        attention_rnn_dim=1024, attention_dim=128,
        attention_location_n_filters=32, attention_location_kernel_size=31,
        n_frames_per_step=1, decoder_rnn_dim=1024, prenet_dim=256,
        max_decoder_steps=2000, gate_threshold=0.5,
        p_attention_dropout=0.0, p_decoder_dropout=0.0,
        postnet_embedding_dim=512, postnet_kernel_size=5,
        postnet_n_convolutions=5, decoder_no_early_stopping=True,
    ).eval()
    fp.randomize_bn_stats(ref)

    cfg = Tacotron2Config(
        dropout=0.0, p_attention_dropout=0.0, p_decoder_dropout=0.0)
    model = Tacotron2(cfg, dtype=jnp.float32)
    params, stats = convert_tacotron2(fp.sd_numpy(ref))

    rng = np.random.default_rng(25)
    b, t_in, t_out = 2, 12, 20
    text = rng.integers(1, 148, (b, t_in))
    text_len = np.array([12, 12])
    mels = rng.standard_normal((b, t_out, 80)).astype(np.float32)
    mel_len = np.array([20, 20])
    gate_t = (np.arange(t_out)[None, :] >= mel_len[:, None] - 1).astype(np.float32)

    mel_in = torch.tensor(mels.transpose(0, 2, 1), requires_grad=True)
    r_out = ref((torch.tensor(text), torch.tensor(text_len), mel_in, t_in,
                 torch.tensor(mel_len)))
    ref_loss = taco_loss_mod.Tacotron2Loss()(
        r_out, (torch.tensor(mels.transpose(0, 2, 1)), torch.tensor(gate_t)))
    ref_loss.backward()

    def loss_fn(p, m_in):
        mel, mel_post, gates, _ = model.apply(
            {"params": p, "batch_stats": stats},
            jnp.asarray(text, jnp.int32), jnp.asarray(text_len, jnp.int32),
            m_in, jnp.asarray(mel_len, jnp.int32), deterministic=True)
        return tacotron2_loss(mel, mel_post, gates, jnp.asarray(mels),
                              jnp.asarray(gate_t))

    g_params, g_mel = jax.grad(loss_fn, argnums=(0, 1))(
        params, jnp.asarray(mels))

    gsd = grad_state_dict(ref)
    # torch grad(bias_ih) == grad(bias_hh) == our single-bias grad; zero the
    # _hh slot so the converter's bias sum equals ours
    for k in list(gsd):
        if "bias_hh" in k:
            gsd[k] = np.zeros_like(gsd[k])
    theirs, _ = convert_tacotron2(gsd)
    assert_grad_tree_close(g_params, theirs, prefix="taco2")
    ref_g_mel = mel_in.grad.numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(
        np.asarray(g_mel), ref_g_mel, rtol=2e-3,
        atol=float(np.abs(ref_g_mel).max()) * 1e-4 + 1e-7)


# ---------------------------------------------------------------------------
# WaveGlow (invertible-flow backward incl. 1x1-conv logdet)
# ---------------------------------------------------------------------------


def test_waveglow_gradient_parity():
    taco_model, _ = fp.taco_ref.__wrapped__()
    import waveglow.loss_function as wg_loss_mod
    import waveglow.model as wg_model

    from deeplearningexamples_tpu.models.tts.waveglow import (
        WaveGlow, WaveGlowConfig, waveglow_loss,
    )
    from deeplearningexamples_tpu.utils.torch_import import convert_waveglow

    fp.seed_all(26)
    n_flows, n_layers, n_channels = 4, 4, 64
    ref = wg_model.WaveGlow(
        n_mel_channels=80, n_flows=n_flows, n_group=8, n_early_every=2,
        n_early_size=2,
        WN_config=dict(n_layers=n_layers, n_channels=n_channels, kernel_size=3),
    ).eval()
    g = torch.Generator().manual_seed(27)
    for wn in ref.WN:
        wn.end.weight.data.uniform_(-0.05, 0.05, generator=g)
        wn.end.bias.data.uniform_(-0.05, 0.05, generator=g)
    # fold g*v/||v|| -> plain .weight (forward-identical); makes every
    # converter mapping linear so the grad state_dict converts exactly
    ref = wg_model.WaveGlow.remove_weightnorm(ref)

    cfg = WaveGlowConfig(n_flows=n_flows, n_early_every=2,
                         wn_n_layers=n_layers, wn_n_channels=n_channels)
    model = WaveGlow(cfg, dtype=jnp.float32)
    params = convert_waveglow(fp.sd_numpy(ref), n_flows=n_flows,
                              n_layers=n_layers)

    rng = np.random.default_rng(28)
    audio = rng.standard_normal((2, 4096)).astype(np.float32)
    mel = rng.standard_normal((2, 16, 80)).astype(np.float32)

    audio_t = torch.tensor(audio, requires_grad=True)
    mel_t = torch.tensor(mel.transpose(0, 2, 1), requires_grad=True)
    r_out = ref((mel_t, audio_t))
    ref_loss = wg_loss_mod.WaveGlowLoss()(r_out, audio_t)
    ref_loss.backward()

    def loss_fn(p, a, m):
        z, log_s_total, log_det_total = model.apply({"params": p}, a, m)
        return waveglow_loss(z, log_s_total, log_det_total)

    g_params, g_audio, g_mel = jax.grad(loss_fn, argnums=(0, 1, 2))(
        params, jnp.asarray(audio), jnp.asarray(mel))

    theirs = convert_waveglow(grad_state_dict(ref), n_flows=n_flows,
                              n_layers=n_layers)
    assert_grad_tree_close(g_params, theirs, prefix="waveglow")
    np.testing.assert_allclose(
        np.asarray(g_audio), audio_t.grad.numpy(), rtol=2e-3,
        atol=float(np.abs(audio_t.grad.numpy()).max()) * 1e-4 + 1e-7)
    ref_g_mel = mel_t.grad.numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(
        np.asarray(g_mel), ref_g_mel, rtol=2e-3,
        atol=float(np.abs(ref_g_mel).max()) * 1e-4 + 1e-7)


# ---------------------------------------------------------------------------
# DLRM (embedding-gather backward + interaction + BCE head)
# ---------------------------------------------------------------------------


def test_dlrm_gradient_parity():
    import types

    # apex is fully stubbed by conftest.py (shared, order-independent)
    root = REF + "/Recommendation/DLRM"
    if root not in sys.path:
        sys.path.insert(0, root)
    cuda_ext = types.ModuleType("dlrm.cuda_ext")
    cuda_ext.dotBasedInteract = lambda *a: None
    fge = types.ModuleType("dlrm.cuda_ext.fused_gather_embedding")
    fge.BuckleEmbeddingFusedGatherFunction = object
    cuda_ext.fused_gather_embedding = fge
    sys.modules.setdefault("dlrm.cuda_ext", cuda_ext)
    sys.modules.setdefault("dlrm.cuda_ext.fused_gather_embedding", fge)

    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        from dlrm.nn import parts as ref_parts
        from dlrm.nn.interactions import DotInteraction

        from deeplearningexamples_tpu.models.dlrm.model import Dlrm, DlrmConfig
        from deeplearningexamples_tpu.utils.torch_import import convert_dlrm

        fp.seed_all(30)
        rng = np.random.default_rng(31)
        cards = tuple(int(c) for c in rng.integers(10, 200, 26))
        bottom = ref_parts.DlrmBottom(
            num_numerical_features=13, categorical_feature_sizes=list(cards),
            bottom_mlp_sizes=[512, 256, 128], embedding_type="multi_table",
            embedding_dim=128, device="cpu",
        ).eval()
        top = ref_parts.DlrmTop(
            top_mlp_sizes=[1024, 1024, 512, 256, 1],
            interaction=DotInteraction(26, 128),
        ).eval()

        cfg = DlrmConfig(categorical_cardinalities=cards)
        model = Dlrm(cfg, dtype=jnp.float32)

        def tensors(mod_list):
            return [w.detach().numpy() for w in mod_list]

        params = convert_dlrm(
            bottom_weights=tensors(bottom.mlp.weights),
            bottom_biases=tensors(bottom.mlp.biases),
            embedding_tables=tensors(bottom.embeddings.weights),
            top_weights=tensors(top.mlp.weights)
            + [top.out.weight.detach().numpy()],
            top_biases=tensors(top.mlp.biases)
            + [top.out.bias.detach().numpy()],
            total_rows=cfg.total_rows,
        )

        b = 8
        numerical = rng.standard_normal((b, 13)).astype(np.float32)
        categorical = np.stack(
            [rng.integers(0, c, b) for c in cards], axis=1).astype(np.int64)
        label = rng.integers(0, 2, b).astype(np.float32)

        num_t = torch.tensor(numerical, requires_grad=True)
        bottom_out, bottom_mlp_out = bottom(num_t, torch.tensor(categorical))
        ref_logit = top(bottom_out, bottom_mlp_out)[:, 0]
        ref_loss = torch.nn.BCEWithLogitsLoss()(ref_logit, torch.tensor(label))
        ref_loss.backward()

        import optax

        def loss_fn(p, num):
            logit = model.apply({"params": p}, num,
                                jnp.asarray(categorical, jnp.int32))
            return jnp.mean(
                optax.sigmoid_binary_cross_entropy(logit, jnp.asarray(label)))

        g_params, g_num = jax.grad(loss_fn, argnums=(0, 1))(
            params, jnp.asarray(numerical))

        # reference embeddings are sparse=True nn.Embedding
        # (embeddings.py:61) — densify the sparse grads; the .weights
        # property returns .data (detached), so read .weight.grad directly
        emb_grads = []
        for e in bottom.embeddings.embeddings:
            eg = e.weight.grad
            emb_grads.append((eg.to_dense() if eg.is_sparse else eg)
                             .detach().numpy())
        theirs = convert_dlrm(
            bottom_weights=[w.grad.detach().numpy() for w in bottom.mlp.weights],
            bottom_biases=[bb.grad.detach().numpy() for bb in bottom.mlp.biases],
            embedding_tables=emb_grads,
            top_weights=[w.grad.detach().numpy() for w in top.mlp.weights]
            + [top.out.weight.grad.detach().numpy()],
            top_biases=[bb.grad.detach().numpy() for bb in top.mlp.biases]
            + [top.out.bias.grad.detach().numpy()],
            total_rows=cfg.total_rows,
        )
        assert_grad_tree_close(g_params, theirs, prefix="dlrm")
        np.testing.assert_allclose(
            np.asarray(g_num), num_t.grad.numpy(), rtol=2e-3,
            atol=float(np.abs(num_t.grad.numpy()).max()) * 1e-4 + 1e-7)
    finally:
        torch.Tensor.cuda = orig_cuda


# ---------------------------------------------------------------------------
# Transformer NMT (fairseq) — grads through the shared embedding (input,
# both decoders' input, AND the tied output projection), the bias-free
# attention projections, and the flash-attention backward on both the
# padded-key encoder path and the causal decoder path.
# ---------------------------------------------------------------------------

from test_reference_parity import nmt_ref  # noqa: E402,F401  (fixture)


def test_transformer_nmt_gradient_parity(nmt_ref):
    import argparse

    from deeplearningexamples_tpu.models.translation import (
        TransformerConfig, TransformerTask,
    )
    from deeplearningexamples_tpu.utils.torch_import import (
        convert_nmt_transformer,
    )

    fp.seed_all(60)
    V, D, FF, H, L = 512, 64, 128, 4, 2
    PAD, EOS = 1, 2
    args = argparse.Namespace(
        src_vocab_size=V, tgt_vocab_size=V, padding_idx=PAD,
        encoder_embed_dim=D, encoder_ffn_embed_dim=FF,
        encoder_layers=L, encoder_attention_heads=H,
        decoder_layers=L, decoder_attention_heads=H,
        dropout=0.0, attention_dropout=0.0, relu_dropout=0.0,
        share_all_embeddings=True,
        fuse_dropout_add=False, fuse_relu_dropout=False,
        fuse_layer_norm=False,
        max_source_positions=64, max_target_positions=64,
    )
    ref = nmt_ref.TransformerModel.build_model(args).eval()

    cfg = TransformerConfig(
        vocab_size=V, d_model=D, d_ff=FF, num_heads=H,
        encoder_layers=L, decoder_layers=L, dropout=0.0, max_len=64,
        pad_id=PAD, eos_id=EOS,
    )
    task = TransformerTask(cfg, dtype=jnp.float32)
    params = convert_nmt_transformer(
        fp.sd_numpy(ref), L, L, cfg.padded_vocab)

    rng = np.random.default_rng(61)
    b, slen, tlen = 3, 10, 9
    src = rng.integers(4, V, (b, slen)).astype(np.int64)
    for i, n in enumerate([slen, 7, 5]):
        src[i, : slen - n] = PAD  # left-padded source
    tgt = rng.integers(4, V, (b, tlen)).astype(np.int64)
    for i, n in enumerate([tlen, 8, 6]):
        tgt[i, n:] = PAD
        tgt[i, n - 1] = EOS
    prev = np.concatenate([np.full((b, 1), EOS, np.int64),
                           tgt[:, :-1]], axis=1)
    prev[tgt == PAD] = PAD

    ref_logits, _ = ref(torch.tensor(src),
                        torch.tensor(np.array([slen, 7, 5])),
                        torch.tensor(prev))
    lp = torch.log_softmax(ref_logits.float(), dim=-1)
    t = torch.tensor(tgt).reshape(-1, 1)
    lp2 = lp.reshape(-1, V)
    non_pad = t.ne(PAD)
    nll = -lp2.gather(-1, t)[non_pad].sum()
    smooth = -lp2.sum(-1, keepdim=True)[non_pad].sum()
    ((1.0 - 0.1) * nll + (0.1 / V) * smooth).backward()
    theirs = convert_nmt_transformer(
        grad_state_dict(ref), L, L, cfg.padded_vocab)

    ntok = float((tgt != PAD).sum())
    batch = {
        "src": jnp.asarray(src, jnp.int32),
        "tgt": jnp.asarray(
            np.concatenate([np.full((b, 1), EOS, np.int64), tgt], axis=1),
            jnp.int32),
    }

    def loss_fn(p):
        # our loss is the per-token mean; the reference criterion is the sum
        return task.loss_fn(p, {}, batch, jax.random.key(0))[0] * ntok

    ours = jax.grad(loss_fn)(params)
    assert_grad_tree_close(ours, theirs, prefix="nmt")
