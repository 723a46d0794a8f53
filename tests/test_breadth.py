"""Breadth components: NCF, AutoAugment, SSD eval driver."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from deeplearningexamples_tpu.models.ncf import NcfConfig, NcfTask, hit_rate_ndcg


def test_ncf_train_and_rank():
    from deeplearningexamples_tpu.core.train import create_train_state, make_train_step

    cfg = NcfConfig(nb_users=50, nb_items=40, mf_dim=8,
                    mlp_layer_sizes=(16, 16, 8))
    task = NcfTask(cfg, dtype=jnp.float32)
    params, _ = task.init(jax.random.key(0))
    tx = optax.adam(1e-2)
    state = create_train_state(params, tx, jax.random.key(1))
    step = make_train_step(task.loss_fn, tx, donate=False)
    rng = np.random.default_rng(0)
    # positives: user i likes item i % 40
    users = np.arange(50, dtype=np.int32)
    batch = {
        "user": jnp.asarray(np.concatenate([users, users])),
        "item": jnp.asarray(np.concatenate([users % 40, (users + 7) % 40]).astype(np.int32)),
        "label": jnp.asarray(np.concatenate([np.ones(50), np.zeros(50)]).astype(np.float32)),
    }
    losses = []
    for _ in range(30):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.8

    eval_batch = {
        "user": jnp.asarray(users),
        "pos_item": jnp.asarray((users % 40).astype(np.int32)),
        "neg_items": jnp.asarray(rng.integers(0, 40, (50, 20)).astype(np.int32)),
    }
    metrics = task.metric_fn(state.params, {}, eval_batch)
    assert 0 <= float(metrics["hr@10"]) <= 1
    assert float(metrics["ndcg@10"]) <= float(metrics["hr@10"]) + 1e-6


def test_hit_rate_ndcg_exact():
    # positive score 5 vs negatives [9, 1, 1]: rank 1 -> in top10, ndcg 1/log2(3)
    scores = jnp.asarray([[5.0, 9.0, 1.0, 1.0]])
    hr, ndcg = hit_rate_ndcg(scores, k=10)
    assert float(hr) == 1.0
    assert float(ndcg) == pytest.approx(1 / np.log2(3))
    hr1, _ = hit_rate_ndcg(scores, k=1)
    assert float(hr1) == 0.0


def test_autoaugment_produces_valid_images():
    import random

    from PIL import Image

    from deeplearningexamples_tpu.data.autoaugment import AutoAugmentImageNetPolicy

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    policy = AutoAugmentImageNetPolicy(random.Random(0))
    changed = False
    for _ in range(10):
        out = policy(img)
        assert out.size == img.size and out.mode == "RGB"
        if np.any(np.asarray(out) != np.asarray(img)):
            changed = True
    assert changed


def test_ssd_eval_driver():
    from deeplearningexamples_tpu.models.ssd import SSDTask
    from deeplearningexamples_tpu.models.ssd.evaluate import evaluate_ssd

    task = SSDTask(num_classes=4, dtype=jnp.float32)
    params, mstate = task.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    gt_boxes = np.asarray([[0.2, 0.2, 0.5, 0.5]], np.float32)
    batches = [{
        "image": jnp.asarray(rng.normal(size=(1, 300, 300, 3)), jnp.float32),
        "gt": [(0, gt_boxes, np.asarray([1]))],
    }]
    res = evaluate_ssd(task, params, mstate, batches, score_thresh=0.9)
    assert set(res) == {"mAP", "mAP50"}
    assert 0.0 <= res["mAP"] <= 1.0


def test_jasper_ctc_trains():
    from deeplearningexamples_tpu.core.train import create_train_state, make_train_step
    from deeplearningexamples_tpu.models.asr import (
        JasperBlock, JasperConfig, JasperTask, greedy_ctc_decode,
    )

    cfg = JasperConfig(
        n_mels=16, vocab_size=6,
        blocks=(
            JasperBlock(1, 32, 7, 0.0, residual=False, stride=2),
            JasperBlock(2, 32, 7, 0.0),
            JasperBlock(1, 48, 1, 0.0, residual=False),
        ),
    )
    task = JasperTask(cfg, dtype=jnp.float32)
    params, mstate = task.init(jax.random.key(0), t=32)
    tx = optax.adam(3e-3)
    state = create_train_state(params, tx, jax.random.key(1), mstate)
    step = make_train_step(task.loss_fn, tx, donate=False)
    rng = np.random.default_rng(0)
    batch = {
        "feats": jnp.asarray(rng.normal(size=(2, 32, 16)), jnp.float32),
        "feat_paddings": jnp.zeros((2, 32)),
        "labels": jnp.asarray([[1, 2, 3, 0], [4, 5, 0, 0]], jnp.int32),
        "label_paddings": jnp.asarray([[0, 0, 0, 1], [0, 0, 1, 1]], jnp.float32),
    }
    losses = []
    for _ in range(40):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.5

    logp = task.model.apply({"params": state.params, **state.model_state},
                            batch["feats"], train=False)
    decoded = greedy_ctc_decode(np.asarray(logp))
    assert decoded[0][:3] == [1, 2, 3]  # memorized transcript


def test_greedy_ctc_decode_collapses():
    from deeplearningexamples_tpu.models.asr import greedy_ctc_decode

    lp = np.full((1, 6, 4), -10.0)
    for t, tok in enumerate([1, 1, 0, 2, 2, 3]):
        lp[0, t, tok] = 0.0
    assert greedy_ctc_decode(lp) == [[1, 2, 3]]


def test_transformer_xl_memory_helps():
    """Segment recurrence: predicting a repeating sequence is easier with
    memory of the previous segment than without."""
    from deeplearningexamples_tpu.core.train import create_train_state, make_train_step
    from deeplearningexamples_tpu.models.transformer_xl import (
        TransformerXLConfig, TransformerXLTask,
    )

    cfg = TransformerXLConfig(vocab_size=20, d_model=32, n_heads=2, d_head=16,
                              d_ff=64, n_layers=2, seg_len=8, mem_len=8)
    task = TransformerXLTask(cfg, dtype=jnp.float32)
    params, _ = task.init(jax.random.key(0))

    # stream: fixed period-16 pattern split into two 8-token segments;
    # segment B is only predictable FROM MEMORY of segment A
    rng = np.random.default_rng(0)
    pattern = rng.integers(1, 20, 16)
    seg_a = np.tile(pattern[:8], (2, 1)).astype(np.int32)
    seg_b = np.tile(pattern[8:], (2, 1)).astype(np.int32)

    tx = optax.adam(3e-3)
    state = create_train_state(params, tx, jax.random.key(1),
                               {"mems": None})
    step = make_train_step(task.loss_fn, tx, donate=False)
    losses_b = []
    for _ in range(30):
        # feed A then B, carrying memory through model_state
        state, _ = step(state, {"tokens": jnp.asarray(seg_a),
                                "targets": jnp.asarray(seg_b)})
        state, m = step(state, {"tokens": jnp.asarray(seg_b),
                                "targets": jnp.asarray(seg_a)})
        losses_b.append(float(m["loss"]))
    assert losses_b[-1] < losses_b[0] * 0.7

    # shapes: logits tied to padded vocab; mems rotate at mem_len
    logits, mems = task.model.apply(
        {"params": state.params}, jnp.asarray(seg_a), None
    )
    assert logits.shape == (2, 8, cfg.padded_vocab)
    assert len(mems) == 2 and mems[0].shape == (2, 8, 32)


def test_rel_shift_semantics():
    from deeplearningexamples_tpu.models.transformer_xl import _rel_shift

    # rel_shift aligns position scores so row i attends distance (klen-1-j+i)
    x = jnp.arange(1 * 1 * 2 * 4, dtype=jnp.float32).reshape(1, 1, 2, 4)
    y = np.asarray(_rel_shift(x))
    # row 0 shifts left by 1 relative to row 1 (standard XL trick)
    assert y.shape == (1, 1, 2, 4)
    assert y[0, 0, 0, 0] == x[0, 0, 0, 1]


def test_tft_forecast_learns_pattern():
    from deeplearningexamples_tpu.core.train import create_train_state, make_train_step
    from deeplearningexamples_tpu.models.tft import TFTConfig, TFTTask, quantile_loss

    cfg = TFTConfig(n_observed=2, n_known=1, hidden=16, n_heads=2,
                    encoder_len=16, horizon=4)
    task = TFTTask(cfg)
    params, _ = task.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    # target = known future covariate scaled by 2 (fully predictable)
    known = rng.normal(size=(4, 20, 1)).astype(np.float32)
    batch = {
        "observed": rng.normal(size=(4, 16, 2)).astype(np.float32),
        "known": known,
        "target": (2.0 * known[:, 16:, 0]).astype(np.float32),
    }
    tx = optax.adam(5e-3)
    state = create_train_state(params, tx, jax.random.key(1))
    step = make_train_step(task.loss_fn, tx, donate=False)
    losses = []
    for _ in range(60):
        state, m = step(state, jax.tree.map(jnp.asarray, batch))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.5
    pred = task.predict_fn(state.params, jnp.asarray(batch["observed"]),
                           jnp.asarray(batch["known"]))
    assert pred.shape == (4, 4, 3)
    # quantile monotonicity after training (p10 <= p50 <= p90 mostly)
    p = np.asarray(pred)
    assert (p[..., 0] <= p[..., 2] + 0.3).mean() > 0.9


def test_quantile_loss_pinball():
    from deeplearningexamples_tpu.models.tft import quantile_loss

    pred = jnp.zeros((1, 1, 2))
    target = jnp.ones((1, 1))
    # q=0.9 penalizes under-prediction 9x more than q=0.1... check ratio
    l_hi = float(quantile_loss(pred, target, (0.9,)))
    l_lo = float(quantile_loss(pred, target, (0.1,)))
    assert l_hi / l_lo == pytest.approx(9.0)


def test_dynunet_segmentation_learns():
    from deeplearningexamples_tpu.core.train import create_train_state, make_train_step
    from deeplearningexamples_tpu.models.unet import UNetConfig, UNetTask, dice_loss, focal_loss

    cfg = UNetConfig(spatial_rank=2, in_channels=1, n_classes=2,
                     base_filters=8, depth=2)
    task = UNetTask(cfg, dtype=jnp.float32)
    params, _ = task.init(jax.random.key(0), patch=32)
    # segment a bright square on noise
    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 32, 32, 1)).astype(np.float32)
    lbl = np.zeros((2, 32, 32), np.int32)
    img[:, 8:24, 8:24, 0] += 3.0
    lbl[:, 8:24, 8:24] = 1
    batch = {"image": jnp.asarray(img), "label": jnp.asarray(lbl)}
    tx = optax.adam(3e-3)
    state = create_train_state(params, tx, jax.random.key(1))
    step = make_train_step(task.loss_fn, tx, donate=False)
    for _ in range(40):
        state, m = step(state, batch)
    metrics = task.metric_fn(state.params, {}, batch)
    assert float(metrics["dice"]) > 0.9  # learns the square

    # 3D path builds and runs
    cfg3 = UNetConfig(spatial_rank=3, in_channels=1, n_classes=2,
                      base_filters=4, depth=2)
    t3 = UNetTask(cfg3, dtype=jnp.float32)
    p3, _ = t3.init(jax.random.key(0), patch=16)
    out = t3.model.apply({"params": p3}, jnp.zeros((1, 16, 16, 16, 1)))
    assert out.shape == (1, 16, 16, 16, 2)


def test_focal_loss_downweights_easy():
    from deeplearningexamples_tpu.models.unet import focal_loss

    easy = jnp.asarray([[5.0, -5.0]])  # confident correct
    hard = jnp.asarray([[0.1, -0.1]])
    y = jnp.asarray([0])
    # focal reduces easy-example weight much more than CE would
    import optax as _optax
    ratio_focal = float(focal_loss(hard, y) / focal_loss(easy, y))
    ce = lambda lg: float(jnp.mean(_optax.softmax_cross_entropy_with_integer_labels(lg, y)))
    ratio_ce = ce(hard) / ce(easy)
    assert ratio_focal > ratio_ce * 10


def test_wav2vec2_pretraining_learns():
    from deeplearningexamples_tpu.core.train import create_train_state, make_train_step
    from deeplearningexamples_tpu.models.wav2vec2 import (
        Wav2Vec2Config, Wav2Vec2Task, sample_spans_mask,
    )

    cfg = Wav2Vec2Config(
        conv_layers=((32, 10, 5), (32, 3, 2), (32, 2, 2)),
        d_model=32, n_heads=2, n_layers=2, d_ff=64,
        n_groups=2, n_entries=16, codevector_dim=16,
        n_negatives=12, mask_span=4,
    )
    task = Wav2Vec2Task(cfg, dtype=jnp.float32)
    audio_len = 800
    params, _ = task.init(jax.random.key(0), audio_len=audio_len)
    frames = task._n_frames(audio_len)
    rng = np.random.default_rng(0)
    audio = rng.normal(size=(2, audio_len)).astype(np.float32) * 0.1
    mask = sample_spans_mask(rng, 2, frames, 0.3, 4)
    assert mask.any() and not mask.all()
    batch = {"audio": jnp.asarray(audio), "mask": jnp.asarray(mask)}
    tx = optax.adam(1e-3)
    state = create_train_state(params, tx, jax.random.key(1))
    step = make_train_step(task.loss_fn, tx, donate=False)
    losses = []
    for _ in range(25):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    # contrastive identification of own quantized latent improves
    assert losses[-1] < losses[0] * 0.8
    assert np.isfinite(losses).all()


def test_bart_denoising():
    from deeplearningexamples_tpu.core.train import create_train_state, make_train_step
    from deeplearningexamples_tpu.models.bart import (
        BartTask, bart_sentence_permute, bart_text_infilling,
    )
    from deeplearningexamples_tpu.models.translation import TransformerConfig

    rng = np.random.default_rng(0)
    doc = np.arange(10, 40, dtype=np.int32)
    corrupted = bart_text_infilling(doc, mask_token=3, rng=rng, mask_ratio=0.4)
    assert (corrupted == 3).sum() >= 1
    assert len(corrupted) <= len(doc) + 2  # spans collapse, maybe insertions

    sents = np.asarray([10, 11, 99, 20, 21, 99, 30, 99], np.int32)
    perm = bart_sentence_permute(sents, sep_token=99, rng=np.random.default_rng(5))
    assert sorted(perm.tolist()) == sorted(sents.tolist())
    assert perm.tolist() != sents.tolist() or True  # permutation may be identity

    cfg = TransformerConfig(vocab_size=64, d_model=32, d_ff=64, num_heads=2,
                            encoder_layers=2, decoder_layers=2, max_len=40)
    task = BartTask(cfg, dtype=jnp.float32, mask_token=3)
    params, _ = task.init(jax.random.key(0))
    docs = [rng.integers(4, 64, 20).astype(np.int32) for _ in range(4)]
    batch = task.make_denoising_batch(docs, seq_len=24, rng=rng)
    assert batch["src"].shape == (4, 24) and batch["tgt"].shape == (4, 26)

    tx = optax.adam(3e-3)
    state = create_train_state(params, tx, jax.random.key(1))
    step = make_train_step(task.loss_fn, tx, donate=False)
    losses = []
    for _ in range(30):
        b = task.make_denoising_batch(docs, seq_len=24, rng=rng)  # fresh noise
        state, m = step(state, jax.tree.map(jnp.asarray, b))
        losses.append(float(m["loss"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.8


def test_gpunet_archs_forward():
    from deeplearningexamples_tpu.models.convnets import GPUNET_ARCHS, GPUNet

    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    for name, arch in GPUNET_ARCHS.items():
        m = GPUNet(arch, num_classes=10, dtype=jnp.float32)
        variables = m.init(jax.random.key(0), x, train=False)
        y = m.apply(variables, x, train=False)
        assert y.shape == (1, 10), name
        n_params = sum(p.size for p in jax.tree_util.tree_leaves(variables["params"]))
        assert n_params > 1e6, (name, n_params)


def test_gpunet_trains():
    import optax

    from deeplearningexamples_tpu.core.train import create_train_state, make_train_step
    from deeplearningexamples_tpu.models.convnets import (
        ClassificationTask, build_model,
    )

    task = ClassificationTask(build_model("gpunet-0", 10, jnp.float32),
                              num_classes=10)
    params, mstate = task.init(jax.random.key(0), (64, 64, 3))
    tx = optax.sgd(0.05, momentum=0.9)
    state = create_train_state(params, tx, jax.random.key(1), mstate)
    step = make_train_step(task.loss_fn, tx, donate=False)
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(size=(4, 64, 64, 3)).astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, 10, 4).astype(np.int32)),
    }
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all() and losses[-1] < losses[0], losses


def test_wav2vec2_ctc_finetune_from_pretrained():
    """Fine-tune: pretrained params graft under the CTC model's w2v
    subtree bit-exactly, and CTC training learns a toy transcript
    (reference wav2vec2 finetune stage)."""
    import optax

    from deeplearningexamples_tpu.core.train import create_train_state, make_train_step
    from deeplearningexamples_tpu.models.asr import greedy_ctc_decode
    from deeplearningexamples_tpu.models.wav2vec2 import (
        Wav2Vec2Config, Wav2Vec2CtcTask, Wav2Vec2Task,
    )

    cfg = Wav2Vec2Config(
        conv_layers=((32, 10, 5), (32, 3, 2), (32, 2, 2)),
        d_model=32, n_heads=2, n_layers=2, d_ff=64,
        n_groups=2, n_entries=16, codevector_dim=16,
        n_negatives=12, mask_span=4, dropout=0.0,
    )
    pre = Wav2Vec2Task(cfg, dtype=jnp.float32)
    pre_params, _ = pre.init(jax.random.key(0), audio_len=800)

    task = Wav2Vec2CtcTask(cfg, vocab_size=6, dtype=jnp.float32,
                           mask_prob=0.0)
    params, _ = task.init(jax.random.key(1), audio_len=800,
                          pretrained=pre_params)
    # the pretrained subtree transfers bit-exactly
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(params["w2v"])[0]),
        np.asarray(jax.tree_util.tree_leaves(pre_params)[0]),
    )

    rng = np.random.default_rng(0)
    audio_len = 800
    frames = task._n_frames(audio_len)
    batch = {
        "audio": jnp.asarray(rng.normal(size=(2, audio_len)),
                             jnp.float32) * 0.1,
        "frame_paddings": jnp.zeros((2, frames)),
        "labels": jnp.asarray([[1, 2, 3, 0], [4, 5, 0, 0]], jnp.int32),
        "label_paddings": jnp.asarray([[0, 0, 0, 1], [0, 0, 1, 1]],
                                      jnp.float32),
    }
    tx = optax.adam(3e-3)
    state = create_train_state(params, tx, jax.random.key(2))
    step = make_train_step(task.loss_fn, tx, donate=False)
    losses = []
    for _ in range(60):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])
    logp = task.model.apply({"params": state.params}, batch["audio"])
    decoded = greedy_ctc_decode(np.asarray(logp))
    assert decoded[0][:3] == [1, 2, 3]  # memorized the transcript


def test_brats_unet3d_deep_supervision_trains():
    from deeplearningexamples_tpu.models.unet import BratsUNet3D

    model = BratsUNet3D(kernels=(3, 3, 3), strides=(1, 2, 2),
                        in_channels=2, n_classes=3, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 8, 8, 8, 2)),
                    jnp.float32)
    params = model.init(jax.random.key(0), x, train=True)["params"]
    heads = model.apply({"params": params}, x, train=True)
    # 3 levels -> 2 decoder outputs -> decoder_outputs[-3:-1] gives 1 ds
    # head (the reference slice), plus the main output
    assert len(heads) == 2
    assert heads[0].shape == (1, 8, 8, 8, 3)
    g = jax.grad(lambda p: sum(
        jnp.sum(h.astype(jnp.float32) ** 2)
        for h in model.apply({"params": p}, x, train=True)))(params)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))
