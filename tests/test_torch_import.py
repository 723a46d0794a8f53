"""Checkpoint import parity: our BERT vs HuggingFace torch BERT numerics,
and ResNet-50 state_dict remap mechanics."""

import numpy as np
import pytest


def randn(*shape):
    return (0.03 * np.random.randn(*shape)).astype(np.float32)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _import_hf_bert():
    """transformers 4.57 lazy-loads submodules; a transient failure (seen
    once mid-suite on this 1-core host) leaves a poisoned partial module in
    sys.modules that then fails every later import. Clear and retry once."""
    import sys

    try:
        from transformers import BertConfig, BertModel
    except ImportError:
        for name in [m for m in sys.modules if m.startswith("transformers")]:
            del sys.modules[name]
        from transformers import BertConfig, BertModel
    return BertConfig, BertModel

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from deeplearningexamples_tpu.utils.torch_import import (  # noqa: E402
    convert_bert,
    convert_resnet50,
    load_torch_state_dict,
)


def test_bert_forward_matches_huggingface():
    """Gold parity test: identical weights -> identical encoder outputs."""
    HFConfig, HFBert = _import_hf_bert()

    from deeplearningexamples_tpu.models.bert import BertConfig, BertModel

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
        hidden_dropout=0.0, attention_dropout=0.0,
        gelu_approximate=False,  # HF uses exact erf GELU
    )
    model = BertModel(cfg, dtype=jnp.float32)
    params = convert_bert(
        {k: v.numpy() for k, v in hf.state_dict().items()},
        cfg.padded_vocab, cfg.num_layers,
    )

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 128, (2, 10))
    mask = np.ones((2, 10), np.int64)
    mask[1, 7:] = 0

    with torch.no_grad():
        hf_out = hf(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
        )
    seq, pooled = model.apply(
        {"params": params},
        jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        jnp.zeros_like(jnp.asarray(ids, jnp.int32)),
        deterministic=True,
    )
    # compare only valid (unmasked) positions
    ours = np.asarray(seq)
    theirs = hf_out.last_hidden_state.numpy()
    for b in range(2):
        valid = mask[b].astype(bool)
        np.testing.assert_allclose(
            ours[b][valid], theirs[b][valid], atol=2e-4, rtol=2e-4
        )
    np.testing.assert_allclose(
        np.asarray(pooled), hf_out.pooler_output.numpy(), atol=2e-4, rtol=2e-4
    )


def test_resnet50_state_dict_remap(tmp_path):
    """Build a reference-keyed random state_dict, convert, and check it
    loads into our ResNet-50 with exactly matching tree structure/shapes."""
    from deeplearningexamples_tpu.models.convnets import resnet50

    model = resnet50(dtype=jnp.float32)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)),
                           train=False)
    )

    # synthesize torch-layout state dict from our shapes (reverse mapping)
    sd = {}

    def add_bn(prefix, shape):
        c = shape[0]
        sd[f"{prefix}.weight"] = randn(c)
        sd[f"{prefix}.bias"] = randn(c)
        sd[f"{prefix}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{prefix}.running_var"] = np.ones(c, np.float32)

    p = variables["params"]
    sd["conv1.weight"] = randn(*np.asarray(p["conv1"]["kernel"].shape)[[3, 2, 0, 1]])
    add_bn("bn1", (64,))
    for li, n in enumerate([3, 4, 6, 3]):
        for bi in range(n):
            dst = p[f"layer{li + 1}_{bi}"]
            src = f"layer{li + 1}.{bi}"
            for ci in (1, 2, 3):
                k = dst[f"conv{ci}"]["kernel"].shape
                sd[f"{src}.conv{ci}.weight"] = randn(k[3], k[2], k[0], k[1])
                add_bn(f"{src}.bn{ci}", (k[3],))
            if "downsample_conv" in dst:
                k = dst["downsample_conv"]["kernel"].shape
                sd[f"{src}.downsample.0.weight"] = randn(k[3], k[2], k[0], k[1])
                add_bn(f"{src}.downsample.1", (k[3],))
    sd["fc.weight"] = randn(1000, 2048)
    sd["fc.bias"] = randn(1000)

    # roundtrip through an actual .pth.tar file with DDP prefixes
    ckpt = {"state_dict": {f"module.{k}": torch.tensor(v) for k, v in sd.items()},
            "epoch": 3, "best_prec1": 76.9}
    path = tmp_path / "model.pth.tar"
    torch.save(ckpt, path)
    loaded = load_torch_state_dict(str(path))
    params, stats = convert_resnet50(loaded)

    expect_p = jax.tree_util.tree_map(lambda x: x.shape, variables["params"])
    got_p = jax.tree_util.tree_map(lambda x: tuple(np.asarray(x).shape), params)
    assert expect_p == got_p
    expect_s = jax.tree_util.tree_map(lambda x: x.shape, variables["batch_stats"])
    got_s = jax.tree_util.tree_map(lambda x: tuple(np.asarray(x).shape), stats)
    assert expect_s == got_s

    # converted weights run
    logits = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.zeros((1, 64, 64, 3)), train=False,
    )
    assert np.isfinite(np.asarray(logits)).all()


def test_bert_tf_checkpoint_import(tmp_path):
    """TF v1 checkpoint importer (reference load_tf_weights_in_bert,
    modeling.py:61): write HF torch weights into a TF-named v1 bundle and
    assert the TF path reproduces the torch conversion exactly."""
    tf = pytest.importorskip("tensorflow")
    HFConfig, HFBert = _import_hf_bert()

    from deeplearningexamples_tpu.utils.torch_import import (
        convert_bert_tf, load_bert_encoder,
    )

    hf = HFBert(HFConfig(
        vocab_size=64, hidden_size=16, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=32,
    )).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    torch_params = convert_bert({k: v for k, v in sd.items()}, 64, 2)

    # torch name/layout -> TF name/layout (dense kernels transpose to
    # (in, out); LayerNorm weight/bias -> gamma/beta)
    def tf_name(k):
        k = "bert/" + k.replace(".", "/")
        k = k.replace("embeddings/word_embeddings/weight",
                      "embeddings/word_embeddings")
        k = k.replace("embeddings/position_embeddings/weight",
                      "embeddings/position_embeddings")
        k = k.replace("embeddings/token_type_embeddings/weight",
                      "embeddings/token_type_embeddings")
        k = k.replace("encoder/layer/", "encoder/layer_")
        k = k.replace("LayerNorm/weight", "LayerNorm/gamma")
        k = k.replace("LayerNorm/bias", "LayerNorm/beta")
        k = k.replace("/weight", "/kernel")
        # HF names dense submodules ".dense"; TF BERT self-attention doesn't
        k = k.replace("attention/self/query/", "attention/self/query/")
        return k

    tf_vars = {}
    for k, v in sd.items():
        name = tf_name(k)
        if name.endswith("/kernel") and v.ndim == 2:
            v = v.T
        tf_vars[name] = v

    ckpt = str(tmp_path / "model.ckpt")
    with tf.Graph().as_default():
        tvars = [tf.compat.v1.get_variable(n, initializer=v)
                 for n, v in tf_vars.items()]
        saver = tf.compat.v1.train.Saver(tvars)
        with tf.compat.v1.Session() as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            saver.save(sess, ckpt)

    tf_params = convert_bert_tf(ckpt, 64, 2)

    flat_t = jax.tree_util.tree_leaves_with_path(torch_params)
    flat_f = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(tf_params)
    )
    assert len(flat_t) == len(flat_f)
    for path, v in flat_t:
        np.testing.assert_array_equal(v, flat_f[jax.tree_util.keystr(path)],
                                      err_msg=jax.tree_util.keystr(path))

    # dispatcher picks the TF path by the .index sibling
    via_loader = load_bert_encoder(ckpt, 64, 2)
    np.testing.assert_array_equal(
        via_loader["pooler"]["kernel"], torch_params["pooler"]["kernel"]
    )
