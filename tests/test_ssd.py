"""SSD300 tests: anchors, encode/decode roundtrip, NMS, loss, model shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeplearningexamples_tpu.models.ssd import (
    SSDTask,
    dboxes300_coco,
    decode_batch,
    encode,
    multibox_loss,
    nms_single,
)


def test_dboxes_count_and_range():
    db = dboxes300_coco()
    assert db.num_boxes == 8732  # reference anchor count
    # xywh is clamped to [0,1] (reference clamps xywh, not ltrb)
    assert np.all(db.xywh >= 0) and np.all(db.xywh <= 1)
    assert np.all(db.xywh[:, 2:] > 0)


def test_encode_decode_roundtrip():
    db = dboxes300_coco()
    gt = np.asarray([[0.1, 0.1, 0.4, 0.5], [0.5, 0.55, 0.9, 0.95]], np.float32)
    labels = np.asarray([3, 7])
    loc, cls = encode(db, gt, labels)
    assert loc.shape == (8732, 4) and cls.shape == (8732,)
    assert (cls > 0).sum() >= 2  # every gt owns >= 1 anchor
    assert set(np.unique(cls)) <= {0, 3, 7}

    # decoding the encoded offsets at matched anchors must recover the gt box
    decoded = np.asarray(decode_batch(db, jnp.asarray(loc)[None]))[0]
    for g, l in zip(gt, labels):
        idx = np.where(cls == l)[0]
        err = np.abs(decoded[idx] - g).max(axis=1).min()
        assert err < 1e-4, f"roundtrip error {err}"


def test_encode_empty_gt():
    db = dboxes300_coco()
    loc, cls = encode(db, np.zeros((0, 4), np.float32), np.zeros((0,), np.int64))
    assert (cls == 0).all() and (loc == 0).all()


def test_nms_suppresses_overlaps():
    boxes = np.asarray(
        [[0.1, 0.1, 0.5, 0.5], [0.12, 0.12, 0.52, 0.52], [0.6, 0.6, 0.9, 0.9]],
        np.float32,
    )
    scores = np.zeros((3, 3), np.float32)
    scores[:, 1] = [0.9, 0.8, 0.7]  # class 1
    b, l, s = nms_single(boxes, scores, criteria=0.5)
    assert len(b) == 2  # overlapping pair collapsed
    assert s[0] == pytest.approx(0.9)


def test_multibox_loss_mining():
    b, n, c = 2, 64, 5
    rng = np.random.default_rng(0)
    loc_pred = jnp.asarray(rng.normal(size=(b, n, 4)), jnp.float32)
    conf_pred = jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)
    loc_t = jnp.zeros((b, n, 4))
    cls_t = np.zeros((b, n), np.int32)
    cls_t[0, :4] = 1  # 4 positives in image 0; image 1 empty
    loss = multibox_loss(loc_pred, conf_pred, loc_t, jnp.asarray(cls_t))
    assert np.isfinite(float(loss)) and float(loss) > 0
    # empty image contributes nothing
    cls_both = cls_t.copy()
    cls_both[1, :4] = 2
    loss_both = multibox_loss(loc_pred, conf_pred, loc_t, jnp.asarray(cls_both))
    assert not np.allclose(float(loss), float(loss_both))


@pytest.mark.slow
def test_ssd_model_shapes():
    task = SSDTask(num_classes=81, dtype=jnp.float32)
    params, mstate = task.init(jax.random.key(0))
    x = jnp.zeros((1, 300, 300, 3))
    (loc, conf), _ = task.model.apply(
        {"params": params, **mstate}, x, train=True,
        mutable=list(mstate.keys()),
    )
    assert loc.shape == (1, 8732, 4)
    assert conf.shape == (1, 8732, 81)


def test_ssd_train_step():
    import optax
    from deeplearningexamples_tpu.core.train import create_train_state, make_train_step

    task = SSDTask(num_classes=5, dtype=jnp.float32)
    params, mstate = task.init(jax.random.key(0), image_size=300)
    tx = optax.sgd(1e-3, momentum=0.9)
    state = create_train_state(params, tx, jax.random.key(1), mstate)
    step = make_train_step(task.loss_fn, tx, donate=False)

    db = task.dboxes
    rng = np.random.default_rng(0)
    loc_t, cls_t = [], []
    for _ in range(2):
        gt = np.sort(rng.uniform(0.1, 0.9, (3, 4)).astype(np.float32), axis=-1)
        l, c = encode(db, gt, rng.integers(1, 5, 3))
        loc_t.append(l)
        cls_t.append(c)
    batch = {
        "image": jnp.asarray(rng.normal(size=(2, 300, 300, 3)), jnp.float32),
        "loc_targets": jnp.asarray(np.stack(loc_t)),
        "cls_targets": jnp.asarray(np.stack(cls_t)),
    }
    state, m = step(state, batch)
    l0 = float(m["loss"])
    for _ in range(3):
        state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    assert float(m["loss"]) < l0 * 2


def test_color_twist_reference_semantics():
    """DALI color-twist parity properties (reference coco_pipeline.py:63-93):
    identity at neutral params, brightness is a pure scale, contrast pivots
    at 128/255, hue/saturation leave gray pixels (I=Q=0) unchanged, and the
    full transform matches an independent numpy YIQ oracle."""
    import numpy as np

    from deeplearningexamples_tpu.models.ssd.task import (
        color_twist, sample_color_twist_params,
    )

    rng = np.random.default_rng(0)
    x = rng.uniform(0.1, 0.9, (2, 8, 8, 3)).astype(np.float32)
    ones = np.ones(2, np.float32)
    zeros = np.zeros(2, np.float32)

    # neutral params -> identity
    out = np.asarray(color_twist(jnp.asarray(x), zeros, ones, ones, ones))
    np.testing.assert_allclose(out, x, atol=1e-3)

    # brightness multiplies: b*(c0 + 1*(x-c0)) = b*x
    out = np.asarray(color_twist(jnp.asarray(x), zeros, ones, 1.1 * ones, ones))
    np.testing.assert_allclose(out, np.clip(1.1 * x, 0, 1), atol=1e-3)

    # contrast pivots at 128/255
    c0 = 128.0 / 255.0
    gray = np.full_like(x, c0)
    out = np.asarray(color_twist(jnp.asarray(gray), zeros, 1.5 * ones, ones,
                                 0.5 * ones))
    np.testing.assert_allclose(out, gray, atol=1e-3)  # fp32 YIQ roundtrip

    # gray pixels are hue/saturation invariant (I = Q = 0)
    out = np.asarray(color_twist(jnp.asarray(gray), 0.4 * ones, 1.5 * ones,
                                 ones, ones))
    np.testing.assert_allclose(out, gray, atol=1e-3)

    # full transform vs a numpy YIQ oracle
    hue = np.array([0.3, -0.5], np.float32)
    sat = np.array([0.6, 1.4], np.float32)
    bri = np.array([0.9, 1.1], np.float32)
    con = np.array([0.5, 1.5], np.float32)
    m = np.array([[0.299, 0.587, 0.114],
                  [0.596, -0.274, -0.321],
                  [0.211, -0.523, 0.311]])
    expect = np.empty_like(x)
    for b in range(2):
        yiq = x[b] @ m.T
        h = np.deg2rad(hue[b])
        i = sat[b] * (yiq[..., 1] * np.cos(h) - yiq[..., 2] * np.sin(h))
        q = sat[b] * (yiq[..., 1] * np.sin(h) + yiq[..., 2] * np.cos(h))
        rgb = np.stack([yiq[..., 0], i, q], -1) @ np.linalg.inv(m).T
        expect[b] = np.clip(bri[b] * (c0 + con[b] * (rgb - c0)), 0, 1)
    out = np.asarray(color_twist(jnp.asarray(x), jnp.asarray(hue),
                                 jnp.asarray(sat), jnp.asarray(bri),
                                 jnp.asarray(con)))
    np.testing.assert_allclose(out, expect, atol=1e-3)  # fp32 vs fp64 inv

    # sampled params live in the reference ranges
    p = sample_color_twist_params(jax.random.key(0), 64)
    assert (np.asarray(p["hue_deg"]) >= -0.5).all()
    assert (np.asarray(p["hue_deg"]) <= 0.5).all()
    assert (np.asarray(p["saturation"]) >= 0.5).all()
    assert (np.asarray(p["brightness"]) <= 1.125).all()
    assert (np.asarray(p["contrast"]) <= 1.5).all()
