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
