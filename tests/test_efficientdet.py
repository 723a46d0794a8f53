"""EfficientDet: anchors, box coding roundtrip, e2e synthetic training."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deeplearningexamples_tpu.models.efficientdet import (
    EfficientDetConfig,
    EfficientDetTask,
    _decode_boxes,
    _encode_boxes,
    efficientdet_anchors,
)

CFG = EfficientDetConfig(image_size=128, num_classes=8, fpn_width=32,
                         fpn_depth=2, head_depth=2)


def test_anchor_count_and_geometry():
    a = efficientdet_anchors(CFG)
    sizes = [128 // 2**l for l in range(3, 8)]
    assert len(a) == sum(s * s for s in sizes) * 9
    # first anchor is centered on the first stride-8 cell
    cx = (a[0, 0] + a[0, 2]) / 2
    cy = (a[0, 1] + a[0, 3]) / 2
    assert abs(cx - 4.0) < 1e-4 and abs(cy - 4.0) < 1e-4
    w = a[:, 2] - a[:, 0]
    h = a[:, 3] - a[:, 1]
    assert (w > 0).all() and (h > 0).all()


def test_box_coding_roundtrip():
    rng = np.random.default_rng(0)
    anchors = jnp.asarray(efficientdet_anchors(CFG)[:64])
    centers = rng.uniform(20, 100, (64, 2))
    sizes = rng.uniform(10, 40, (64, 2))
    gt = jnp.asarray(
        np.concatenate([centers - sizes / 2, centers + sizes / 2], 1), jnp.float32
    )
    deltas = _encode_boxes(anchors, gt)
    back = _decode_boxes(anchors, deltas)
    np.testing.assert_allclose(np.asarray(back), np.asarray(gt), atol=1e-3)


def _synthetic_batch(rng, bs=2, max_gt=8):
    s = CFG.image_size
    images = rng.normal(size=(bs, s, s, 3)).astype(np.float32)
    boxes = np.zeros((bs, max_gt, 4), np.float32)
    labels = np.zeros((bs, max_gt), np.int32)
    valid = np.zeros((bs, max_gt), bool)
    for i in range(bs):
        n = rng.integers(1, 5)
        c = rng.uniform(30, 90, (n, 2))
        wh = rng.uniform(15, 50, (n, 2))
        boxes[i, :n] = np.concatenate([c - wh / 2, c + wh / 2], 1)
        labels[i, :n] = rng.integers(0, CFG.num_classes, n)
        valid[i, :n] = True
    return {
        "image": jnp.asarray(images), "boxes": jnp.asarray(boxes),
        "labels": jnp.asarray(labels), "valid": jnp.asarray(valid),
    }


def test_efficientdet_trains_e2e():
    task = EfficientDetTask(CFG, jnp.float32, max_gt=8)
    params, mstate = task.init(jax.random.key(0))
    from deeplearningexamples_tpu.core.train import create_train_state, make_train_step

    tx = optax.adam(1e-3)
    state = create_train_state(params, tx, jax.random.key(1), mstate)
    step = make_train_step(task.loss_fn, tx, donate=False)
    rng = np.random.default_rng(0)
    batch = _synthetic_batch(rng)
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_efficientdet_predict_shapes():
    task = EfficientDetTask(CFG, jnp.float32, max_gt=8)
    params, mstate = task.init(jax.random.key(0))
    imgs = jnp.zeros((2, CFG.image_size, CFG.image_size, 3), jnp.float32)
    boxes, scores, labels, valid = jax.jit(
        lambda p, m, x: task.predict(p, m, x, max_out=10)
    )(params, mstate, imgs)
    assert boxes.shape == (2, 10, 4)
    assert scores.shape == (2, 10)
    assert labels.shape == (2, 10)
    assert valid.shape == (2, 10)


def test_efficientdet_cli_coco_eval(tmp_path):
    """--data-backend coco with a val split reports bbox mAP."""
    import json as _json

    from PIL import Image

    from deeplearningexamples_tpu.cli.main import cli

    rng = np.random.default_rng(0)
    for split in ("train2017", "val2017"):
        (tmp_path / split).mkdir()
    (tmp_path / "annotations").mkdir()
    for split in ("train2017", "val2017"):
        images, annotations = [], []
        for i in range(2):
            name = f"{split}_{i}.jpg"
            Image.fromarray(
                rng.integers(0, 255, (100, 100, 3), dtype=np.uint8)
            ).save(tmp_path / split / name, "JPEG")
            images.append({"id": i, "file_name": name,
                           "width": 100, "height": 100})
            annotations.append({
                "id": i, "image_id": i, "category_id": 1,
                "bbox": [20, 20, 50, 50], "iscrowd": 0, "area": 2500,
            })
        doc = {"images": images, "annotations": annotations,
               "categories": [{"id": 1, "name": "thing"}]}
        (tmp_path / "annotations" / f"instances_{split}.json").write_text(
            _json.dumps(doc))
    ws = tmp_path / "ws"
    cli([
        "efficientdet", "--data-backend", "coco", "--data-dir", str(tmp_path),
        "--batch-size", "2", "--epochs", "1", "--image-size", "128",
        "--lr", "1e-3", "--workspace", str(ws), "--amp", "false",
        "--rng-impl", "threefry",
    ])
    assert "val.bbox_mAP" in (ws / "efficientdet_raport.json").read_text()
