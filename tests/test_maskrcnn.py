"""Mask R-CNN: anchors, samplers, box coder, e2e synthetic training."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deeplearningexamples_tpu.models.maskrcnn import (
    MaskRCNNConfig,
    MaskRCNNTask,
    _random_subset,
    fpn_anchors,
)
from deeplearningexamples_tpu.ops.detection import decode_boxes, encode_boxes

CFG = MaskRCNNConfig(
    image_size=128, num_classes=6, fpn_width=32, head_fc_dim=64,
    rpn_pre_nms_top_n=200, rpn_post_nms_top_n=64,
    rpn_batch_per_image=64, roi_batch_per_image=32,
)


def test_fpn_anchor_layout():
    anchors = fpn_anchors(CFG)
    assert len(anchors) == 5
    for k, (a, stride) in enumerate(zip(anchors, CFG.strides)):
        n = CFG.image_size // stride
        assert a.shape == (n * n * 3, 4)
        # first cell center at stride/2; aspect 1.0 anchor is square
        sq = a[1]  # aspect_ratios[1] == 1.0
        w, h = sq[2] - sq[0], sq[3] - sq[1]
        np.testing.assert_allclose(w, h, rtol=1e-5)
        np.testing.assert_allclose(w, 32.0 * 2**k, rtol=1e-5)


def test_box_coder_weights_roundtrip():
    rng = np.random.default_rng(0)
    tl = rng.uniform(10, 60, (32, 2))
    anchors = jnp.asarray(
        np.concatenate([tl, tl + rng.uniform(8, 40, (32, 2))], axis=1),
        jnp.float32,
    )
    gt = jnp.asarray(np.stack([
        rng.uniform(5, 60, 32), rng.uniform(5, 60, 32),
        rng.uniform(70, 120, 32), rng.uniform(70, 120, 32),
    ], axis=1), jnp.float32)
    w = (10.0, 10.0, 5.0, 5.0)
    back = decode_boxes(anchors, encode_boxes(anchors, gt, w), w)
    np.testing.assert_allclose(np.asarray(back), np.asarray(gt), atol=1e-3)


def test_random_subset_static_sampler():
    mask = jnp.zeros(100, bool).at[jnp.asarray([3, 17, 42])].set(True)
    idx, ok = _random_subset(jax.random.key(0), mask, 8)
    assert int(ok.sum()) == 3  # only 3 True available
    picked = set(np.asarray(idx)[np.asarray(ok)].tolist())
    assert picked == {3, 17, 42}
    # oversupply: picks exactly k, all from the mask
    mask2 = jnp.ones(100, bool)
    idx2, ok2 = _random_subset(jax.random.key(1), mask2, 8)
    assert int(ok2.sum()) == 8 and len(set(np.asarray(idx2).tolist())) == 8


def _synthetic_batch(rng, bs=2, max_gt=4, mg=32):
    s = CFG.image_size
    images = rng.normal(size=(bs, s, s, 3)).astype(np.float32)
    boxes = np.zeros((bs, max_gt, 4), np.float32)
    labels = np.zeros((bs, max_gt), np.int32)
    valid = np.zeros((bs, max_gt), bool)
    masks = np.zeros((bs, max_gt, mg, mg), np.float32)
    for i in range(bs):
        n = int(rng.integers(1, max_gt))
        c = rng.uniform(30, 90, (n, 2))
        wh = rng.uniform(20, 60, (n, 2))
        boxes[i, :n] = np.concatenate([c - wh / 2, c + wh / 2], 1)
        labels[i, :n] = rng.integers(0, CFG.num_classes - 1, n)
        valid[i, :n] = True
        for g in range(n):
            x1, y1, x2, y2 = (boxes[i, g] * mg / s).astype(int)
            masks[i, g, max(y1, 0):y2, max(x1, 0):x2] = 1.0
    return {
        "image": jnp.asarray(images), "boxes": jnp.asarray(boxes),
        "labels": jnp.asarray(labels), "valid": jnp.asarray(valid),
        "masks": jnp.asarray(masks),
    }


def test_maskrcnn_trains_e2e():
    from deeplearningexamples_tpu.core.train import create_train_state, make_train_step

    task = MaskRCNNTask(CFG, jnp.float32)
    params, mstate = task.init(jax.random.key(0))
    tx = optax.adam(1e-4)
    state = create_train_state(params, tx, jax.random.key(1), mstate)
    step = make_train_step(task.loss_fn, tx, donate=False)
    batch = _synthetic_batch(np.random.default_rng(0))
    losses = []
    for _ in range(6):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses
    for k in ("rpn_cls", "rpn_box", "cls_loss", "box_loss", "mask_loss"):
        assert np.isfinite(float(metrics[k]))


def test_maskrcnn_predict_shapes():
    task = MaskRCNNTask(CFG, jnp.float32)
    params, mstate = task.init(jax.random.key(0))
    imgs = jnp.zeros((1, CFG.image_size, CFG.image_size, 3), jnp.float32)
    boxes, scores, labels, valid, masks = jax.jit(
        lambda p, m, x: task.predict(p, m, x, max_out=8)
    )(params, mstate, imgs)
    assert boxes.shape == (1, 8, 4)
    assert scores.shape == (1, 8)
    assert labels.shape == (1, 8)
    assert valid.shape == (1, 8)
    assert masks.shape == (1, 8, 28, 28)
    assert bool(jnp.all((masks >= 0) & (masks <= 1)))


def test_maskrcnn_cli_coco_eval(tmp_path):
    """--data-backend coco: trains on the polygon fixture and reports
    bbox + segm mAP on the val split (the reference test_net.py flow)."""
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
                "segmentation": [[20, 20, 70, 20, 70, 70, 20, 70]],
            })
        doc = {"images": images, "annotations": annotations,
               "categories": [{"id": 1, "name": "thing"}]}
        (tmp_path / "annotations" / f"instances_{split}.json").write_text(
            _json.dumps(doc))

    ws = tmp_path / "ws"
    cli([
        "maskrcnn", "--data-backend", "coco", "--data-dir", str(tmp_path),
        "--batch-size", "2", "--epochs", "1", "--image-size", "128",
        "--lr", "1e-3", "--workspace", str(ws), "--amp", "false",
        "--rng-impl", "threefry",
    ])
    report = (ws / "maskrcnn_raport.json").read_text()
    assert "val.bbox_mAP" in report and "val.segm_mAP" in report
