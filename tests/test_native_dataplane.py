"""Native C++ data plane tests: build, decode correctness vs PIL, batch API,
ImageNet folder loader end-to-end."""

import io
import os

import numpy as np
import pytest

from deeplearningexamples_tpu.native import DataPlane, available

pytestmark = pytest.mark.skipif(not available(), reason="no native toolchain")

from PIL import Image  # noqa: E402


def make_jpeg(w=64, h=48, seed=0, quality=95):
    rng = np.random.default_rng(seed)
    # smooth gradient image (JPEG-friendly, low compression error)
    x = np.linspace(0, 255, w)[None, :, None]
    y = np.linspace(0, 255, h)[:, None, None]
    img = np.clip(x * 0.5 + y * 0.5 + rng.normal(0, 2, (h, w, 3)), 0, 255)
    buf = io.BytesIO()
    Image.fromarray(img.astype(np.uint8)).save(buf, "JPEG", quality=quality)
    return buf.getvalue(), img.astype(np.uint8)


def test_jpeg_info():
    data, _ = make_jpeg(100, 70)
    plane = DataPlane(2)
    assert plane.jpeg_info(data) == (100, 70)
    with pytest.raises(ValueError):
        plane.jpeg_info(b"not a jpeg")


def test_full_image_decode_matches_pil():
    data, _ = make_jpeg(64, 64)
    plane = DataPlane(2)
    crops = np.asarray([[0, 0, 1, 1]], np.float32)
    flips = np.zeros(1, np.int32)
    out = plane.decode_batch([data], crops, flips, 64, mean=(0, 0, 0), std=(1, 1, 1))
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"), np.float32) / 255.0
    # identity crop + same size -> near-exact (bilinear at pixel centers)
    assert np.abs(out[0] - ref).mean() < 0.02


def test_flip_and_normalize():
    data, _ = make_jpeg(32, 32)
    plane = DataPlane(1)
    crops = np.asarray([[0, 0, 1, 1]], np.float32)
    out = plane.decode_batch([data], crops, np.zeros(1, np.int32), 32,
                             mean=(0, 0, 0), std=(1, 1, 1))
    out_f = plane.decode_batch([data], crops, np.ones(1, np.int32), 32,
                               mean=(0, 0, 0), std=(1, 1, 1))
    np.testing.assert_allclose(out[0], out_f[0][:, ::-1], atol=1e-6)
    # normalization applies (x - mean) / std
    out_n = plane.decode_batch([data], crops, np.zeros(1, np.int32), 32,
                               mean=(0.5, 0.5, 0.5), std=(0.25, 0.25, 0.25))
    np.testing.assert_allclose(out_n[0], (out[0] - 0.5) / 0.25, atol=1e-5)


def test_crop_region():
    data, raw = make_jpeg(64, 64)
    plane = DataPlane(1)
    # crop right-bottom quadrant at native resolution
    crops = np.asarray([[0.5, 0.5, 0.5, 0.5]], np.float32)
    out = plane.decode_batch([data], crops, np.zeros(1, np.int32), 32,
                             mean=(0, 0, 0), std=(1, 1, 1))
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"), np.float32) / 255.0
    ref_crop = ref[32:, 32:]
    assert np.abs(out[0] - ref_crop).mean() < 0.03


def test_batch_with_corrupt_image():
    data, _ = make_jpeg(32, 32)
    plane = DataPlane(2)
    crops = np.tile(np.asarray([[0, 0, 1, 1]], np.float32), (3, 1))
    flips = np.zeros(3, np.int32)
    with pytest.warns(UserWarning, match="failed to decode"):
        out = plane.decode_batch([data, b"garbage", data], crops, flips, 32,
                                 mean=(0, 0, 0), std=(1, 1, 1))
    assert np.all(out[1] == 0)
    assert np.any(out[0] != 0) and np.any(out[2] != 0)


def test_imagenet_loader_end_to_end(tmp_path):
    from deeplearningexamples_tpu.data.imagenet import ImageNetLoader

    for split in ("train", "val"):
        for ci, cls in enumerate(["n01440764", "n01443537"]):
            d = tmp_path / split / cls
            d.mkdir(parents=True)
            for i in range(4):
                data, _ = make_jpeg(80 + 8 * ci, 60, seed=i)
                (d / f"img_{i}.JPEG").write_bytes(data)
    loader = ImageNetLoader(str(tmp_path), "train", batch_size=4, image_size=32,
                            shard=(0, 1), n_threads=2)
    assert len(loader) == 2
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["image"].shape == (4, 32, 32, 3)
    assert set(np.unique(np.concatenate([b["label"] for b in batches]))) <= {0, 1}
    # val split deterministic
    val = ImageNetLoader(str(tmp_path), "val", batch_size=4, image_size=32,
                         shard=(0, 1), n_threads=2)
    v1 = next(iter(val))["image"]
    v2 = next(iter(val))["image"]
    np.testing.assert_allclose(v1, v2)
