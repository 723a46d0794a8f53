"""ImageNet input pipeline (DALI-equivalent, host-native).

Mirrors the reference's DALI pipelines (``image_classification/
dataloaders.py``: ``HybridTrainPipe`` :80-154 with RandomResizedCrop
:128-136 + CropMirrorNormalize :138-145; ``HybridValPipe`` :157-205 resize-
shorter-256 + center-crop) on the host: the C++ data plane
(``native/dataplane.cc``) does fused JPEG decode + crop + resize + normalize
on a thread pool; this module owns dataset listing, per-host sharding
(the ``DistributedSampler`` / DALI ``shard_id`` role, ``dataloaders.py:
106-112,439-444``), shuffling, and RRC parameter sampling.

Layout: standard ``train/<wnid>/*.JPEG`` class folders.
"""

from __future__ import annotations

import os
from typing import Iterator

import jax
import numpy as np

__all__ = ["ImageNetLoader", "sample_rrc_params"]

MEAN = (0.485, 0.456, 0.406)
STD = (0.229, 0.224, 0.225)


def sample_rrc_params(
    rng: np.random.Generator,
    n: int,
    scale=(0.08, 1.0),
    ratio=(3 / 4, 4 / 3),
) -> np.ndarray:
    """RandomResizedCrop fractions (x, y, w, h), torchvision/DALI semantics:
    sample area*scale and aspect in log-uniform ratio; fall back to center."""
    out = np.empty((n, 4), np.float32)
    for i in range(n):
        for _ in range(10):
            area = rng.uniform(*scale)
            log_ratio = rng.uniform(np.log(ratio[0]), np.log(ratio[1]))
            r = np.exp(log_ratio)
            w = np.sqrt(area * r)
            h = np.sqrt(area / r)
            if w <= 1.0 and h <= 1.0:
                x = rng.uniform(0, 1.0 - w)
                y = rng.uniform(0, 1.0 - h)
                out[i] = (x, y, w, h)
                break
        else:
            s = min(1.0, float(np.sqrt(scale[1])))
            out[i] = ((1 - s) / 2, (1 - s) / 2, s, s)
    return out


class ImageNetLoader:
    """Iterates {"image": (B, S, S, 3) f32, "label": (B,) i32} numpy batches."""

    def __init__(
        self,
        data_dir: str,
        split: str,
        batch_size: int,
        image_size: int = 224,
        seed: int = 0,
        drop_last: bool = True,
        n_threads: int | None = None,
        shard: tuple[int, int] | None = None,  # (index, count); default by process
    ):
        from ..native import DataPlane

        self.plane = DataPlane(n_threads)
        self.batch_size = batch_size
        self.image_size = image_size
        self.split = split
        self.seed = seed
        self.epoch = 0

        root = os.path.join(data_dir, split)
        classes = sorted(
            d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
        )
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        samples: list[tuple[str, int]] = []
        for c in classes:
            cdir = os.path.join(root, c)
            for f in sorted(os.listdir(cdir)):
                if f.lower().endswith((".jpeg", ".jpg")):
                    samples.append((os.path.join(cdir, f), self.class_to_idx[c]))
        if shard is None:
            shard = (jax.process_index(), jax.process_count())
        idx, count = shard
        self.samples = samples[idx::count]
        self.drop_last = drop_last

    def __len__(self) -> int:
        n = len(self.samples) // self.batch_size
        return n if self.drop_last else -(-len(self.samples) // self.batch_size)

    def __iter__(self) -> Iterator[dict]:
        rng = np.random.default_rng(self.seed + self.epoch)
        self.epoch += 1
        order = rng.permutation(len(self.samples)) if self.split == "train" else (
            np.arange(len(self.samples))
        )
        bs = self.batch_size
        for start in range(0, len(order) - bs + 1, bs):
            batch_idx = order[start : start + bs]
            jpegs, labels = [], []
            for i in batch_idx:
                path, label = self.samples[i]
                with open(path, "rb") as f:
                    jpegs.append(f.read())
                labels.append(label)
            if self.split == "train":
                crops = sample_rrc_params(rng, bs)
                flips = (rng.random(bs) < 0.5).astype(np.int32)
            else:
                # resize-shorter-to-256 + center crop 224 expressed as a
                # central fractional crop of size image_size/256
                frac = self.image_size / 256.0
                crops = np.tile(
                    np.asarray(
                        [(1 - frac) / 2, (1 - frac) / 2, frac, frac], np.float32
                    ),
                    (bs, 1),
                )
                flips = np.zeros(bs, np.int32)
            images = self.plane.decode_batch(
                jpegs, crops, flips, self.image_size, MEAN, STD
            )
            yield {"image": images, "label": np.asarray(labels, np.int32)}
