"""AutoAugment ImageNet policy.

Reference: ``image_classification/autoaugment.py`` (``AutoaugmentImageNetPolicy``
:6) — the 24 sub-policy ImageNet schedule from Cubuk et al., applied to PIL
images before tensor conversion (used by the EfficientNet recipes). Each
sub-policy is two (op, probability, magnitude) stages.
"""

from __future__ import annotations

import random

import numpy as np
from PIL import Image, ImageEnhance, ImageOps

__all__ = ["AutoAugmentImageNetPolicy"]


def _shear_x(img, mag):
    return img.transform(img.size, Image.AFFINE, (1, mag, 0, 0, 1, 0))


def _shear_y(img, mag):
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, mag, 1, 0))


def _translate_x(img, mag):
    return img.transform(img.size, Image.AFFINE, (1, 0, mag * img.size[0], 0, 1, 0))


def _translate_y(img, mag):
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, 0, 1, mag * img.size[1]))


OPS = {
    "shearX": (_shear_x, np.linspace(0, 0.3, 10)),
    "shearY": (_shear_y, np.linspace(0, 0.3, 10)),
    "translateX": (_translate_x, np.linspace(0, 150 / 331, 10)),
    "translateY": (_translate_y, np.linspace(0, 150 / 331, 10)),
    "rotate": (lambda im, m: im.rotate(m), np.linspace(0, 30, 10)),
    "color": (lambda im, m: ImageEnhance.Color(im).enhance(1 + m),
              np.linspace(-0.9, 0.9, 10)),
    "posterize": (lambda im, m: ImageOps.posterize(im, int(m)),
                  np.round(np.linspace(8, 4, 10)).astype(int)),
    "solarize": (lambda im, m: ImageOps.solarize(im, int(m)),
                 np.linspace(256, 0, 10)),
    "contrast": (lambda im, m: ImageEnhance.Contrast(im).enhance(1 + m),
                 np.linspace(-0.9, 0.9, 10)),
    "sharpness": (lambda im, m: ImageEnhance.Sharpness(im).enhance(1 + m),
                  np.linspace(-0.9, 0.9, 10)),
    "brightness": (lambda im, m: ImageEnhance.Brightness(im).enhance(1 + m),
                   np.linspace(-0.9, 0.9, 10)),
    "autocontrast": (lambda im, m: ImageOps.autocontrast(im), [0] * 10),
    "equalize": (lambda im, m: ImageOps.equalize(im), [0] * 10),
    "invert": (lambda im, m: ImageOps.invert(im), [0] * 10),
}

# (op, prob, magnitude_idx) pairs — the published ImageNet policy
IMAGENET_POLICY = [
    (("posterize", 0.4, 8), ("rotate", 0.6, 9)),
    (("solarize", 0.6, 5), ("autocontrast", 0.6, 5)),
    (("equalize", 0.8, 8), ("equalize", 0.6, 3)),
    (("posterize", 0.6, 7), ("posterize", 0.6, 6)),
    (("equalize", 0.4, 7), ("solarize", 0.2, 4)),
    (("equalize", 0.4, 4), ("rotate", 0.8, 8)),
    (("solarize", 0.6, 3), ("equalize", 0.6, 7)),
    (("posterize", 0.8, 5), ("equalize", 1.0, 2)),
    (("rotate", 0.2, 3), ("solarize", 0.6, 8)),
    (("equalize", 0.6, 8), ("posterize", 0.4, 6)),
    (("rotate", 0.8, 8), ("color", 0.4, 0)),
    (("rotate", 0.4, 9), ("equalize", 0.6, 2)),
    (("equalize", 0.0, 7), ("equalize", 0.8, 8)),
    (("invert", 0.6, 4), ("equalize", 1.0, 8)),
    (("color", 0.6, 4), ("contrast", 1.0, 8)),
    (("rotate", 0.8, 8), ("color", 1.0, 2)),
    (("color", 0.8, 8), ("solarize", 0.8, 7)),
    (("sharpness", 0.4, 7), ("invert", 0.6, 8)),
    (("shearX", 0.6, 5), ("equalize", 1.0, 9)),
    (("color", 0.4, 0), ("equalize", 0.6, 3)),
    (("equalize", 0.4, 7), ("solarize", 0.2, 4)),
    (("solarize", 0.6, 5), ("autocontrast", 0.6, 5)),
    (("invert", 0.6, 4), ("equalize", 1.0, 8)),
    (("color", 0.6, 4), ("contrast", 1.0, 8)),
]


class AutoAugmentImageNetPolicy:
    def __init__(self, rng: random.Random | None = None):
        self.rng = rng or random.Random()

    def __call__(self, img: Image.Image) -> Image.Image:
        policy = IMAGENET_POLICY[self.rng.randrange(len(IMAGENET_POLICY))]
        for name, prob, mag_idx in policy:
            if self.rng.random() < prob:
                fn, mags = OPS[name]
                img = fn(img, mags[mag_idx])
        return img
