from .efficientnet import EFFNET_ARCHS, EffNetArch, EfficientNet
from .resnet import ARCHS, ResNet, ResNetArch, resnet50, resnext101_32x4d, se_resnext101_32x4d
from .task import ClassificationTask


def build_model(arch: str, num_classes: int = 1000, dtype=None):
    """Arch-registry entry point (reference ``models/model.py:51-172``
    ``EntryPoint`` / ``available_models`` ``main.py:73-86``)."""
    import jax.numpy as jnp

    dtype = dtype if dtype is not None else jnp.bfloat16
    if arch in ARCHS:
        return ResNet(ARCHS[arch], num_classes, dtype)
    if arch in EFFNET_ARCHS:
        return EfficientNet(EFFNET_ARCHS[arch], num_classes, dtype)
    raise KeyError(f"unknown arch {arch!r}; available: "
                   f"{sorted(ARCHS) + sorted(EFFNET_ARCHS)}")
