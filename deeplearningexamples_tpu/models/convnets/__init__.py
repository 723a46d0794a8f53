from .efficientnet import EFFNET_ARCHS, EffNetArch, EfficientNet
from .gpunet import GPUNET_ARCHS, GPUNet, GPUNetArch
from .resnet import ARCHS, ResNet, ResNetArch, resnet50, resnext101_32x4d, se_resnext101_32x4d
from .task import ClassificationTask


def build_model(arch: str, num_classes: int = 1000, dtype=None,
                quantized: bool = False):
    """Arch-registry entry point (reference ``models/model.py:51-172``
    ``EntryPoint`` / ``available_models`` ``main.py:73-86``).
    ``quantized`` enables QAT fake-quant convs (reference
    ``quantization.py initialize``), same parameter tree as fp32."""
    import jax.numpy as jnp

    dtype = dtype if dtype is not None else jnp.bfloat16
    if arch in ARCHS:
        return ResNet(ARCHS[arch], num_classes, dtype, quantized=quantized)
    if arch in EFFNET_ARCHS:
        return EfficientNet(EFFNET_ARCHS[arch], num_classes, dtype,
                            quantized=quantized)
    if arch in GPUNET_ARCHS:
        return GPUNet(GPUNET_ARCHS[arch], num_classes, dtype,
                      quantized=quantized)
    raise KeyError(f"unknown arch {arch!r}; available: "
                   f"{sorted(ARCHS) + sorted(EFFNET_ARCHS) + sorted(GPUNET_ARCHS)}")
