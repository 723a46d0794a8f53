"""QAT conv for the ConvNets family.

TPU-native equivalent of the reference's pytorch-quantization QAT flow
(``image_classification/quantization.py:31`` ``quantization_setup`` +
``:124`` ``initialize`` — fake-quant ``QuantConv2d`` wrappers, calibrate,
fine-tune). Here:

- kernel: per-out-channel symmetric int8 fake-quant (STE)
- input activations: dynamic per-tensor fake-quant (calibration-free
  stand-in for the reference's histogram-calibrated amax)

``QATConv`` creates the same parameter ("kernel", optional "bias", same
shapes/init) under the same module scope as ``nn.Conv``, so an fp32
checkpoint loads directly as the QAT starting point — the reference
fine-tunes from pretrained the same way. Training with it makes the
network robust to the int8 grid; the PTQ exporter
(``ops/quantization.py``) then serves it with real s8 MXU matmuls.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.quantization import fake_quantize, fake_quantize_per_tensor

__all__ = ["QATConv"]


class QATConv(nn.Module):
    """Drop-in for the ``nn.Conv`` usage in ResNet/EfficientNet (NHWC,
    HWIO kernels), with int8 fake-quant on kernel + input."""

    features: int
    kernel_size: tuple
    strides: Any = (1, 1)
    padding: Any = "SAME"
    feature_group_count: int = 1
    use_bias: bool = False
    dtype: Any = jnp.float32
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        ks = self.kernel_size
        ks = (ks, ks) if isinstance(ks, int) else tuple(ks)
        st = self.strides
        st = (st, st) if isinstance(st, int) else tuple(st)
        in_ch = x.shape[-1]
        kshape = ks + (in_ch // self.feature_group_count, self.features)
        kernel = self.param("kernel", self.kernel_init, kshape, jnp.float32)
        kernel = fake_quantize(kernel, -1)
        x = fake_quantize_per_tensor(x)
        pad = self.padding if isinstance(self.padding, str) else \
            tuple(map(tuple, self.padding))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=st, padding=pad,
            feature_group_count=self.feature_group_count,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,),
                              jnp.float32)
            y = y + bias.astype(self.dtype)
        return y
