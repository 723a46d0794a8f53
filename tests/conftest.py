"""Test config: run on a virtual 8-device CPU mesh.

This is the fake-backend multi-device capability the reference lacks
(SURVEY.md §4 implication): every sharding/collective path is exercised on
CPU with 8 XLA host devices, no TPU needed.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import sys  # noqa: E402
import types  # noqa: E402

# Reference-parity tests put /root/reference/PyTorch/* dirs on sys.path;
# several of those contain a ``triton/`` Triton-Inference-Server deployment
# folder that shadows the (absent) triton compiler package. torch._dynamo's
# lazy import (triggered by any torch.optim.Optimizer construction) then
# dies on ``triton.language``. Pre-register an inert stub; nothing in the
# test suite calls torch.compile.
if "triton" not in sys.modules:
    # a None entry makes ``import triton`` raise ImportError, so torch's
    # has_triton_package() correctly reports False
    sys.modules["triton"] = None

import jax  # noqa: E402

# The axon site hook may import jax before this conftest runs, freezing the
# platform choice; force CPU explicitly so tests never touch the TPU tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_threefry_partitionable", True)
