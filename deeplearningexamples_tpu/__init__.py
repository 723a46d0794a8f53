"""deeplearningexamples_tpu — a TPU-native JAX framework.

A from-scratch rebuild of the capabilities of NVIDIA/DeepLearningExamples'
flagship recipes (ResNet-50 v1.5 / ConvNets, SSD300, BERT, Tacotron2+WaveGlow,
DLRM) as one shared train/infer harness, designed TPU-first:

- bf16 mixed precision (no GradScaler) with fp32 master params in optimizer state
- SPMD over ``jax.sharding.Mesh`` (data/model/sequence axes) instead of NCCL+DDP
- Pallas kernels for the hot ops (flash attention, fused LAMB, DLRM dot
  interaction, embedding gathers) instead of CUDA extensions
- host-parallel preprocessing + double-buffered device prefetch instead of DALI

Layer map follows SURVEY.md §1: core/ is L2 (harness) + L5 (dist) + L7
(observability), models/ is L3, data/ is L4, ops/ is L6.
"""

__version__ = "0.1.0"
