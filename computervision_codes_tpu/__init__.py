"""TPU-native surgical-video recognition framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
CIAM-Group/ComputerVision_Codes (MT4MTLKD + TERL tracks): CholecT45/50
action-triplet and phase recognition, multi-teacher knowledge distillation,
tail-enhanced contrastive representation learning, and full-video temporal
modeling — built TPU-first (SPMD meshes, functional transforms, static
shapes, Pallas kernels for the hot paths).

Layout:
  data/     dataset index, split tables, label parsing, host input pipeline,
            cached-feature bus (the reference's inter-stage pickle protocol)
  metrics/  ivtmetrics-parity per-video AP machinery
  models/   Flax modules: ResNet, Swin, Q2L, MS-TCT, causal TCN+FPN, MoCo
  ops/      Pallas TPU kernels + XLA reference implementations
  losses/   weighted BCE, DistillKL, MSE-KD, ASL, KCL/KCLProto, component-max
  train/    optax schedules, SAM/ImbSAM, jitted train/eval steps, checkpoints
  parallel/ device mesh + sharding (dp/seq axes), collective helpers
  cli/      per-track entry points mirroring the reference drivers
"""

__version__ = "0.1.0"
