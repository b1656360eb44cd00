"""medicalsemseg_tpu — a TPU-native 3D medical semantic-segmentation framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
PyTorch/MONAI repo (zouyunkai/MedicalSemSeg): Swin-family 3D transformer
encoders paired with UNETR-style decoders, Dice-family losses, Gaussian-blended
sliding-window inference, K-fold cross-validation and fold ensembling.

Design principles (TPU-first, not a port):
  * channels-last (B, D, H, W, C) layouts everywhere so XLA tiles convs and
    matmuls straight onto the MXU;
  * one jitted train step (fwd + loss + bwd + optim + metrics) with batch
    sharding over a `jax.sharding.Mesh` — DDP/GradScaler/SyncBN from the
    reference dissolve into `pjit` + `pmean`;
  * static shapes: volumes are bucketed/padded to canonical grids, the
    sliding-window grid is precomputed per bucket, pad voxels are masked;
  * explicit RNG key threading instead of global seeds;
  * bf16 compute with fp32 params/normalization by default.
"""

__version__ = "0.1.0"
