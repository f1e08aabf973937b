"""hiast_tpu — a TPU-native self-training framework for unsupervised
domain-adaptive semantic segmentation.

Re-designed from scratch for TPU (JAX / XLA / Pallas / pjit) with the
capabilities of HIAST ("Hard-aware Instance Adaptive Self-Training",
TPAMI 2025): instance-adaptive pseudo-label selection (IAS), hard-aware
pseudo-label augmentation (HPA cross-image copy-paste), region-adaptive
regularization (KLD smoothing / entropy sharpening), and EMA-teacher
consistency training — all as pure, jit-compiled array programs.

Layout
------
- ``config``    : dataclass config tree + 3-level YAML layering
- ``models``    : Flax modules (ResNet-101 OS8, ASPP, DeepLab-v2, discriminator)
- ``ops``       : pure array ops (losses, resize, metrics, color aug, Pallas kernels)
- ``pseudo``    : on-device pseudo-label policies (IAS / CBST / CT / NT)
- ``selftrain`` : jit-compiled train steps + training orchestration
- ``data``      : host input pipeline (manifests, decode, remap, geometric aug, HPA)
- ``parallel``  : mesh / sharding helpers
- ``utils``     : checkpointing, logging, metrics recording
- ``cli``       : train / validate / generate_pseudo_labels entry points
"""

__version__ = "0.1.0"
