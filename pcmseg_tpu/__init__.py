"""pcmseg_tpu — TPU-native multimodal prostate MRI segmentation framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of the PyTorch
reference ``qwertyhgb/Prostate-Cancer-Multimodal-Segmentation``: 5-modality
3D U-Net segmentation of prostate lesions (BPH / PCA cohorts) with NIfTI/MHA
ingest, missing-modality strategies, Dice / BCE+Dice losses, single-split and
K-fold cross-validation training, checkpoint/resume, per-case validation,
sliding-window full-volume prediction, and a unified check/train/validate/
predict CLI — designed TPU-first (bf16 compute, jit/pjit data-parallel
sharding over a device mesh, cross-replica BatchNorm via GSPMD global-batch
semantics, host-side prefetching pipelines, Pallas-fused hot ops).

See /root/repo/SURVEY.md for the structural analysis of the reference this
framework was built to (capability parity, not a port).
"""

__version__ = "0.1.0"

from pcmseg_tpu.core.config import Config, get_config  # noqa: F401
