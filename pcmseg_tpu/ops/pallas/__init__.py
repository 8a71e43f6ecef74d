"""Pallas TPU kernels.

conv3d: fused 3x3x3 conv (+bias+ReLU epilogue) for the folded serving
path, selectable via ``config.pallas_inference`` (models/unet3d.py).

Two further kernels (a fused Dice loss with custom VJP and a
scale-shift-ReLU epilogue) were built, measured IN-STEP on the real chip,
and deleted: the fused dice made the full 128^3 train step 24% *slower*
(375.9 vs 285.8 ms — XLA already fuses the jnp dice's three reductions
into the backward pipeline), and nothing reachable used the epilogue after
BN folding. Measurement recorded in BENCH.md; per the
no-production-unreachable-kernels rule they're gone rather than shipped
dark.
"""

from pcmseg_tpu.ops.pallas.conv3d import conv3x3x3  # noqa: F401
