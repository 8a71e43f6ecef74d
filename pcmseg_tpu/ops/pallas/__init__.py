from pcmseg_tpu.ops.pallas.dice import fused_dice_loss, dice_partials  # noqa: F401
from pcmseg_tpu.ops.pallas.fused_norm_relu import scale_shift_relu  # noqa: F401
