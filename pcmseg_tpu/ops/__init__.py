from pcmseg_tpu.ops.losses import dice_loss, bce_loss, bce_dice_loss  # noqa: F401
from pcmseg_tpu.ops.metrics import dice_score, iou_score  # noqa: F401
