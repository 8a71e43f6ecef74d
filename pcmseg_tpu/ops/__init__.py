from pcmseg_tpu.ops.losses import (  # noqa: F401
    dice_loss,
    bce_loss,
    bce_dice_loss,
    tversky_loss,
    focal_loss,
    focal_dice_loss,
)
from pcmseg_tpu.ops.metrics import dice_score, iou_score  # noqa: F401
from pcmseg_tpu.ops.surface import (  # noqa: F401
    assd,
    hausdorff_distance,
    surface_dice,
    surface_distances,
)
