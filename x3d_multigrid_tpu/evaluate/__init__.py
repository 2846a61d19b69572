from x3d_multigrid_tpu.evaluate.metrics import APMeter, top1_accuracy
from x3d_multigrid_tpu.evaluate.multiview import (
    multiview_softmax_top1, multiview_max_probs,
)

__all__ = [
    "APMeter",
    "top1_accuracy",
    "multiview_softmax_top1",
    "multiview_max_probs",
]
