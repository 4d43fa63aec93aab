from eventpretrain_tpu.eval.metrics import (
    topk_accuracy,
    confusion_matrix,
    miou_from_confusion,
    flow_error,
)
