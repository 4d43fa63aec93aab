from eventpretrain_tpu.train.optim import (
    cosine_warmup_schedule,
    build_optimizer,
    layer_scale_tree,
    weight_decay_mask,
    frozen_except_norm_mask,
)
from eventpretrain_tpu.train.state import TrainState
