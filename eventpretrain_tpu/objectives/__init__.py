from eventpretrain_tpu.objectives.rec import reconstruct_loss
from eventpretrain_tpu.objectives.contrastive import (
    init_queue,
    init_local_queue,
    token_infonce_queue,
    token_infonce_queue_local,
    global_token_infonce,
)
from eventpretrain_tpu.objectives.cls import cls_loss
