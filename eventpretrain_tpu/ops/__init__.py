from eventpretrain_tpu.ops.events import (
    events_to_voxel_grid,
    events_to_image_ecdp,
    events_to_image_mem,
    events_to_evrep,
    remove_hot_pixels,
)
from eventpretrain_tpu.ops.reshape import (
    frame2emb,
    emb2frame,
    emb2patch_frame,
    patch_frame2emb,
    resize,
    resize_flow,
)
from eventpretrain_tpu.ops.pos_embed import get_2d_sincos_pos_embed
from eventpretrain_tpu.ops.masking import (
    random_masking,
    density_noise,
    make_mask_from_noise,
)
