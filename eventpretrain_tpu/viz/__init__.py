from eventpretrain_tpu.viz.previews import (
    make_events_preview,
    make_events_preview_norm,
    make_events_preview_rgb_norm,
    flow_to_image,
    semseg_to_color,
)
from eventpretrain_tpu.viz.panels import (
    save_reconstruction_panel,
    save_cls_panel,
    save_semseg_panel,
    save_flow_panel,
    save_feature_panel,
    save_con_panel,
    save_ecdp_panel,
    save_rec_con_panel,
)
