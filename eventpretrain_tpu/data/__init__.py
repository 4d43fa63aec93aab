from eventpretrain_tpu.data.event_transforms import (
    random_window,
    rescale_coords,
    erase_and_add_events,
    add_noise_events,
    pad_events,
)
