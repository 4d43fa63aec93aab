from eventpretrain_tpu.ckpt.orbax_io import (
    save_checkpoint,
    restore_checkpoint,
    latest_step,
    wait_for_saves,
)
