from eventpretrain_tpu.models import layers, vit, decoder
