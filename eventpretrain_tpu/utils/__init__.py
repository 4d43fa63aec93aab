from eventpretrain_tpu.utils.logging import SmoothedValue, MetricLogger
