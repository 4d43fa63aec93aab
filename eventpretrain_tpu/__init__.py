"""eventpretrain_tpu: a TPU-native (JAX/XLA/Pallas) framework for self-supervised
pre-training on event-camera data.

Re-designed from scratch with the capabilities of BIT-Vision/EventPretrain
(ACM MM 2025, arXiv 2508.05507): three-stage pre-training (difference-guided
masked modeling -> backbone-fixed feature transition -> focus-aimed contrastive
learning) plus downstream classification / semantic segmentation / optical-flow
finetuning, built TPU-first:

- event->tensor rasterization as batched XLA/Pallas scatter kernels
- flax models with separate jittable ``encode_masked`` / ``encode_dense`` paths
- losses as pure objective functions (not buried in module ``forward``)
- data parallelism via ``jax.sharding`` over a device ``Mesh`` (global-view jit)
- functional queue/EMA state, optax optimizers with layer-wise lr decay

Array conventions
-----------------
* image-like tensors are channels-last ``(..., H, W, C)``
* event streams are fixed-capacity ``(E, 4)`` float32 ``[x, y, t, p]`` arrays,
  time-sorted, padded at the tail; a scalar int32 ``count`` gives the number of
  valid leading events.
"""

__version__ = "0.1.0"
