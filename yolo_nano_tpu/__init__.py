"""yolo_nano_tpu — a TPU-native (JAX/XLA/Pallas/pjit) object-detection framework.

A from-scratch rebuild of the capabilities of yjh0410/YOLO-Nano (reference at
/root/reference): ShuffleNetV2 backbone, FPN+PAN neck, 3-level anchor-based YOLO
head, VOC/COCO training and evaluation — redesigned TPU-first:

  * NHWC layout everywhere, params as functional pytrees, one XLA graph per
    (resolution, batch) bucket.
  * Decode + score + per-class NMS run ON DEVICE, batched, with fixed shapes
    (the reference runs them in host numpy at batch size 1,
    reference models/yolo_nano.py:245-279,361-376).
  * Target assignment is vectorized inside the jitted train step (the reference
    loops over ground-truth boxes in host numpy, reference tools.py:97-216).
  * Data parallelism via jax.sharding.Mesh + NamedSharding; gradient/batch-norm
    reductions compile to XLA collectives over ICI.
  * Conv+BN folding applied to the parameter pytree at trace time for inference.
"""

__version__ = "0.1.0"

from yolo_nano_tpu.config import (  # noqa: F401
    YoloNanoConfig,
    MULTI_ANCHOR_SIZE,
    MULTI_ANCHOR_SIZE_COCO,
    IGNORE_THRESH,
)
