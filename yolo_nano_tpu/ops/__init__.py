from yolo_nano_tpu.ops.nn import (  # noqa: F401
    conv2d,
    conv_bn,
    init_conv_bn,
    init_conv,
    max_pool_3x3_s2,
    channel_shuffle,
    upsample2x_nearest,
    downsample2x_nearest,
    leaky_relu,
)
from yolo_nano_tpu.ops.decode import make_grids, decode_boxes, decode_xywh  # noqa: F401
from yolo_nano_tpu.ops.nms import batched_nms, nms_greedy  # noqa: F401
