from yolo_nano_tpu.models.shufflenetv2 import (  # noqa: F401
    init_shufflenetv2,
    shufflenetv2_apply,
)
from yolo_nano_tpu.models.yolo_nano import (  # noqa: F401
    init_yolo_nano,
    forward_features,
    predict,
    loss_forward,
)
