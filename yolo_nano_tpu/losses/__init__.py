from yolo_nano_tpu.losses.losses import detection_loss  # noqa: F401
from yolo_nano_tpu.losses.targets import build_targets, build_targets_numpy  # noqa: F401
