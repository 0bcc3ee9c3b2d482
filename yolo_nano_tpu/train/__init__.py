from yolo_nano_tpu.train.schedule import warmup_step_schedule  # noqa: F401
from yolo_nano_tpu.train.state import TrainState, create_train_state  # noqa: F401
from yolo_nano_tpu.train.train_step import make_train_step  # noqa: F401
