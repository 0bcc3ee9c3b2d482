from yolo_nano_tpu.data.transforms import (  # noqa: F401
    train_transform,
    color_transform,
    val_transform,
    letterbox_undo,
    IMAGE_MEAN,
    IMAGE_STD,
)
from yolo_nano_tpu.data.voc import VOCDataset, VOC_CLASSES  # noqa: F401
from yolo_nano_tpu.data.coco import COCODataset  # noqa: F401
from yolo_nano_tpu.data.loader import DetectionLoader, pad_targets  # noqa: F401
