from yolo_nano_tpu.utils.fuse_bn import fold_bn  # noqa: F401
