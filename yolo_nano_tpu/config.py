"""Typed configuration — single source of truth for anchors/thresholds.

The reference scatters configuration between data/config.py (anchors,
IGNORE_THRESH) and per-script argparse defaults that drift from each other
(reference eval.py:27-30 parses thresholds and never uses them). Here a single
frozen dataclass feeds model build, training, and eval.

Anchor tables match reference data/config.py:11-17 (k-means on VOC/COCO at
~512px scale, pixel units).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

# reference data/config.py:3
IGNORE_THRESH = 0.5

# reference data/config.py:11-13 (VOC, 9 anchors, 3 per stride level)
MULTI_ANCHOR_SIZE = (
    (30.65, 39.12), (50.3, 102.62), (94.98, 64.55),
    (93.5, 177.51), (165.25, 113.85), (161.83, 240.95),
    (304.64, 150.34), (251.28, 306.53), (369.38, 261.55),
)

# reference data/config.py:15-17 (COCO)
MULTI_ANCHOR_SIZE_COCO = (
    (11.89, 14.24), (30.14, 35.62), (45.99, 87.04),
    (92.23, 44.43), (130.78, 99.73), (78.99, 170.81),
    (290.39, 123.89), (165.27, 233.33), (332.57, 279.8),
)

# ShuffleNetV2 channel tables, reference backbone/shufflenetv2.py:95-102
SHUFFLENETV2_CHANNELS = {
    "0.5x": (24, 48, 96, 192, 1024),
    "1.0x": (24, 116, 232, 464, 1024),
    "1.5x": (24, 176, 352, 704, 1024),
    "2.0x": (24, 244, 488, 976, 2048),
}
SHUFFLENETV2_REPEATS = (4, 8, 4)  # reference backbone/shufflenetv2.py:90


@dataclasses.dataclass(frozen=True)
class YoloNanoConfig:
    """Static model/build configuration (hashable → usable as a jit static arg)."""

    num_classes: int = 20
    backbone: str = "1.0x"  # any of SHUFFLENETV2_CHANNELS keys
    anchors: Tuple[Tuple[float, float], ...] = MULTI_ANCHOR_SIZE
    strides: Tuple[int, ...] = (8, 16, 32)  # reference models/yolo_nano.py:23
    neck_channels: int = 96  # reference models/yolo_nano.py:40-47
    ignore_thresh: float = IGNORE_THRESH
    # postprocess (reference models/yolo_nano.py:13 defaults)
    conf_thresh: float = 0.001
    nms_thresh: float = 0.50
    diou_nms: bool = False
    # fixed-shape on-device NMS budget
    nms_pre_topk: int = 512   # candidates entering NMS (per image)
    max_detections: int = 128  # final detections per image
    # compute dtype for activations ("float32" or "bfloat16")
    compute_dtype: str = "float32"

    @property
    def num_anchors_per_level(self) -> int:
        return len(self.anchors) // len(self.strides)

    @property
    def backbone_channels(self) -> Tuple[int, ...]:
        return SHUFFLENETV2_CHANNELS[self.backbone]

    @property
    def head_out_channels(self) -> int:
        # A * (1 + C + 4), reference models/yolo_nano.py:55
        return self.num_anchors_per_level * (1 + self.num_classes + 4)

    def num_cells(self, input_size: int) -> int:
        """Total grid cells Σ (H/s · W/s) across levels for a square input."""
        return sum((input_size // s) * (input_size // s) for s in self.strides)

    def num_predictions(self, input_size: int) -> int:
        """Total predictions N = Σ HW·A across levels."""
        return self.num_cells(input_size) * self.num_anchors_per_level
