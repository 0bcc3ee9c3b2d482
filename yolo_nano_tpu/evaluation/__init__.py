from yolo_nano_tpu.evaluation.voc_eval import voc_ap, voc_eval_class  # noqa: F401
from yolo_nano_tpu.evaluation.coco_eval import COCOEval  # noqa: F401
from yolo_nano_tpu.evaluation.evaluator import (  # noqa: F401
    VOCEvaluator,
    COCOEvaluator,
)
