from vision_collision_detection_tpu.ops.letterbox import (
    letterbox_geometry,
    letterbox_resize,
)
from vision_collision_detection_tpu.ops.preprocess import (
    make_eval_preprocess,
    make_train_preprocess,
    normalize_video,
)
from vision_collision_detection_tpu.ops.augment import (
    augment_batch,
    augment_clip,
    sample_clip_params,
)

__all__ = [
    "letterbox_geometry",
    "letterbox_resize",
    "make_eval_preprocess",
    "make_train_preprocess",
    "normalize_video",
    "augment_batch",
    "augment_clip",
    "sample_clip_params",
]
