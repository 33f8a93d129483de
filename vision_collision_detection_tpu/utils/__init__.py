from vision_collision_detection_tpu.utils.rng import (
    clip_keys,
    fold_in_host,
    make_rngs,
)
from vision_collision_detection_tpu.utils.registry import Registry

__all__ = ["clip_keys", "fold_in_host", "make_rngs", "Registry"]
