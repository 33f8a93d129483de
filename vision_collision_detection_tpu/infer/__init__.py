from vision_collision_detection_tpu.infer.aot import (
    ServingBundle,
    export_bundle,
)
from vision_collision_detection_tpu.infer.predictor import CollisionPredictor

__all__ = ["CollisionPredictor", "ServingBundle", "export_bundle"]
