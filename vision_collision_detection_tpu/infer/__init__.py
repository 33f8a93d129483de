from vision_collision_detection_tpu.infer.predictor import CollisionPredictor

__all__ = ["CollisionPredictor"]
