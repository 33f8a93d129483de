from vision_collision_detection_tpu.obs.logging_utils import setup_logging
from vision_collision_detection_tpu.obs.history import TrainingHistory

__all__ = ["setup_logging", "TrainingHistory"]
