from vision_collision_detection_tpu.ckpt.checkpoint import (
    CheckpointStore,
    load_checkpoint,
)

__all__ = ["CheckpointStore", "load_checkpoint"]
