from vision_collision_detection_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    create_mesh,
    maybe_initialize_distributed,
    sync_global_devices,
)
from vision_collision_detection_tpu.parallel.dp import (
    DataParallelStrategy,
    to_host_numpy,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "create_mesh",
    "maybe_initialize_distributed",
    "sync_global_devices",
    "DataParallelStrategy",
    "to_host_numpy",
]
