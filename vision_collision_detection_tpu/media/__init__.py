from vision_collision_detection_tpu.media.decoder import (
    MediaError,
    VideoInfo,
    decode_frames,
    encode_video,
    probe,
)
from vision_collision_detection_tpu.media.sampler import sample_clip_indices
from vision_collision_detection_tpu.media.sensors import (
    load_synced_sensor,
    peak_acceleration_time,
    read_sensor_csv,
)

__all__ = [
    "MediaError",
    "VideoInfo",
    "decode_frames",
    "encode_video",
    "probe",
    "sample_clip_indices",
    "load_synced_sensor",
    "peak_acceleration_time",
    "read_sensor_csv",
]
