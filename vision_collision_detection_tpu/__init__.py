"""TPU-native dashcam collision-detection framework.

A brand-new JAX / XLA / Pallas / pjit framework with the capabilities of
``getnexar/vision_collision_detection`` (see ``/root/repo/SURVEY.md``): it
classifies 5-second dashcam clips into Normal / Near Collision / Collision
with a per-frame CNN backbone + pluggable temporal aggregation head, trained
data-parallel over a TPU mesh with fused on-device preprocessing.

Subpackages
-----------
- ``media``     C++ (FFmpeg) video decode/probe/encode + clip sampling + IMU sync
- ``data``      metadata/CSV pipeline, datasets, splits, host loader → device feed
- ``ops``       fused XLA/Pallas preprocessing & augmentation over [B,T,H,W,C]
- ``models``    flax backbones (convnext/resnet/mobilenet/efficientnet) +
                temporal heads (attention | conv | pool | rnn/lstm/gru) + ViViT
- ``train``     jitted train/eval steps, AdamW+cosine, mini-val cascade trainer
- ``parallel``  Mesh + shard_map data parallelism, sharded eval + all_gather
- ``metrics``   accuracy, per-class P/R/F1, weighted OvR AUC (sklearn-free)
- ``ckpt``      orbax checkpoints: epoch/best/last + hyperparams contract + resume
- ``infer``     checkpoint → predict(paths|dir) → probabilities; sliding window
- ``obs``       logging, history CSV/JSON, plots, live dashboard
- ``cli``       train / infer / grid-search entry points
"""

from vision_collision_detection_tpu.version import __version__

# Default class map — mirrors the reference's label contract
# (/root/reference/nexar_train.py:1145, /root/reference/nexar_inference.py:243).
CLASS_NAMES = ("Normal", "Near Collision", "Collision")
CLASS_TO_INDEX = {name: i for i, name in enumerate(CLASS_NAMES)}

__all__ = ["__version__", "CLASS_NAMES", "CLASS_TO_INDEX"]
