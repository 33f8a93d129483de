"""Device mesh construction + multi-host lifecycle.

TPU-native replacement for the reference's process-group machinery
(/root/reference/distributed_video_classifier.py:229-261: env:// NCCL
rendezvous, timeouts, rank pinning): a single-controller JAX program builds a
``jax.sharding.Mesh`` over all devices; multi-host jobs call
``jax.distributed.initialize`` once and the same SPMD program runs
everywhere. Collectives ride ICI inside compiled programs — no env-var kill
switches (NCCL_BLOCKING_WAIT et al., reference :232-234) are needed.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from vision_collision_detection_tpu.config import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def maybe_initialize_distributed() -> None:
    """Initialize the JAX coordination service when launched multi-host.

    Replaces torchrun's env:// rendezvous (reference
    distributed_video_classifier.py:237-244). Uses the standard JAX env vars
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID) and is a no-op for
    single-process runs or when already initialized.
    """
    addr = os.environ.get("COORDINATOR_ADDRESS")
    nproc = os.environ.get("NUM_PROCESSES")
    pid = os.environ.get("PROCESS_ID")
    if not (addr and nproc and pid):
        return
    # NB: must not touch jax.process_count()/jax.devices() first — that
    # would initialize the runtime and make distributed init impossible.
    try:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(nproc),
            process_id=int(pid),
        )
    except RuntimeError as e:  # already initialized (idempotent no-op)
        if "already" not in str(e).lower():
            raise
    # Establish the cross-process collective context NOW, while every
    # process is at the same point. The backend's context setup (Gloo on
    # CPU) has a short internal rendezvous deadline (~30 s); if the first
    # collective instead fires deep inside training, per-process
    # compile/decode skew can exceed it and kill the job — the same failure
    # mode the reference's NCCL_BLOCKING_WAIT knobs paper over
    # (/root/reference/distributed_video_classifier.py:232-234). A one-
    # element allgather here is the NCCL-communicator-warmup equivalent.
    try:
        from jax.experimental import multihost_utils

        multihost_utils.process_allgather(np.zeros((1,), np.float32))
    except Exception as e:  # pragma: no cover - never fatal
        import logging

        logging.getLogger(__name__).warning(
            "collective warm-up failed (continuing): %s", e)


def create_mesh(cfg: Optional[MeshConfig] = None,
                devices: Optional[list] = None) -> Mesh:
    """('data', 'model') mesh; model axis defaults to 1 (DP-only reference
    parity, SURVEY.md §2b), but the 2-D layout leaves room for sharding the
    scaled ViViT variant."""
    cfg = cfg or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    n_model = max(1, cfg.num_model)
    n_data = cfg.num_data if cfg.num_data > 0 else n // n_model
    if n_data * n_model != n:
        raise ValueError(
            f"mesh {n_data}x{n_model} does not cover {n} devices"
        )
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, (cfg.data_axis, cfg.model_axis))


def sync_global_devices(tag: str = "sync") -> None:
    """Barrier across hosts (replaces dist.barrier(),
    /root/reference/nexar_complete.py:376)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)
