"""Orbax-backed checkpoints with the reference's artifact roles + true resume.

The reference torch.saves dicts with model/optimizer/scheduler state, best
metrics, history, and a self-describing ``hyperparams`` dict
(/root/reference/nexar_train.py:1622-1641), into per-epoch
``checkpoint_epoch{N}`` plus rolling ``best_model`` / ``last_model`` files
(/root/reference/nexar_complete.py:338-359) — but never actually resumes
optimizer state (SURVEY.md §5). Here:

- same roles: ``best`` / ``last`` / ``epoch_{N}`` under one run directory;
- the full ExperimentConfig JSON rides inside every checkpoint (the
  architecture-reconstruction contract inference consumes, mirroring
  /root/reference/nexar_inference.py:55-81);
- true mid-training resume: params, batch_stats, opt_state, epoch, step,
  best metrics, and history all round-trip.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

META_FILE = "vcd_meta.json"
ARRAYS_DIR = "arrays"


def _to_restorable(tree):
    """Concretize to host numpy so restore needs no sharding context."""
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


class CheckpointStore:
    """Manages best/last/epoch_N checkpoints under a run directory."""

    def __init__(self, run_dir: str, keep_epochs: int = 3):
        self.run_dir = os.path.abspath(run_dir)
        self.keep_epochs = keep_epochs
        os.makedirs(self.run_dir, exist_ok=True)
        self._ckptr = ocp.PyTreeCheckpointer()

    # ---- paths ----
    def path(self, role: str) -> str:
        return os.path.join(self.run_dir, role)

    def exists(self, role: str) -> bool:
        return os.path.isdir(os.path.join(self.path(role), ARRAYS_DIR))

    # ---- save/load ----
    @staticmethod
    def _sync(tag: str) -> None:
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(tag)

    def save(self, role: str, *, arrays: dict, meta: dict) -> str:
        """arrays: pytree of jax/np arrays; meta: JSON-serializable dict
        (includes the ExperimentConfig hyperparams contract).

        Multi-host contract: EVERY process must call this (orbax's save
        runs internal cross-process barriers — a main-only call deadlocks
        the job against the other processes' next collective, which is how
        this bug originally surfaced as a 30-minute Gloo timeout in the
        2-process test). Filesystem mutations happen on process 0 only;
        orbax coordinates its own writes.
        """
        main = jax.process_index() == 0
        target = self.path(role)
        tmp = target + ".tmp"
        if main:
            if os.path.isdir(tmp):
                shutil.rmtree(tmp)
            os.makedirs(tmp, exist_ok=True)
        self._sync(f"ckpt-pre-{role}")
        self._ckptr.save(
            os.path.join(tmp, ARRAYS_DIR), _to_restorable(arrays), force=True
        )
        if main:
            with open(os.path.join(tmp, META_FILE), "w") as f:
                json.dump(meta, f, indent=2, default=_json_default)
            if os.path.isdir(target):
                shutil.rmtree(target)
            os.replace(tmp, target)
        # all processes observe the completed swap before proceeding
        self._sync(f"ckpt-post-{role}")
        return target

    def load(self, role: str) -> tuple:
        return load_checkpoint(self.path(role))

    def save_epoch(self, epoch: int, **kw) -> str:
        path = self.save(f"epoch_{epoch}", **kw)
        self._prune_epochs()
        return path

    def _prune_epochs(self):
        if jax.process_index() != 0:
            return
        epochs = []
        for name in os.listdir(self.run_dir):
            if name.startswith("epoch_") and not name.endswith(".tmp"):
                try:
                    epochs.append(int(name.split("_")[1]))
                except ValueError:
                    continue
        for e in sorted(epochs)[: -self.keep_epochs] if self.keep_epochs else []:
            shutil.rmtree(os.path.join(self.run_dir, f"epoch_{e}"),
                          ignore_errors=True)

    def latest_role(self) -> Optional[str]:
        """best→last→newest epoch fallback order (reference test-time
        fallback, /root/reference/nexar_complete.py:433-444)."""
        for role in ("best", "last"):
            if self.exists(role):
                return role
        epochs = sorted(
            (int(n.split("_")[1]) for n in os.listdir(self.run_dir)
             if n.startswith("epoch_") and self.exists(n)),
            reverse=True,
        )
        return f"epoch_{epochs[0]}" if epochs else None


def load_checkpoint(path: str) -> tuple:
    """→ (arrays pytree, meta dict). `path` is a checkpoint directory."""
    ckptr = ocp.PyTreeCheckpointer()
    arrays = ckptr.restore(os.path.join(path, ARRAYS_DIR))
    meta_path = os.path.join(path, META_FILE)
    meta: dict = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return arrays, meta


def _json_default(o: Any):
    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    if isinstance(o, (set, tuple)):
        return list(o)
    raise TypeError(f"not JSON serializable: {type(o)}")
