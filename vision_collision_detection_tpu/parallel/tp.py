"""Model-axis (tensor-parallel) sharding for the scaled ViViT variant.

The reference's only strategy is data parallelism (SURVEY.md §2b); the
scaled 32-frame/336 px ViViT config (BASELINE.json config 5) is where a
second mesh axis pays off. This module implements the pjit/GSPMD form of
tensor parallelism: parameters carry NamedShardings on a ('data', 'model')
mesh — attention heads and MLP hidden dims split over 'model' — and XLA
inserts the all-reduces on ICI. Batches stay sharded over 'data', so the
same jitted train/eval steps from train.steps run unchanged; only array
placements differ (the "annotate shardings, let XLA insert collectives"
recipe).

Sharding rules (Megatron-style, per flax param path):
- attention query/key/value kernels [D, H, dh] → heads axis on 'model'
- attention out kernel [H, dh, D]             → heads axis on 'model'
- MLP fc1 kernel [D, 4D] → output dim on 'model' (column parallel)
- MLP fc2 kernel [4D, D] → input dim on 'model' (row parallel)
- everything else replicated.
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vision_collision_detection_tpu.config import ExperimentConfig
from vision_collision_detection_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from vision_collision_detection_tpu.train.steps import (
    make_eval_step,
    make_train_step,
)


def _rule_for(path_names, shape, mesh) -> P:
    names = [str(p) for p in path_names]
    joined = "/".join(names)
    n_model = mesh.shape[MODEL_AXIS]

    def ok(dim):
        return shape[dim] % n_model == 0

    if names[-1] == "kernel":
        if any(k in joined for k in ("query", "key", "value")):
            # [D, H, dh]: shard heads
            if len(shape) == 3 and ok(1):
                return P(None, MODEL_AXIS, None)
        if "out" in names and len(shape) == 3 and ok(0):
            return P(MODEL_AXIS, None, None)  # [H, dh, D]
        if "mlp_fc1" in joined and len(shape) == 2 and ok(1):
            return P(None, MODEL_AXIS)
        if "mlp_fc2" in joined and len(shape) == 2 and ok(0):
            return P(MODEL_AXIS, None)
    return P()  # replicate


def param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings matching `params` under the TP rules."""

    def assign(path, leaf):
        names = [getattr(k, "key", getattr(k, "name", k)) for k in path]
        return NamedSharding(mesh, _rule_for(names, np.shape(leaf), mesh))

    return jax.tree_util.tree_map_with_path(assign, params)


class ModelParallelStrategy:
    """Trainer strategy: batch on 'data', ViViT params on 'model'."""

    def __init__(self, mesh: Mesh):
        if MODEL_AXIS not in mesh.axis_names:
            raise ValueError(f"mesh must have a {MODEL_AXIS!r} axis")
        self.mesh = mesh
        self.num_data_shards = jax.process_count()
        self.data_shard_index = jax.process_index()
        me = jax.process_index()
        n_local = sum(
            1 for d in mesh.devices.flat if d.process_index == me
        )
        # per-host batch multiplier: local devices on the DATA axis only
        self.local_device_count = max(
            1, n_local // mesh.shape[MODEL_AXIS]
        )
        self.pad_batches = True
        self.data_sharding = NamedSharding(mesh, P(DATA_AXIS))
        self.replicated = NamedSharding(mesh, P())

    @property
    def is_main(self) -> bool:
        return jax.process_index() == 0

    @staticmethod
    def to_host(x) -> np.ndarray:
        from vision_collision_detection_tpu.parallel.dp import to_host_numpy

        return to_host_numpy(x)

    def gather_eval(self, arrays: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        if jax.process_count() == 1:
            return arrays
        from jax.experimental import multihost_utils

        return {
            k: multihost_utils.process_allgather(v).reshape(
                (-1,) + v.shape[1:]
            )
            for k, v in arrays.items()
        }

    def shard_state(self, state):
        """Place params (TP rules), opt state (mirrors params), batch_stats
        (replicated) onto the mesh.

        The optimizer state is walked GENERICALLY: any array leaf whose tree
        path ends with a param path (optax moment trees — Adam mu/nu,
        momentum traces — share the params' structure as a subtree, at any
        nesting depth of chained/injected transforms) and whose shape matches
        gets that param's sharding; every other leaf (step counts,
        EmptyStates, schedule states) is replicated.
        """
        p_sh = param_shardings(state.params, self.mesh)
        params = jax.device_put(state.params, p_sh)

        flat_p = jax.tree_util.tree_flatten_with_path(state.params)[0]
        flat_s = jax.tree_util.tree_flatten_with_path(p_sh)[0]
        table = {
            tuple(str(k) for k in path): (np.shape(leaf), sharding)
            for (path, leaf), (_, sharding) in zip(flat_p, flat_s)
        }

        def place(path, leaf):
            keys = tuple(str(k) for k in path)
            for i in range(len(keys)):  # longest path suffix first
                ent = table.get(keys[i:])
                if ent is not None and ent[0] == np.shape(leaf):
                    return jax.device_put(leaf, ent[1])
            return jax.device_put(leaf, self.replicated)

        opt_state = jax.tree_util.tree_map_with_path(place, state.opt_state)
        batch_stats = jax.device_put(state.batch_stats, self.replicated)
        return state.replace(params=params, opt_state=opt_state,
                             batch_stats=batch_stats)

    def make_steps(self, model, cfg: ExperimentConfig, class_weights):
        # Same jitted step bodies as single-device; GSPMD partitions them
        # according to the input shardings established by shard_state /
        # data_sharding.
        return (
            make_train_step(model, cfg, class_weights),
            make_eval_step(model, cfg, class_weights),
        )
