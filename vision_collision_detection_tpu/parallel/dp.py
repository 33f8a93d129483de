"""Data-parallel strategy: shard_map over Mesh('data') with psum collectives.

TPU-native replacement for the reference's DDP engine
(/root/reference/distributed_video_classifier.py:157: ``DDP(model,
device_ids=[local_rank])`` + NCCL ring all-reduce hooks):

- params/opt state replicated, batch sharded on the ``data`` mesh axis;
- gradients all-reduced with ``jax.lax.psum`` INSIDE the compiled step
  (the explicit-collective form of DP; XLA schedules it on ICI);
- loss uses a global weighted mean: local weighted sums are psum'd so the
  result is bit-identical to single-device training on the concatenated
  batch (the reference's loss all-reduce, nexar_complete.py:264-267);
- batch_stats (BatchNorm) are pmean-synced across shards — stronger than
  torch DDP's per-replica stats, and required for replica-consistent
  checkpoints;
- evaluation keeps every device busy on its shard and gathers outputs
  (gen-3b semantics, /root/reference/nexar_complete_with_validation.py:
  838-900); multi-host gathers use process_allgather with the same pad+mask
  trick.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

if hasattr(jax, "shard_map"):  # jax>=0.6 top-level API
    shard_map = jax.shard_map
else:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

from vision_collision_detection_tpu.config import ExperimentConfig
from vision_collision_detection_tpu.ops.preprocess import (
    eval_preprocess,
    train_preprocess,
)
from vision_collision_detection_tpu.parallel.mesh import DATA_AXIS, create_mesh
from vision_collision_detection_tpu.train.steps import weighted_loss


def to_host_numpy(x) -> np.ndarray:
    """Materialize a (possibly multi-host-sharded) array's local view."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        shards = sorted(x.addressable_shards, key=lambda s: s.index)
        return np.concatenate([np.asarray(s.data) for s in shards])
    return np.asarray(x)


class DataParallelStrategy:
    """Inject into Trainer for multi-device / multi-host training."""

    def __init__(self, mesh: Optional[Mesh] = None):
        self.mesh = mesh or create_mesh()
        if DATA_AXIS not in self.mesh.axis_names:
            raise ValueError(f"mesh must have a {DATA_AXIS!r} axis")
        self.num_data_shards = jax.process_count()
        self.data_shard_index = jax.process_index()
        # local devices participating in the mesh
        me = jax.process_index()
        self.local_device_count = sum(
            1 for d in self.mesh.devices.flat if d.process_index == me
        )
        self.pad_batches = True
        self.data_sharding = NamedSharding(self.mesh, P(DATA_AXIS))
        self.replicated = NamedSharding(self.mesh, P())

    @property
    def is_main(self) -> bool:
        return jax.process_index() == 0

    def to_host(self, x) -> np.ndarray:
        return to_host_numpy(x)

    def globalize(self, x: np.ndarray):
        """Per-host batch shard → global device array.

        Multi-host: every process holds a DISTINCT loader shard, so the
        global array must be assembled with make_array_from_process_local_data
        (a bare device_put onto a non-fully-addressable sharding would read
        the local batch as the global array). Single-host: jit's implicit
        transfer with in_specs does the right thing.
        """
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(
                self.data_sharding, np.asarray(x)
            )
        return x

    # ------------------------------------------------------------------
    def make_steps(self, model, cfg: ExperimentConfig, class_weights):
        aug_cfg = cfg.augment
        S = cfg.data.frame_size
        num_classes = cfg.model.num_classes
        cw = (jnp.asarray(class_weights, jnp.float32)
              if class_weights is not None else jnp.ones((num_classes,)))
        loss_type = cfg.optim.loss_type
        smoothing = cfg.optim.label_smoothing
        dtype = jnp.dtype(cfg.model.dtype)
        mesh = self.mesh

        def _global_weighted_loss(logits, targets, mask):
            """Weighted CE whose value/gradient match single-device training
            on the full (concatenated) batch."""
            onehot = jax.nn.one_hot(targets, num_classes, dtype=logits.dtype)
            if smoothing > 0:
                onehot = onehot * (1 - smoothing) + smoothing / num_classes
            if loss_type == "cross_entropy":
                logp = jax.nn.log_softmax(logits, axis=-1)
                per = -jnp.sum(onehot * logp, axis=-1)
            else:
                import optax

                per = jnp.mean(
                    optax.sigmoid_binary_cross_entropy(logits, onehot), axis=-1
                )
            w = cw[targets] * mask
            denom = jax.lax.psum(jnp.sum(w), DATA_AXIS)
            local = jnp.sum(per * w) / jnp.maximum(denom, 1e-8)
            return local, per

        use_sensor = cfg.model.use_sensor

        def train_step_shard(state, frames, targets, mask, key, sensor=None):
            shard_id = jax.lax.axis_index(DATA_AXIS)
            key = jax.random.fold_in(key, shard_id)
            k_pre, k_drop = jax.random.split(key)
            x = train_preprocess(k_pre, frames, aug_cfg, S, dtype)
            extra = {"sensor": sensor} if use_sensor else {}

            def loss_fn(params):
                out, mutated = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    x, train=True, rngs={"dropout": k_drop},
                    mutable=["batch_stats"], **extra,
                )
                local_loss, _ = _global_weighted_loss(out, targets, mask)
                return local_loss, (out, mutated.get("batch_stats",
                                                     state.batch_stats))

            (local_loss, (logits, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            # sum-of-local-losses is the global loss; its gradient is the
            # psum of local gradients (the DDP all-reduce, compiled on ICI)
            grads = jax.lax.psum(grads, DATA_AXIS)
            new_bs = jax.tree_util.tree_map(
                lambda a: jax.lax.pmean(a, DATA_AXIS), new_bs
            )
            state = state.apply_gradients(grads=grads, batch_stats=new_bs)

            loss = jax.lax.psum(local_loss, DATA_AXIS)
            preds = jnp.argmax(logits, axis=-1)
            correct = jax.lax.psum(jnp.sum((preds == targets) * mask), DATA_AXIS)
            count = jnp.maximum(jax.lax.psum(jnp.sum(mask), DATA_AXIS), 1.0)
            metrics = {"loss": loss, "accuracy": correct / count,
                       "grad_norm": jnp.sqrt(sum(
                           jnp.sum(jnp.square(g))
                           for g in jax.tree_util.tree_leaves(grads)))}
            return state, metrics

        def eval_step_shard(state, frames, targets, mask, sensor=None):
            x = eval_preprocess(frames, aug_cfg, S, dtype)
            extra = {"sensor": sensor} if use_sensor else {}
            logits = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                x, train=False, **extra,
            )
            local_loss, per = _global_weighted_loss(logits, targets, mask)
            return {
                "loss": jax.lax.psum(local_loss, DATA_AXIS),
                "per_sample_loss": per,
                "probs": jax.nn.softmax(logits, axis=-1),
                "preds": jnp.argmax(logits, axis=-1),
            }

        state_spec = P()  # fully replicated
        batch_spec = P(DATA_AXIS)
        train_in = [state_spec, batch_spec, batch_spec, batch_spec, P()]
        eval_in = [state_spec, batch_spec, batch_spec, batch_spec]
        if use_sensor:
            train_in.append(batch_spec)
            eval_in.append(batch_spec)

        train_step = jax.jit(
            shard_map(
                train_step_shard, mesh=mesh,
                in_specs=tuple(train_in),
                out_specs=(state_spec, P()),
                check_vma=False,
            ),
            donate_argnums=(0,),
        )
        eval_step = jax.jit(
            shard_map(
                eval_step_shard, mesh=mesh,
                in_specs=tuple(eval_in),
                out_specs={
                    "loss": P(), "per_sample_loss": batch_spec,
                    "probs": batch_spec, "preds": batch_spec,
                },
                check_vma=False,
            )
        )
        if use_sensor:
            # trainer passes sensor by keyword; shard_map wants positional
            _ts, _es = train_step, eval_step

            def train_step(state, frames, targets, mask, key, sensor):  # noqa: F811
                return _ts(state, frames, targets, mask, key, sensor)

            def eval_step(state, frames, targets, mask, sensor):  # noqa: F811
                return _es(state, frames, targets, mask, sensor)

        return train_step, eval_step

    # ------------------------------------------------------------------
    def gather_eval(self, arrays: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        """Concatenate per-host eval outputs across processes.

        Per-host shapes are identical by construction (equal shard counts +
        pad_partial), which is exactly the reference's size-gather→pad→
        all_gather→trim dance (/root/reference/
        nexar_complete_with_validation.py:854-898) made static.
        """
        if jax.process_count() == 1:
            return arrays
        from jax.experimental import multihost_utils

        out = {}
        for k, v in arrays.items():
            gathered = multihost_utils.process_allgather(v)
            out[k] = gathered.reshape((-1,) + v.shape[1:])
        return out
