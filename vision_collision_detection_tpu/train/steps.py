"""Jitted train / eval steps.

TPU-first: each step is ONE compiled XLA program — uint8 frames in,
preprocessing (letterbox + augmentation + normalize, bf16) fused with the
model forward/backward and the optimizer update. The reference splits this
across DataLoader workers (CPU transforms), an autocast forward, a GradScaler
backward, and a Python optimizer step (/root/reference/nexar_train.py:
1114-1200); here XLA schedules all of it.

Loss semantics mirror the reference's criterion setup
(/root/reference/nexar_train.py:884-898): CrossEntropy with optional
inverse-frequency class weights (torch weighted-mean reduction) or
BCE-with-logits on one-hot targets. Samples flagged as decode failures are
masked out of the loss (an intentional improvement over the reference, which
trains on its zero-tensor fallback frames).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax
import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from vision_collision_detection_tpu.config import ExperimentConfig
from vision_collision_detection_tpu.models import build_model
from vision_collision_detection_tpu.ops.preprocess import (
    eval_preprocess,
    train_preprocess,
)
from vision_collision_detection_tpu.train.optim import build_optimizer


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def load_pretrained_backbone(variables: dict, npz_path: str) -> dict:
    """Swap the 'backbone' subtree for converted torchvision weights
    (models.convert), mirroring the reference's pretrained=True backbones
    (/root/reference/nexar_arch.py:289-341) with the head left freshly
    initialized (head swap, :876)."""
    import flax

    from vision_collision_detection_tpu.models.convert import load_npz

    loaded = load_npz(npz_path)
    variables = flax.core.unfreeze(variables)
    target_p = variables["params"]["backbone"]

    def _restore(target, state):
        # cast to the init dtype: converted artifacts may be stored
        # half-precision on disk (e.g. the committed fp16 fixture in
        # tests/fixtures/pretrained/) while params train in f32
        restored = flax.serialization.from_state_dict(target, state)
        return jax.tree_util.tree_map(
            lambda new, tgt: jnp.asarray(new, tgt.dtype), restored, target)

    variables["params"]["backbone"] = _restore(target_p, loaded["params"])
    if loaded.get("batch_stats"):
        bs = variables.setdefault("batch_stats", {})
        bs["backbone"] = _restore(bs.get("backbone", {}),
                                  loaded["batch_stats"])
    return variables


def weighted_loss(logits, targets, class_weights, sample_mask, *,
                  loss_type: str = "cross_entropy",
                  label_smoothing: float = 0.0):
    """Per-batch scalar loss + per-sample losses.

    CE uses torch's weighted-mean reduction: sum(w_i * ce_i) / sum(w_i),
    with w_i = class_weight[target_i] * sample_mask_i.
    """
    num_classes = logits.shape[-1]
    onehot = jax.nn.one_hot(targets, num_classes, dtype=logits.dtype)
    if label_smoothing > 0:
        onehot = onehot * (1 - label_smoothing) + label_smoothing / num_classes

    if loss_type == "cross_entropy":
        logp = jax.nn.log_softmax(logits, axis=-1)
        per_sample = -jnp.sum(onehot * logp, axis=-1)
    elif loss_type == "bce":
        per_sample = jnp.mean(
            optax.sigmoid_binary_cross_entropy(logits, onehot), axis=-1
        )
    else:
        raise ValueError(f"unknown loss type {loss_type!r}")

    w = class_weights[targets] * sample_mask
    denom = jnp.maximum(jnp.sum(w), 1e-8)
    return jnp.sum(per_sample * w) / denom, per_sample


def create_train_state(cfg: ExperimentConfig, rng: jax.Array,
                       steps_per_epoch: int,
                       sample_frames_shape=None) -> tuple:
    """→ (model, TrainState). Init is seed-deterministic and identical on
    every host (the reference's seeded-init discipline,
    /root/reference/distributed_video_classifier.py:379-412)."""
    model = build_model(cfg.model)
    S = cfg.data.frame_size
    T = cfg.data.num_frames
    if T > cfg.model.subsample_threshold and cfg.model.frame_subsample > 1:
        pass  # model subsamples internally; init with full T
    shape = sample_frames_shape or (1, T, S, S, 3)
    init_kwargs = {}
    if cfg.model.use_sensor:
        init_kwargs["sensor"] = jnp.zeros(
            (1, T, cfg.data.sensor_dim), jnp.float32
        )
    # jitted init: one compiled program instead of hundreds of eager op
    # dispatches (pathological through remote-compile TPU tunnels)
    variables = jax.jit(
        lambda k, x, kw: model.init(k, x, train=False, **kw)
    )({"params": rng}, jnp.zeros(shape, jnp.float32), init_kwargs)
    if cfg.model.pretrained_path:
        variables = load_pretrained_backbone(
            variables, cfg.model.pretrained_path
        )
    tx, _ = build_optimizer(cfg.optim, steps_per_epoch)
    return model, TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )


def make_train_step(model, cfg: ExperimentConfig,
                    class_weights: Optional[jnp.ndarray] = None,
                    preprocess: bool = True,
                    donate: bool = True) -> Callable:
    """→ jitted (state, frames, targets, sample_mask, key) → (state, metrics).

    frames: uint8 [B,T,H,W,C] when preprocess=True, else model-ready floats.
    """
    aug_cfg = cfg.augment
    S = cfg.data.frame_size
    num_classes = cfg.model.num_classes
    cw = (jnp.asarray(class_weights, jnp.float32)
          if class_weights is not None else jnp.ones((num_classes,)))
    loss_type = cfg.optim.loss_type
    smoothing = cfg.optim.label_smoothing
    dtype = jnp.dtype(cfg.model.dtype)
    use_sensor = cfg.model.use_sensor

    def step(state: TrainState, frames, targets, sample_mask, key,
             sensor=None):
        k_pre, k_drop = jax.random.split(key)
        if preprocess:
            x = train_preprocess(k_pre, frames, aug_cfg, S, dtype)
        else:
            x = frames
        extra = {"sensor": sensor} if use_sensor else {}

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x, train=True, rngs={"dropout": k_drop},
                mutable=["batch_stats"], **extra,
            )
            loss, _ = weighted_loss(
                out, targets, cw, sample_mask,
                loss_type=loss_type, label_smoothing=smoothing,
            )
            return loss, (out, mutated.get("batch_stats", state.batch_stats))

        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads=grads, batch_stats=new_bs)
        preds = jnp.argmax(logits, axis=-1)
        correct = jnp.sum((preds == targets) * sample_mask)
        count = jnp.maximum(jnp.sum(sample_mask), 1.0)
        metrics = {"loss": loss, "accuracy": correct / count,
                   "grad_norm": optax.global_norm(grads)}
        return state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, cfg: ExperimentConfig,
                   class_weights: Optional[jnp.ndarray] = None,
                   preprocess: bool = True) -> Callable:
    """→ jitted (state, frames, targets, sample_mask) → per-batch outputs
    (loss, probs, preds) for host-side metric aggregation."""
    aug_cfg = cfg.augment
    S = cfg.data.frame_size
    num_classes = cfg.model.num_classes
    cw = (jnp.asarray(class_weights, jnp.float32)
          if class_weights is not None else jnp.ones((num_classes,)))
    loss_type = cfg.optim.loss_type
    dtype = jnp.dtype(cfg.model.dtype)
    use_sensor = cfg.model.use_sensor

    def step(state: TrainState, frames, targets, sample_mask, sensor=None):
        x = eval_preprocess(frames, aug_cfg, S, dtype) if preprocess else frames
        extra = {"sensor": sensor} if use_sensor else {}
        logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, train=False, **extra,
        )
        loss, per_sample = weighted_loss(
            logits, targets, cw, sample_mask, loss_type=loss_type
        )
        probs = jax.nn.softmax(logits, axis=-1)
        return {
            "loss": loss,
            "per_sample_loss": per_sample,
            "probs": probs,
            "preds": jnp.argmax(logits, axis=-1),
        }

    return jax.jit(step)
