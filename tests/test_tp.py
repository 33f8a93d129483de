"""Tensor-parallel (model-axis) tests for the ViViT variant on a 4x2 mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from vision_collision_detection_tpu.config import ExperimentConfig, MeshConfig
from vision_collision_detection_tpu.models.vivit import ViViT
from vision_collision_detection_tpu.parallel import create_mesh
from vision_collision_detection_tpu.parallel.tp import (
    ModelParallelStrategy,
    param_shardings,
)
from vision_collision_detection_tpu.train import make_train_step
from vision_collision_detection_tpu.train.steps import TrainState


def tp_config():
    cfg = ExperimentConfig().override({
        "model.backbone": "vivit_small",
        "model.dtype": "float32",
        "model.dropout": 0.0,
        "data.fps": 2,
        "data.duration": 1,
        "data.frame_size": 32,
        "data.batch_size": 1,
        "optim.optimizer": "sgd",
        "augment.enabled": False,
        "augment.horizontal_flip_prob": 0.0,
        "augment.blur_sigma": 0.0,
    })
    return cfg


def tiny_vivit():
    # heads=4 and mlp 4*32=128 both divide the model axis (2)
    return ViViT(dim=32, spatial_layers=2, temporal_layers=1, num_heads=4,
                 patch_size=8, num_classes=3, dtype=jnp.float32)


def init_state(model, cfg):
    S, T = cfg.data.frame_size, cfg.data.num_frames
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, T, S, S, 3), jnp.float32),
    )
    return TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=optax.sgd(1e-3),
    )


@pytest.fixture(scope="module")
def mesh():
    return create_mesh(MeshConfig(num_data=4, num_model=2))


def test_param_sharding_rules(mesh):
    cfg = tp_config()
    model = tiny_vivit()
    state = init_state(model, cfg)
    shardings = param_shardings(state.params, mesh)
    specs = {
        jax.tree_util.keystr(path): sh.spec
        for path, sh in jax.tree_util.tree_leaves_with_path(shardings)
    }
    q = [v for k, v in specs.items() if "spatial_0" in k and "query" in k
         and "kernel" in k]
    assert q and q[0] == P(None, "model", None)
    fc1 = [v for k, v in specs.items() if "spatial_0" in k and "mlp_fc1" in k
           and "kernel" in k]
    fc2 = [v for k, v in specs.items() if "spatial_0" in k and "mlp_fc2" in k
           and "kernel" in k]
    assert fc1[0] == P(None, "model") and fc2[0] == P("model", None)
    b = [v for k, v in specs.items() if "norm1" in k and "scale" in k]
    assert b[0] == P()


def test_tp_train_step_runs_and_matches_single_device(mesh):
    cfg = tp_config()
    model = tiny_vivit()
    strategy = ModelParallelStrategy(mesh)

    rng = np.random.default_rng(0)
    frames = (rng.random((8, 2, 32, 32, 3)) * 255).astype(np.uint8)
    targets = (np.arange(8) % 3).astype(np.int64)
    mask = np.ones(8, np.float32)

    state1 = init_state(model, cfg)
    step1 = make_train_step(model, cfg, None, donate=False)
    s1, m1 = step1(state1, jnp.asarray(frames), jnp.asarray(targets),
                   jnp.asarray(mask), jax.random.PRNGKey(3))

    state_tp = strategy.shard_state(init_state(model, cfg))
    step_tp, eval_tp = strategy.make_steps(model, cfg, None)
    s2, m2 = step_tp(
        state_tp,
        jax.device_put(frames, strategy.data_sharding),
        jax.device_put(targets, strategy.data_sharding),
        jax.device_put(mask, strategy.data_sharding),
        jax.random.PRNGKey(3),
    )
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-4)
    # sharded params stay sharded after the update
    q_kernel = s2.params["spatial_0"]["attn"]["query"]["kernel"]
    assert not q_kernel.sharding.is_fully_replicated
    # and match the single-device update
    np.testing.assert_allclose(
        np.asarray(q_kernel), np.asarray(s1.params["spatial_0"]["attn"]
                                         ["query"]["kernel"]),
        rtol=1e-4, atol=1e-6,
    )

    out = eval_tp(s2,
                  jax.device_put(frames, strategy.data_sharding),
                  jax.device_put(targets, strategy.data_sharding),
                  jax.device_put(mask, strategy.data_sharding))
    probs = strategy.to_host(out["probs"])
    assert probs.shape == (8, 3)
    np.testing.assert_allclose(probs.sum(1), 1.0, atol=1e-5)


def test_opt_state_moments_get_param_shardings(mesh):
    """Adam moments must mirror the param shardings even inside a CHAINED
    optimizer (round-1 review: top-level namedtuple scan missed injected
    transforms like clip_by_global_norm)."""
    cfg = tp_config()
    model = tiny_vivit()
    strategy = ModelParallelStrategy(mesh)

    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 2, 32, 32, 3), jnp.float32),
    )
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(1e-3, weight_decay=1e-4),
    )
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats", {}), tx=tx,
    )
    sharded = strategy.shard_state(state)

    adam = next(
        s for chain in sharded.opt_state
        for s in (chain if isinstance(chain, tuple) else (chain,))
        if isinstance(s, optax.ScaleByAdamState)
    )
    q_spec = adam.mu["spatial_0"]["attn"]["query"]["kernel"].sharding.spec
    assert q_spec == P(None, "model", None)
    nu_spec = adam.nu["spatial_0"]["mlp_fc1"]["kernel"].sharding.spec
    assert nu_spec == P(None, "model")
    # scalar count stays replicated
    assert adam.count.sharding.is_fully_replicated
    # norm/bias params replicated in the moments too
    b_spec = adam.mu["spatial_0"]["norm1"]["scale"].sharding.spec
    assert b_spec == P()
