"""Tensor-parallel (model-axis) tests for the ViViT variant on a 4x2 mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from vision_collision_detection_tpu.config import ExperimentConfig, MeshConfig
from vision_collision_detection_tpu.parallel import create_mesh
from vision_collision_detection_tpu.parallel.tp import (
    ModelParallelStrategy,
    param_shardings,
)
from vision_collision_detection_tpu.train import create_train_state


def vivit_config(**over):
    return ExperimentConfig().override({
        "model.backbone": "vivit_small",
        "model.dtype": "float32",
        "model.patch_size": 8,
        "data.fps": 2,
        "data.duration": 1,
        "data.frame_size": 32,
        "data.batch_size": 1,
        **over,
    })


@pytest.fixture(scope="module")
def mesh():
    return create_mesh(MeshConfig(num_data=4, num_model=2))


def test_param_sharding_rules(mesh):
    cfg = vivit_config()
    _, state = create_train_state(cfg, jax.random.PRNGKey(0), 10)
    shardings = param_shardings(state.params, mesh)
    flat = dict(jax.tree_util.tree_leaves_with_path(
        jax.tree_util.tree_map_with_path(lambda p, s: s, shardings)
    ))
    specs = {
        jax.tree_util.keystr(path): sh.spec
        for path, sh in jax.tree_util.tree_leaves_with_path(shardings)
    }
    # attention heads sharded
    q = [v for k, v in specs.items() if "spatial_0" in k and "query" in k
         and "kernel" in k]
    assert q and q[0] == P(None, "model", None)
    # MLP column/row parallel
    fc1 = [v for k, v in specs.items() if "spatial_0" in k and "mlp_fc1" in k
           and "kernel" in k]
    fc2 = [v for k, v in specs.items() if "spatial_0" in k and "mlp_fc2" in k
           and "kernel" in k]
    assert fc1[0] == P(None, "model") and fc2[0] == P("model", None)
    # biases / norms replicated
    b = [v for k, v in specs.items() if "norm1" in k and "scale" in k]
    assert b[0] == P()


def test_tp_train_step_runs_and_matches_single_device(mesh):
    cfg = vivit_config(**{"model.dropout": 0.0})
    strategy = ModelParallelStrategy(mesh)

    model, state = create_train_state(cfg, jax.random.PRNGKey(0), 10)
    from vision_collision_detection_tpu.train import make_train_step

    rng = np.random.default_rng(0)
    frames = (rng.random((8, 2, 32, 32, 3)) * 255).astype(np.uint8)
    targets = (np.arange(8) % 3).astype(np.int64)
    mask = np.ones(8, np.float32)

    # single device reference
    import dataclasses

    cfg1 = dataclasses.replace(cfg)
    cfg1.augment.enabled = False
    cfg1.augment.horizontal_flip_prob = 0.0
    step1 = make_train_step(model, cfg1, None, donate=False)
    s1, m1 = step1(state, jnp.asarray(frames), jnp.asarray(targets),
                   jnp.asarray(mask), jax.random.PRNGKey(3))

    # sharded
    _, state_tp = create_train_state(cfg1, jax.random.PRNGKey(0), 10)
    state_tp = strategy.shard_state(state_tp)
    step_tp, eval_tp = strategy.make_steps(model, cfg1, None)
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

    out = eval_tp(state_tp := s2,
                  jax.device_put(frames, strategy.data_sharding),
                  jax.device_put(targets, strategy.data_sharding),
                  jax.device_put(mask, strategy.data_sharding))
    probs = strategy.to_host(out["probs"])
    np.testing.assert_allclose(probs.sum(1), 1.0, atol=1e-5)
