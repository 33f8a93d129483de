"""Training engine tests: loss math, schedule, steps, e2e tiny train + resume."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from vision_collision_detection_tpu.config import ExperimentConfig
from vision_collision_detection_tpu.data import create_datasets_with_manual_split
from vision_collision_detection_tpu.media.synthetic import generate_dataset
from vision_collision_detection_tpu.train import (
    Trainer,
    cosine_annealing_schedule,
    create_train_state,
    make_eval_step,
    make_train_step,
    weighted_loss,
)


def tiny_config(**over):
    cfg = ExperimentConfig().override({
        "model.backbone": "resnet18",
        "model.temporal_mode": "pooling",
        "model.dtype": "float32",
        "data.fps": 5,
        "data.duration": 1,
        "data.frame_size": 32,
        "data.batch_size": 3,
        "data.num_workers": 2,
        "train.epochs": 2,
        "train.validation_freq": 0,
        "train.log_every_steps": 0,
        "optim.learning_rate": 1e-3,
        "augment.blur_sigma": 0.0,
        **over,
    })
    return cfg


class TestLossAndSchedule:
    def test_ce_matches_manual(self):
        logits = jnp.array([[2.0, 0.5, -1.0], [0.0, 1.0, 0.0]])
        targets = jnp.array([0, 2])
        w = jnp.array([1.0, 1.0, 2.0])
        mask = jnp.ones(2)
        loss, per = weighted_loss(logits, targets, w, mask)
        logp = jax.nn.log_softmax(logits)
        expected = (-logp[0, 0] * 1.0 + -logp[1, 2] * 2.0) / 3.0
        assert float(loss) == pytest.approx(float(expected), rel=1e-6)

    def test_mask_zeroes_samples(self):
        logits = jnp.array([[2.0, 0.5, -1.0], [0.0, 1.0, 0.0]])
        targets = jnp.array([0, 2])
        w = jnp.ones(3)
        full, _ = weighted_loss(logits, targets, w, jnp.array([1.0, 0.0]))
        only0, _ = weighted_loss(logits[:1], targets[:1], w, jnp.ones(1))
        assert float(full) == pytest.approx(float(only0), rel=1e-6)

    def test_bce_runs(self):
        logits = jnp.zeros((4, 3))
        loss, _ = weighted_loss(
            logits, jnp.array([0, 1, 2, 0]), jnp.ones(3), jnp.ones(4),
            loss_type="bce",
        )
        assert np.isfinite(float(loss))

    def test_cosine_schedule_torch_semantics(self):
        lr0 = 1e-3
        sched = cosine_annealing_schedule(lr0, t_max_epochs=30,
                                          steps_per_epoch=10, eta_min_ratio=0.01)
        assert float(sched(0)) == pytest.approx(lr0)
        assert float(sched(9)) == pytest.approx(lr0)  # constant within epoch
        # at epoch 30: eta_min
        assert float(sched(300)) == pytest.approx(lr0 * 0.01, rel=1e-4)
        # at epoch 15: midpoint
        assert float(sched(150)) == pytest.approx((lr0 + lr0 * 0.01) / 2, rel=1e-4)


class TestSteps:
    def test_train_step_reduces_loss_on_fixed_batch(self):
        cfg = tiny_config()
        model, state = create_train_state(cfg, jax.random.PRNGKey(0), 10)
        step = make_train_step(model, cfg, donate=False)
        frames = (np.random.default_rng(0).random((4, 5, 32, 32, 3)) * 255
                  ).astype(np.uint8)
        targets = jnp.array([0, 1, 2, 0])
        mask = jnp.ones(4)
        key = jax.random.PRNGKey(1)
        losses = []
        for i in range(8):
            state, m = step(state, jnp.asarray(frames), targets, mask,
                            jax.random.fold_in(key, i))
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]

    def test_eval_step_outputs(self):
        cfg = tiny_config()
        model, state = create_train_state(cfg, jax.random.PRNGKey(0), 10)
        estep = make_eval_step(model, cfg)
        frames = np.zeros((2, 5, 32, 32, 3), np.uint8)
        out = estep(state, jnp.asarray(frames), jnp.array([0, 1]), jnp.ones(2))
        assert out["probs"].shape == (2, 3)
        np.testing.assert_allclose(np.asarray(out["probs"]).sum(1), 1.0, atol=1e-5)


@pytest.fixture(scope="module")
def synth_splits(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_synth")
    csv = generate_dataset(
        str(root), clips_per_class=4, num_frames=12, height=40, width=56,
        splits=("train", "train", "val", "test"),
    )
    df = pd.read_csv(csv).fillna({"sensor_path": ""})
    return df


class TestTrainerE2E:
    def test_train_validate_test_and_artifacts(self, synth_splits, tmp_path):
        cfg = tiny_config()
        train, val, test = create_datasets_with_manual_split(
            synth_splits, fps=5, duration=1, frame_size=32,
        )
        run_dir = str(tmp_path / "run")
        tr = Trainer(cfg, train, val, test, run_dir=run_dir)
        hist = tr.train()
        assert len(hist.records) >= 1
        assert os.path.exists(os.path.join(run_dir, "training_history.csv"))
        assert os.path.exists(os.path.join(run_dir, "validation_epoch0.json"))
        assert tr.store.exists("best") and tr.store.exists("last")

        res = tr.test()
        assert res["num_samples"] == 3
        assert os.path.exists(os.path.join(run_dir, "test_results.json"))
        assert os.path.exists(os.path.join(run_dir, "test_predictions.csv"))
        preds = pd.read_csv(os.path.join(run_dir, "test_predictions.csv"))
        assert {"id", "target", "predicted", "prob_normal",
                "prob_near_collision", "prob_collision"} <= set(preds.columns)

    def test_mini_val_cascade_updates_dashboard(self, synth_splits, tmp_path):
        """The cascade must render mini-val (and, on improvement, full-val)
        rows on the dashboard (reference nexar_train.py:510,1204-1269)."""
        cfg = tiny_config()
        train, val, _ = create_datasets_with_manual_split(
            synth_splits, fps=5, duration=1, frame_size=32,
        )
        tr = Trainer(cfg, train, val, run_dir=str(tmp_path / "viz_run"))

        calls = {"mini": [], "full": []}

        class _Recorder:
            def update_val_metrics(self, m):
                calls["mini"].append(m)

            def update_full_val_metrics(self, m):
                calls["full"].append(m)

        tr._viz = _Recorder()
        tr._mini_validate_cascade(epoch=0)
        assert len(calls["mini"]) == 1
        assert "loss" in calls["mini"][0]
        # fresh trainer: best_mini_loss is inf, so the cascade always runs
        # the full validation and must render it too
        assert len(calls["full"]) == 1

    def test_resume_continues(self, synth_splits, tmp_path):
        cfg = tiny_config()
        train, val, test = create_datasets_with_manual_split(
            synth_splits, fps=5, duration=1, frame_size=32,
        )
        run_dir = str(tmp_path / "resume_run")
        tr1 = Trainer(cfg, train, val, run_dir=run_dir)
        tr1.train(epochs=1)
        step_after_1 = int(tr1.state.step)

        cfg2 = tiny_config(**{"train.resume": True})
        tr2 = Trainer(cfg2, train, val, run_dir=run_dir)
        assert tr2.start_epoch == 1
        assert int(tr2.state.step) == step_after_1  # optimizer state restored
        tr2.train(epochs=2)
        assert int(tr2.state.step) >= step_after_1


def test_run_notebook_equivalent_smoke(tmp_path):
    """The pinned notebook recipe entry (reference
    nexar_train_distributed.py:360-436) runs end-to-end on synthetic data
    with downscaled dims and returns (trainer, history, test_results)."""
    from vision_collision_detection_tpu.media.synthetic import generate_dataset
    from vision_collision_detection_tpu.train import run_notebook_equivalent

    csv = generate_dataset(
        str(tmp_path / "clips"), clips_per_class=3, num_frames=6, height=40,
        width=56, fps=3, splits=("train", "val", "test"),
    )
    trainer, history, test_results = run_notebook_equivalent(
        csv,
        save_dir=str(tmp_path / "results"),
        experiment_name="nb_smoke",
        epochs=1,
        batch_size=2,
        base_model="resnet18",
        temporal_mode="pooling",
        use_dashboard=False,
        config_overrides={
            "data.fps": 3, "data.duration": 2, "data.frame_size": 32,
            "train.validation_freq": 0, "train.log_every_steps": 0,
            "augment.enabled": False, "augment.blur_sigma": 0.0,
            "augment.horizontal_flip_prob": 0.0,
        },
    )
    # recipe defaults survived into the config
    assert trainer.cfg.optim.learning_rate == 1e-4
    assert trainer.cfg.optim.weight_decay == 1e-4
    assert trainer.cfg.optim.use_class_weights is True
    assert trainer.cfg.data.sample_strategy == "center"
    assert len(history.to_dataframe()) == 1
    assert "accuracy" in test_results
