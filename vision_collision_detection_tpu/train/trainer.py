"""Training engine: epoch loop, mini-validation cascade, early stopping,
best-checkpoint tracking, history artifacts, true resume.

One engine replaces the reference's three trainer generations (SURVEY.md §2c
#6/#9/#10/#11), keeping the distinctive behaviors:

- mini-validation cascade (/root/reference/nexar_train.py:1204-1269): every
  ``steps_per_epoch // validation_freq`` batches run a 25-batch shuffled
  mini-validation; if the mini loss improves, run a FULL validation; if the
  full loss improves, save ``best``.
- early stopping on ``patience`` non-improving epochs (:1084-1090), best
  selected on validation loss (:1049-1062).
- artifact layout: best/last/epoch_N checkpoints, training_history.csv,
  validation_epoch{N}.json, test_results.json, test_predictions.csv.
- evaluation is SPMD-uniform: every process validates its shard and results
  are gathered — the gen-3b design (/root/reference/
  nexar_complete_with_validation.py:784-900), never gen-2's rank-0-only
  asymmetric validation (incompatible with SPMD; see SURVEY.md §5).

The parallel strategy is injected: SingleDeviceStrategy here,
parallel.dp.DataParallelStrategy for multi-chip.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np

from vision_collision_detection_tpu.ckpt import CheckpointStore
from vision_collision_detection_tpu.config import ExperimentConfig
from vision_collision_detection_tpu.data.loader import ClipLoader, device_prefetch
from vision_collision_detection_tpu.metrics import classification_metrics
from vision_collision_detection_tpu.obs.history import (
    TrainingHistory,
    save_metrics_json,
    save_predictions_csv,
)
from vision_collision_detection_tpu.obs.logging_utils import setup_logging
from vision_collision_detection_tpu.train.optim import build_optimizer
from vision_collision_detection_tpu.train.steps import (
    create_train_state,
    make_eval_step,
    make_train_step,
)


# Device-side running-metric accumulation: one fused add per step instead of
# a blocking float() host sync (the reference's loop hides this cost behind
# CUDA streams; through a high-latency TPU tunnel a per-step sync serializes
# dispatch and idles the chip).
_metric_sum = jax.jit(
    lambda acc, new: jax.tree_util.tree_map(jnp.add, acc, new)
)


class SingleDeviceStrategy:
    """Default strategy: one device, no collectives."""

    num_data_shards = 1
    data_shard_index = 0
    data_sharding = None  # device_put target

    def make_steps(self, model, cfg, class_weights):
        return (
            make_train_step(model, cfg, class_weights),
            make_eval_step(model, cfg, class_weights),
        )

    def gather_eval(self, arrays: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        return arrays

    @staticmethod
    def to_host(x) -> np.ndarray:
        return np.asarray(x)

    @staticmethod
    def globalize(x: np.ndarray):
        """Host batch → step input (multi-host strategies assemble a global
        array from per-process shards; see parallel.dp)."""
        return x

    @property
    def is_main(self) -> bool:
        return True


def _ids_to_bytes(ids, width: int = 256) -> np.ndarray:
    """Fixed-shape uint8 encoding so string ids survive process_allgather
    alongside the prediction arrays (keeps test_predictions.csv rows aligned
    under multi-host eval)."""
    arr = np.zeros((len(ids), width), np.uint8)
    for i, s in enumerate(ids):
        b = str(s).encode("utf-8")[:width]
        arr[i, : len(b)] = np.frombuffer(b, np.uint8)
    return arr


def _bytes_to_ids(arr: np.ndarray) -> list:
    return [bytes(row[row != 0]).decode("utf-8", "replace") for row in arr]


class Trainer:
    def __init__(
        self,
        cfg: ExperimentConfig,
        train_ds,
        val_ds,
        test_ds=None,
        run_dir: Optional[str] = None,
        strategy=None,
    ):
        cfg.validate()
        self.cfg = cfg
        self.strategy = strategy or SingleDeviceStrategy()
        self.run_dir = run_dir or os.path.join(cfg.save_dir, cfg.name())
        os.makedirs(self.run_dir, exist_ok=True)
        self.log = setup_logging(self.run_dir)
        self.store = CheckpointStore(self.run_dir, cfg.train.keep_checkpoints)

        dc = cfg.data
        per_host_batch = dc.batch_size * self._local_batch_multiplier()
        pad_partial = getattr(self.strategy, "pad_batches", False)
        if dc.content_box_transfer:
            self._enable_content_box(train_ds, val_ds, test_ds)
        if dc.fast_resize:
            for ds in (train_ds, val_ds, test_ds):
                if ds is not None:
                    ds.fast_resize = True
        if dc.lowres_decode:
            for ds in (train_ds, val_ds, test_ds):
                if ds is not None:
                    ds.lowres_decode = int(dc.lowres_decode)
        self.train_loader = ClipLoader(
            train_ds, per_host_batch, shuffle=True,
            drop_last=dc.drop_last_train, num_workers=dc.num_workers,
            prefetch_batches=dc.prefetch_depth, seed=dc.seed,
            num_shards=self.strategy.num_data_shards,
            shard_index=self.strategy.data_shard_index,
            pad_partial=pad_partial,
        )
        self.val_loader = ClipLoader(
            val_ds, per_host_batch, shuffle=False, drop_last=False,
            num_workers=dc.num_workers, seed=dc.seed,
            num_shards=self.strategy.num_data_shards,
            shard_index=self.strategy.data_shard_index,
            pad_partial=pad_partial, mask_wrap=True,
        )
        self.mini_val_loader = ClipLoader(
            val_ds, per_host_batch, shuffle=True, drop_last=False,
            num_workers=dc.num_workers, seed=dc.seed + 1,
            num_shards=self.strategy.num_data_shards,
            shard_index=self.strategy.data_shard_index,
            pad_partial=pad_partial, mask_wrap=True,
        )
        self.test_loader = (
            ClipLoader(
                test_ds, per_host_batch, shuffle=False, drop_last=False,
                num_workers=dc.num_workers, seed=dc.seed,
                num_shards=self.strategy.num_data_shards,
                shard_index=self.strategy.data_shard_index,
                pad_partial=pad_partial, mask_wrap=True,
            )
            if test_ds is not None else None
        )

        self.class_weights = (
            train_ds.class_weights() if cfg.optim.use_class_weights else None
        )
        steps_per_epoch = max(1, len(self.train_loader))
        self.steps_per_epoch = steps_per_epoch
        self.model, self.state = create_train_state(
            cfg, jax.random.PRNGKey(cfg.train.seed), steps_per_epoch
        )
        _, self.lr_schedule = build_optimizer(cfg.optim, steps_per_epoch)
        self.train_step, self.eval_step = self.strategy.make_steps(
            self.model, cfg, self.class_weights
        )

        self.history = TrainingHistory(dc.class_names)
        self.best_val_loss = float("inf")
        self.best_mini_loss = float("inf")
        self.start_epoch = 0

        if cfg.train.resume and self.store.exists("last"):
            self._resume()

    def _enable_content_box(self, *datasets, probe_limit: int = 8) -> None:
        """Ship letterbox content rows, pad on device (bit-exact; see
        ops.letterbox + DataConfig.content_box_transfer).

        Guarded against mixed-aspect data: a sample of videos from EVERY
        dataset is probed and the box is applied only when all aspects agree
        — otherwise a clip with a different aspect would be double-letterboxed
        into geometry that is not bit-identical to the square decode path
        (the exact-letterbox arithmetic AUC parity depends on,
        /root/reference/nexar_video_aug.py:713-719). Skipped when probing
        fails or the content is already square.
        """
        from vision_collision_detection_tpu.media.decoder import probe
        from vision_collision_detection_tpu.ops.letterbox import (
            letterbox_geometry,
        )

        S = self.cfg.data.frame_size
        geoms = set()
        try:
            for ds in datasets:
                if ds is None or not getattr(ds, "records", None):
                    continue
                recs = ds.records
                stride = max(1, len(recs) // probe_limit)
                for rec in recs[::stride][:probe_limit]:
                    info = probe(rec.video_path)
                    nh, nw, _, _ = letterbox_geometry(info.height, info.width, S)
                    geoms.add((nh, nw))
                    if len(geoms) > 1:
                        raise ValueError("mixed aspect")
        except ValueError:
            self.log.warning(
                "content-box transfer disabled: datasets mix aspect ratios "
                "%s — falling back to square decode", sorted(geoms),
            )
            return
        except Exception as e:
            self.log.warning(
                "content-box transfer disabled: probing failed (%s: %s) — "
                "falling back to square decode", type(e).__name__, e,
            )
            return
        if not geoms:
            return
        nh, nw = next(iter(geoms))
        box = (min(nh + nh % 2, S), min(nw + nw % 2, S))
        if box == (S, S):
            return
        for ds in datasets:
            if ds is not None and getattr(ds, "content_box", None) is None:
                ds.content_box = box

    def _local_batch_multiplier(self) -> int:
        # per-host batch = per-device batch × local devices on the data axis
        return getattr(self.strategy, "local_device_count", 1)

    # ------------------------------------------------------------------
    # checkpoint plumbing
    # ------------------------------------------------------------------
    def _arrays(self) -> dict:
        return {
            "params": flax.serialization.to_state_dict(self.state.params),
            "batch_stats": flax.serialization.to_state_dict(self.state.batch_stats),
            "opt_state": flax.serialization.to_state_dict(self.state.opt_state),
            "step": np.asarray(self.state.step),
        }

    def _meta(self, epoch: int) -> dict:
        return {
            "epoch": epoch,
            "best_val_loss": self.best_val_loss,
            "best_mini_loss": self.best_mini_loss,
            "history": self.history.to_list(),
            "hyperparams": self.cfg.to_dict(),
            "class_weights": (
                self.class_weights.tolist()
                if self.class_weights is not None else None
            ),
        }

    def _save(self, role: str, epoch: int) -> None:
        # EVERY process participates: orbax save has internal cross-process
        # barriers (main-only calls deadlock multi-host jobs); the store
        # keeps filesystem writes on process 0. The save decision is driven
        # by gathered metrics, identical on every process.
        self.store.save(role, arrays=self._arrays(), meta=self._meta(epoch))

    def _restore_arrays(self, arrays: dict) -> None:
        self.state = self.state.replace(
            params=flax.serialization.from_state_dict(
                self.state.params, arrays["params"]
            ),
            batch_stats=flax.serialization.from_state_dict(
                self.state.batch_stats, arrays["batch_stats"]
            ),
            opt_state=flax.serialization.from_state_dict(
                self.state.opt_state, arrays["opt_state"]
            ),
            step=int(arrays["step"]),
        )

    def _resume(self) -> None:
        arrays, meta = self.store.load("last")
        self._restore_arrays(arrays)
        self.start_epoch = int(meta.get("epoch", -1)) + 1
        self.best_val_loss = float(meta.get("best_val_loss", float("inf")))
        self.best_mini_loss = float(meta.get("best_mini_loss", float("inf")))
        if meta.get("history"):
            self.history = TrainingHistory.from_list(
                self.cfg.data.class_names, meta["history"]
            )
        self.log.info(
            "resumed from epoch %d (step %d)", self.start_epoch, self.state.step
        )

    def load_role(self, role: str) -> None:
        arrays, _ = self.store.load(role)
        self._restore_arrays(arrays)

    # ------------------------------------------------------------------
    # evaluation
    # ------------------------------------------------------------------
    def evaluate(self, loader: ClipLoader, max_batches: Optional[int] = None,
                 epoch: int = 0) -> Dict:
        """Sharded evaluation + gather (gen-3b semantics)."""
        loader.set_epoch(epoch)
        t_eval = time.time()
        # The loop only DISPATCHES: device outputs are stashed and synced
        # once after the last batch, so host↔device latency never stalls the
        # eval pipeline (VERDICT r1: per-batch float() syncs).
        dev_outs, targets, masks, pads, ids = [], [], [], [], []
        it = device_prefetch(iter(loader), self.strategy.data_sharding)
        for i, batch in enumerate(it):
            if max_batches is not None and i >= max_batches:
                break
            # error/pad stay host-local numpy (device_prefetch only ships
            # frames/sensor/target); the step input mask is globalized so
            # its batch axis matches the (possibly multi-host) frame array.
            mask_np = ~(batch["error"] | batch["pad"])
            mask = self.strategy.globalize(mask_np.astype(np.float32))
            step_kw = ({"sensor": batch["sensor"]}
                       if self.cfg.model.use_sensor else {})
            out = self.eval_step(
                self.state, batch["frames"], batch["target"], mask, **step_kw
            )
            dev_outs.append((out["probs"], out["preds"], out["loss"],
                             int(mask_np.sum())))
            targets.append(self.strategy.to_host(batch["target"]))
            masks.append(mask_np)
            pads.append(np.asarray(batch["pad"], bool))
            ids.extend(batch["id"])  # pads filtered after the gather
        if not targets:
            return {"loss": float("nan"), "num_samples": 0}

        probs = [self.strategy.to_host(p).astype(np.float32)
                 for p, _, _, _ in dev_outs]
        preds = [self.strategy.to_host(p) for _, p, _, _ in dev_outs]
        losses = [float(l) for _, _, l, _ in dev_outs]
        counts = [c for _, _, _, c in dev_outs]

        arrays = {
            "probs": np.concatenate(probs),
            "preds": np.concatenate(preds),
            "targets": np.concatenate(targets),
            "mask": np.concatenate(masks),
            "pad": np.concatenate(pads),
            "ids": _ids_to_bytes(ids),
            "loss_sum": np.array(
                [sum(l * c for l, c in zip(losses, counts))], np.float64
            ),
            "count": np.array([sum(counts)], np.float64),
        }
        arrays = self.strategy.gather_eval(arrays)
        keep = ~arrays["pad"]
        for k in ("probs", "preds", "targets", "mask"):
            arrays[k] = arrays[k][keep]
        ids = _bytes_to_ids(arrays["ids"][keep])

        m = arrays["mask"]
        metrics = classification_metrics(
            arrays["targets"][m], arrays["preds"][m], arrays["probs"][m],
            self.cfg.model.num_classes, self.cfg.data.class_names,
        )
        total = max(float(arrays["count"].sum()), 1.0)
        metrics["loss"] = float(arrays["loss_sum"].sum() / total)
        metrics["eval_time_sec"] = time.time() - t_eval
        metrics["ids"] = ids
        metrics["_probs"] = arrays["probs"]
        metrics["_preds"] = arrays["preds"]
        metrics["_targets"] = arrays["targets"]
        return metrics

    # ------------------------------------------------------------------
    # training
    # ------------------------------------------------------------------
    def train(self, epochs: Optional[int] = None) -> TrainingHistory:
        tc = self.cfg.train
        epochs = epochs or tc.epochs
        patience_left = tc.patience
        mini_every = (
            max(1, self.steps_per_epoch // tc.validation_freq)
            if tc.validation_freq > 0 else 0
        )
        viz = None
        if tc.dashboard:
            from vision_collision_detection_tpu.obs.dashboard import (
                create_distributed_visualizer,
            )

            viz = create_distributed_visualizer(
                epochs, self.steps_per_epoch, self.run_dir
            )
        # cascade renders mini-val rows mid-epoch (reference :510,1204-1269)
        self._viz = viz
        self.log.info(
            "training %s: %d epochs × %d steps, %d val clips",
            self.cfg.name(), epochs, self.steps_per_epoch,
            len(self.val_loader.dataset),
        )
        if len(self.val_loader.dataset) == 0:
            self.log.warning(
                "validation set is EMPTY: no best-checkpoint tracking or "
                "early stopping will happen"
            )

        profiling = False
        if tc.profile_steps > 0 and self.strategy.is_main:
            jax.profiler.start_trace(os.path.join(self.run_dir, "profile"))
            profiling = True
        for epoch in range(self.start_epoch, epochs):
            t0 = time.time()
            if viz:
                viz.start_epoch(epoch)
            self.train_loader.set_epoch(epoch)
            acc = None  # device-side running metric sums, synced lazily
            n_steps = 0
            it = device_prefetch(
                iter(self.train_loader), self.strategy.data_sharding
            )
            for step_i, batch in enumerate(it):
                key = jax.random.fold_in(
                    jax.random.fold_in(
                        jax.random.PRNGKey(tc.seed), epoch * 131071 + step_i
                    ),
                    jax.process_index(),
                )
                mask = self.strategy.globalize(
                    (~(batch["error"] | batch["pad"])).astype(np.float32)
                )
                step_kw = ({"sensor": batch["sensor"]}
                           if self.cfg.model.use_sensor else {})
                self.state, m = self.train_step(
                    self.state, batch["frames"], batch["target"], mask, key,
                    **step_kw,
                )
                # no host sync here: one fused device add keeps the dispatch
                # queue ahead of the chip (metrics surface at log boundaries)
                acc = m if acc is None else _metric_sum(acc, m)
                n_steps += 1
                if profiling and n_steps >= tc.profile_steps:
                    jax.profiler.stop_trace()
                    profiling = False
                    self.log.info("profiler trace written to %s",
                                  os.path.join(self.run_dir, "profile"))
                if tc.log_every_steps and n_steps % tc.log_every_steps == 0:
                    vals = jax.device_get(acc)  # one sync per log window
                    elapsed = time.time() - t0
                    self.log.info(
                        "epoch %d step %d/%d loss %.4f acc %.3f (%.2f it/s)",
                        epoch, n_steps, self.steps_per_epoch,
                        vals["loss"] / n_steps, vals["accuracy"] / n_steps,
                        n_steps / max(elapsed, 1e-6),
                    )
                    if viz:
                        viz.update_train_loss(
                            vals["loss"] / n_steps, n_steps
                        )
                # mini-validation cascade (reference :1204-1269)
                if mini_every and (step_i + 1) % mini_every == 0:
                    self._mini_validate_cascade(epoch)

            vals = (jax.device_get(acc) if acc is not None
                    else {"loss": 0.0, "accuracy": 0.0})
            train_metrics = {
                "loss": float(vals["loss"]) / max(n_steps, 1),
                "accuracy": float(vals["accuracy"]) / max(n_steps, 1),
            }
            val = self.evaluate(self.val_loader, epoch=epoch)
            if viz:
                viz.update_full_val_metrics(
                    {k: v for k, v in val.items()
                     if isinstance(v, (int, float))}
                )
                viz.mark_epoch(epoch, train_metrics=dict(train_metrics))
            epoch_time = time.time() - t0
            lr = float(self.lr_schedule(self.state.step))
            self.history.append_epoch(
                epoch, train_metrics, val, lr=lr, epoch_time_sec=epoch_time
            )
            self.log.info(
                "epoch %d done in %.1fs: train loss %.4f val loss %.4f "
                "val acc %.3f val auc %s",
                epoch, epoch_time, train_metrics["loss"], val["loss"],
                val.get("accuracy", float("nan")),
                f"{val['auc']:.4f}" if "auc" in val and np.isfinite(
                    val.get("auc", np.nan)) else "n/a",
            )

            if self.strategy.is_main:
                save_metrics_json(
                    os.path.join(self.run_dir, f"validation_epoch{epoch}.json"),
                    {k: v for k, v in val.items() if not k.startswith("_")
                     and k != "ids"},
                )
                self.history.save_csv(
                    os.path.join(self.run_dir, "training_history.csv")
                )
            if val["loss"] < self.best_val_loss:
                self.best_val_loss = val["loss"]
                self._save("best", epoch)
                patience_left = tc.patience
            else:
                patience_left -= 1
            if tc.checkpoint_every_epochs and (
                epoch % tc.checkpoint_every_epochs == 0
            ):
                self.store.save_epoch(
                    epoch, arrays=self._arrays(), meta=self._meta(epoch)
                )
            self._save("last", epoch)

            if patience_left <= 0:
                self.log.info("early stopping at epoch %d", epoch)
                break

        if profiling:
            jax.profiler.stop_trace()
        if self.strategy.is_main and self.history.records:
            try:
                from vision_collision_detection_tpu.obs.plots import (
                    plot_training_curves,
                )

                plot_training_curves(
                    self.history.to_dataframe(),
                    os.path.join(self.run_dir, "training_curves.png"),
                )
            except Exception as e:  # plotting must never kill a run
                self.log.warning("training-curve plot failed: %s", e)
        # reload best for subsequent test/inference (reference :1096-1098)
        if self.store.exists("best"):
            self.load_role("best")
        return self.history

    def _mini_validate_cascade(self, epoch: int) -> None:
        tc = self.cfg.train
        mini = self.evaluate(
            self.mini_val_loader, max_batches=tc.mini_val_batches, epoch=epoch
        )
        viz = getattr(self, "_viz", None)
        if viz:
            viz.update_val_metrics(
                {k: v for k, v in mini.items() if isinstance(v, (int, float))}
            )
        if mini.get("num_samples", 0) and mini["loss"] < self.best_mini_loss:
            self.best_mini_loss = mini["loss"]
            full = self.evaluate(self.val_loader, epoch=epoch)
            self.log.info(
                "mini-val improved (%.4f) → full val loss %.4f",
                mini["loss"], full["loss"],
            )
            if viz:
                viz.update_full_val_metrics(
                    {k: v for k, v in full.items()
                     if isinstance(v, (int, float))}
                )
            if full["loss"] < self.best_val_loss:
                self.best_val_loss = full["loss"]
                self._save("best", epoch)

    # ------------------------------------------------------------------
    # test
    # ------------------------------------------------------------------
    def test(self) -> Dict:
        if self.test_loader is None:
            raise ValueError("no test dataset configured")
        role = self.store.latest_role()
        if role:
            self.load_role(role)
            self.log.info("testing with checkpoint role %r", role)
        metrics = self.evaluate(self.test_loader)
        if self.strategy.is_main and metrics.get("confusion_matrix"):
            try:
                from vision_collision_detection_tpu.obs.plots import (
                    plot_confusion_matrix,
                )

                plot_confusion_matrix(
                    metrics["confusion_matrix"], self.cfg.data.class_names,
                    os.path.join(self.run_dir, "confusion_matrix.png"),
                )
            except Exception as e:
                self.log.warning("confusion-matrix plot failed: %s", e)
        if self.strategy.is_main:
            save_metrics_json(
                os.path.join(self.run_dir, "test_results.json"),
                {k: v for k, v in metrics.items() if not k.startswith("_")
                 and k != "ids"},
            )
            if metrics.get("num_samples", 0):
                n = min(len(metrics["ids"]), len(metrics["_targets"]))
                save_predictions_csv(
                    os.path.join(self.run_dir, "test_predictions.csv"),
                    metrics["ids"][:n], metrics["_targets"][:n],
                    metrics["_preds"][:n], metrics["_probs"][:n],
                    self.cfg.data.class_names,
                )
        return metrics
