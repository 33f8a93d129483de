"""Data layer tests over the synthetic fixture."""

import numpy as np
import pandas as pd
import pytest

from vision_collision_detection_tpu.data import (
    ClipDataset,
    ClipLoader,
    ClipRecord,
    add_split_column_to_metadata,
    compute_class_weights,
    create_datasets_with_manual_split,
    device_prefetch,
)
from vision_collision_detection_tpu.media.synthetic import generate_dataset


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    csv = generate_dataset(
        str(root), clips_per_class=3, num_frames=30, height=48, width=64,
        splits=("train", "train", "val"),
    )
    df = pd.read_csv(csv).fillna({"sensor_path": ""})
    # round-robin per class k%3: k=2 → val; add a test row by relabeling one val
    df.loc[df.index[-1], "split"] = "test"
    return df


def test_manual_split_factory(fixture):
    train, val, test = create_datasets_with_manual_split(
        fixture, fps=10, duration=2, frame_size=32, load_sensor=True,
    )
    assert len(train) == 6 and len(val) + len(test) == 3
    s = train[0]
    assert s["frames"].shape == (20, 32, 32, 3)
    assert s["frames"].dtype == np.uint8
    assert s["sensor"].shape == (20, 4)
    assert not s["error"]
    assert s["target"] in (0, 1, 2)


def test_bad_video_zero_fallback():
    ds = ClipDataset(
        [ClipRecord("bad", "/nonexistent.mp4", 1)],
        fps=5, duration=2, frame_size=16,
    )
    s = ds[0]
    assert s["error"] and s["frames"].sum() == 0
    assert s["frames"].shape == (10, 16, 16, 3)
    assert s["target"] == 1


def test_event_time_centering(fixture):
    row = fixture[fixture["video_type"] == "Collision"].iloc[0]
    ds = ClipDataset(
        [ClipRecord(row["id"], row["video_path"], 2,
                    event_time_sec=row["event_time_sec"])],
        fps=10, duration=1, frame_size=32, sample_strategy="metadata_time",
    )
    s = ds[0]
    assert s["frames"].max() > 240  # lossy codec ≈ white flash
    mid = s["frames"][5]
    content = mid[8:24]  # 48x64→content 24 rows centered
    assert content.mean() > 200  # the white flash dominates


def test_class_weights():
    w = compute_class_weights([0, 0, 0, 1, 2, 2], 3)
    assert w[1] > w[2] > w[0]
    np.testing.assert_allclose(w, [6 / 9, 6 / 3, 6 / 6], rtol=1e-6)


def test_split_column_stratified():
    df = pd.DataFrame({
        "video_type": ["A"] * 20 + ["B"] * 10,
        "id": range(30),
    })
    out = add_split_column_to_metadata(df, train_frac=0.7, val_frac=0.15)
    assert set(out["split"]) == {"train", "val", "test"}
    a = out[out["video_type"] == "A"]["split"]
    assert (a == "train").sum() == 14


class TestLoader:
    def _dataset(self, fixture, n=None):
        train, _, _ = create_datasets_with_manual_split(
            fixture, fps=10, duration=1, frame_size=32,
        )
        return train

    def test_batching_shapes(self, fixture):
        ds = self._dataset(fixture)
        loader = ClipLoader(ds, batch_size=4, num_workers=2)
        batches = list(loader)
        assert len(batches) == len(loader) == 2  # 6 samples → 4 + 2
        assert batches[0]["frames"].shape == (4, 10, 32, 32, 3)
        assert batches[1]["frames"].shape == (2, 10, 32, 32, 3)
        assert len(batches[0]["id"]) == 4

    def test_drop_last_and_shuffle_epochs(self, fixture):
        ds = self._dataset(fixture)
        loader = ClipLoader(ds, batch_size=4, shuffle=True, drop_last=True,
                            num_workers=2)
        assert len(loader) == 1
        loader.set_epoch(0)
        ids0 = [b["id"] for b in loader]
        loader.set_epoch(0)
        assert [b["id"] for b in loader] == ids0  # reproducible
        loader.set_epoch(1)
        ids1 = [b["id"] for b in loader]
        assert ids1 != ids0  # reshuffled

    def test_sharding_partitions_evenly(self, fixture):
        ds = self._dataset(fixture)  # 6 samples
        seen = []
        for shard in range(4):
            loader = ClipLoader(ds, batch_size=2, num_shards=4,
                                shard_index=shard, num_workers=1)
            for b in loader:
                seen.extend(b["id"])
        # wrap-pad to 8: every shard yields 2 samples
        assert len(seen) == 8
        assert set(seen) == set(r.video_id for r in ds.records)

    def test_native_batch_equals_per_sample(self, fixture):
        """The C++ batch decoder path must produce the same batches as the
        per-sample thread-pool path."""
        from vision_collision_detection_tpu.data.loader import collate

        ds = self._dataset(fixture)
        idxs = list(range(4))
        native = ds.get_batch(idxs, epoch=0)
        single = collate([ds.get(i, epoch=0) for i in idxs])
        np.testing.assert_array_equal(native["frames"], single["frames"])
        np.testing.assert_array_equal(native["target"], single["target"])
        assert native["id"] == single["id"]
        np.testing.assert_array_equal(native["error"], single["error"])

    def test_native_batch_bad_clip_zeroed(self):
        from vision_collision_detection_tpu.data import ClipDataset, ClipRecord

        ds = ClipDataset(
            [ClipRecord("bad", "/nonexistent.mp4", 2)],
            fps=5, duration=1, frame_size=16,
        )
        batch = ds.get_batch([0])
        assert batch["error"][0]
        assert batch["frames"].sum() == 0
        assert batch["frames"].shape == (1, 5, 16, 16, 3)

    def test_device_prefetch_abandonment_stops_producer(self, fixture):
        """Breaking out of device_prefetch (mini-validation pattern) must
        release the producer thread instead of leaking it."""
        import gc
        import threading
        import time

        ds = self._dataset(fixture)
        loader = ClipLoader(ds, batch_size=2, num_workers=1)
        before = threading.active_count()
        it = device_prefetch(iter(loader))
        next(it)
        it.close()  # GeneratorExit → finally → stop event
        del it
        gc.collect()
        deadline = time.time() + 5
        while threading.active_count() > before and time.time() < deadline:
            time.sleep(0.05)
        assert threading.active_count() <= before + 1

    def test_device_prefetch(self, fixture):
        import jax

        ds = self._dataset(fixture)
        loader = ClipLoader(ds, batch_size=3, num_workers=2)
        out = list(device_prefetch(iter(loader)))
        assert len(out) == 2
        assert isinstance(out[0]["frames"], jax.Array)
        assert out[0]["frames"].dtype == np.uint8
        assert out[0]["id"] is not None
