"""CheckpointStore tests: roles, pruning, fallback order, meta round-trip."""

import numpy as np
import pytest

from vision_collision_detection_tpu.ckpt import CheckpointStore, load_checkpoint


@pytest.fixture
def store(tmp_path):
    return CheckpointStore(str(tmp_path / "run"), keep_epochs=2)


def _arrays(v=1.0):
    return {"params": {"w": np.full((4, 4), v, np.float32)},
            "step": np.asarray(7)}


def test_save_load_roundtrip(store):
    store.save("best", arrays=_arrays(2.5), meta={"epoch": 3, "note": "x"})
    assert store.exists("best")
    arrays, meta = store.load("best")
    np.testing.assert_array_equal(arrays["params"]["w"],
                                  np.full((4, 4), 2.5, np.float32))
    assert meta["epoch"] == 3 and meta["note"] == "x"


def test_epoch_pruning(store):
    for e in range(5):
        store.save_epoch(e, arrays=_arrays(e), meta={"epoch": e})
    kept = sorted(
        n for n in __import__("os").listdir(store.run_dir)
        if n.startswith("epoch_")
    )
    assert kept == ["epoch_3", "epoch_4"]  # keep_epochs=2


def test_latest_role_fallback(store):
    assert store.latest_role() is None
    store.save_epoch(1, arrays=_arrays(), meta={})
    assert store.latest_role() == "epoch_1"
    store.save("last", arrays=_arrays(), meta={})
    assert store.latest_role() == "last"
    store.save("best", arrays=_arrays(), meta={})
    assert store.latest_role() == "best"


def test_overwrite_role_atomically(store):
    store.save("best", arrays=_arrays(1.0), meta={"epoch": 1})
    store.save("best", arrays=_arrays(9.0), meta={"epoch": 2})
    arrays, meta = store.load("best")
    assert float(arrays["params"]["w"][0, 0]) == 9.0
    assert meta["epoch"] == 2


def test_load_checkpoint_missing(tmp_path):
    with pytest.raises(Exception):
        load_checkpoint(str(tmp_path / "nothing"))
