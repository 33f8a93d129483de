import time

from vision_collision_detection_tpu.obs.profiling import StepTimer, annotate


def test_step_timer_excludes_warmup():
    t = StepTimer(warmup_steps=2, items_per_step=4)
    for i in range(6):
        with t.step():
            time.sleep(0.02 if i >= 2 else 0.2)
    s = t.summary()
    assert s["steps"] == 4
    assert s["mean_ms"] < 100  # warmup excluded
    assert s["items_per_sec"] > 20


def test_annotate_context():
    with annotate("test-span"):
        pass


def test_empty_summary():
    assert StepTimer().summary() == {"steps": 0}
