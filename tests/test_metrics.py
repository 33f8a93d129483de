"""Metrics vs sklearn golden values (sklearn available in the test env only)."""

import numpy as np
import pytest
from sklearn.metrics import (
    confusion_matrix as sk_confusion,
    precision_recall_fscore_support as sk_prfs,
    roc_auc_score as sk_auc,
)

from vision_collision_detection_tpu.metrics import (
    accuracy,
    binary_roc_auc,
    classification_metrics,
    confusion_matrix,
    precision_recall_f1,
    weighted_ovr_auc,
)

NUM_CLASSES = 3


def _fake_preds(rng, n=500):
    y_true = rng.integers(0, NUM_CLASSES, size=n)
    logits = rng.normal(size=(n, NUM_CLASSES))
    # correlate logits with truth so AUC is meaningful
    logits[np.arange(n), y_true] += 1.5
    probs = np.exp(logits) / np.exp(logits).sum(axis=1, keepdims=True)
    y_pred = probs.argmax(axis=1)
    return y_true, y_pred, probs


def test_confusion_matrix(rng):
    y_true, y_pred, _ = _fake_preds(rng)
    np.testing.assert_array_equal(
        confusion_matrix(y_true, y_pred, NUM_CLASSES),
        sk_confusion(y_true, y_pred, labels=range(NUM_CLASSES)),
    )


def test_accuracy(rng):
    y_true, y_pred, _ = _fake_preds(rng)
    assert accuracy(y_true, y_pred) == pytest.approx((y_true == y_pred).mean())


def test_precision_recall_f1(rng):
    y_true, y_pred, _ = _fake_preds(rng)
    ours = precision_recall_f1(y_true, y_pred, NUM_CLASSES)
    p, r, f, s = sk_prfs(y_true, y_pred, labels=range(NUM_CLASSES), zero_division=0)
    np.testing.assert_allclose(ours["precision"], p, atol=1e-12)
    np.testing.assert_allclose(ours["recall"], r, atol=1e-12)
    np.testing.assert_allclose(ours["f1"], f, atol=1e-12)
    np.testing.assert_array_equal(ours["support"], s)
    wp, wr, wf, _ = sk_prfs(y_true, y_pred, average="weighted", zero_division=0)
    assert ours["weighted_precision"] == pytest.approx(wp)
    assert ours["weighted_recall"] == pytest.approx(wr)
    assert ours["weighted_f1"] == pytest.approx(wf)


def test_binary_auc_with_ties(rng):
    y = rng.integers(0, 2, size=300).astype(float)
    # quantize scores to force ties
    scores = np.round(rng.random(300) + 0.5 * y, 1)
    assert binary_roc_auc(y, scores) == pytest.approx(sk_auc(y, scores), abs=1e-12)


def test_binary_auc_degenerate():
    assert np.isnan(binary_roc_auc(np.ones(5), np.arange(5.0)))
    assert np.isnan(binary_roc_auc(np.zeros(5), np.arange(5.0)))


def test_weighted_ovr_auc(rng):
    y_true, _, probs = _fake_preds(rng)
    expected = sk_auc(y_true, probs, multi_class="ovr", average="weighted")
    assert weighted_ovr_auc(y_true, probs, NUM_CLASSES) == pytest.approx(
        expected, abs=1e-10
    )


def test_classification_metrics_layout(rng):
    y_true, y_pred, probs = _fake_preds(rng)
    m = classification_metrics(
        y_true, y_pred, probs, NUM_CLASSES,
        class_names=["Normal", "Near Collision", "Collision"],
    )
    for key in [
        "accuracy", "auc", "weighted_f1",
        "precision_normal", "recall_near_collision", "f1_collision",
        "support_collision", "confusion_matrix", "num_samples",
    ]:
        assert key in m, key
    assert m["num_samples"] == len(y_true)


def test_empty_inputs():
    m = classification_metrics(np.array([]), np.array([]), num_classes=3)
    assert m["accuracy"] == 0.0
    assert m["num_samples"] == 0
