"""CI-fast AUC-parity drift regression.

Runs the full parity harness (scripts/parity_harness.py::run_parity — torch
reference pipeline vs this framework on shared weights, head trained so the
probabilities separate like a real checkpoint) at a small configuration and
asserts the north-star budget (BASELINE.md: AUC parity ±0.002; oracle
/root/reference/nexar_train.py:1496-1506). Any drift in decode, the C++
resampler, device preprocessing, or the importer shows up here before it
can reach a committed PARITY artifact.
"""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from parity_harness import run_parity  # noqa: E402


@pytest.mark.slow
@pytest.mark.parametrize("temporal_mode", ["gru", "attention"])
def test_pipeline_parity_within_auc_budget(tmp_path, temporal_mode):
    """Two structurally different heads (recurrent scan vs transformer
    block) so head-path drift can't hide behind a single-head regression."""
    out = run_parity(
        backbone="resnet18", temporal_mode=temporal_mode,
        clips_per_class=3, frame_size=96, fps=5, duration=1,
        head_train_steps=80, workdir=str(tmp_path),
        height=180, width=320, batch_size=3, num_workers=2,
    )
    assert out["prediction_agreement"] == 1.0, out
    assert out["auc_delta"] <= 0.002, out
    assert out["within_auc_budget_0.002"], out
    # both pipelines must also be numerically close sample-by-sample
    assert out["max_abs_prob_diff"] < 0.05, out
