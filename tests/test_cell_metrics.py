"""CellMetrics end-to-end: device pooling -> dataframes -> logreg -> AUC."""

import numpy as np
import pandas as pd
import pytest

import jax.numpy as jnp

from mipheivit_tpu.metrics.cell import CellMetrics, LogRegHead, find_best_threshold


@pytest.fixture
def setup(tmp_path, rng):
    markers = ["Hoechst", "CD31", "CD3e"]   # Hoechst excluded
    slide_names = ["s0", "s1"]
    rows = []
    csv_paths = {}
    for s in slide_names:
        cells = []
        for label in range(1, 30):
            cells.append({"label": label,
                          "CD31_pos": label % 2 == 0,
                          "CD3e_pos": label % 3 == 0})
        path = tmp_path / f"{s}_cells.csv"
        pd.DataFrame(cells).to_csv(path, index=False)
        csv_paths[s] = str(path)
        rows.append({"in_slide_name": s, "nuclei_csv_path": str(path)})
    slide_df = pd.DataFrame(rows)
    return slide_df, markers


def _make_batch(rng, labels_list, n_markers=3, hw=32):
    """Predictions correlated with ground truth: positive cells bright."""
    b = len(labels_list)
    nuclei = np.zeros((b, hw, hw), np.int32)
    preds = rng.uniform(-0.9, -0.5, (b, hw, hw, n_markers)).astype(np.float32)
    for i, labels in enumerate(labels_list):
        for j, lab in enumerate(labels):
            y, x = 4 + 8 * (j // 3), 4 + 8 * (j % 3)
            nuclei[i, y:y + 6, x:x + 6] = lab
            # CD31 (marker idx 1) bright iff label even; CD3e iff label % 3
            preds[i, y:y + 6, x:x + 6, 1] = 0.8 if lab % 2 == 0 else -0.8
            preds[i, y:y + 6, x:x + 6, 2] = 0.8 if lab % 3 == 0 else -0.8
    return preds, nuclei


def test_cell_metrics_end_to_end(setup, rng):
    slide_df, markers = setup
    cm = CellMetrics(slide_df, markers, min_area=20, capacity=64)
    assert cm.marker_names == ["CD31", "CD3e"]
    assert cm.marker_idxs == [1, 2]

    # two batches across both slides, cells split across tiles
    preds, nuclei = _make_batch(rng, [[1, 2, 3, 4], [5, 6, 7, 8]])
    cm.update(jnp.array(preds), jnp.array(nuclei), ["s0", "s1"])
    preds, nuclei = _make_batch(rng, [[4, 9, 10], [11, 12, 13]])
    cm.update(jnp.array(preds), jnp.array(nuclei), ["s0", "s1"])

    df = cm.get_dataframe_cell_pred()
    # cell 4 on s0 appears in both tiles -> merged into one row
    assert (df[df["slide_name"] == "s0"]["cell_id"] == 4).sum() == 1
    # merged area = 2 tiles x 36 px
    area = df[(df["slide_name"] == "s0") & (df["cell_id"] == 4)]["area"]
    assert int(area.iloc[0]) == 72

    metrics = cm.compute()
    # perfectly separable by construction
    assert metrics["auc"] > 0.99
    assert metrics["CD31_pos_auc"] > 0.99
    assert metrics["auc_logreg"] > 0.9
    assert 0 < metrics["f1"] <= 1
    assert "weight" in metrics["state_dict"]
    # accumulators cleared after compute
    assert all(len(v) == 0 for v in cm._acc.values())


def test_min_area_filter(setup, rng):
    slide_df, markers = setup
    cm = CellMetrics(slide_df, markers, min_area=40, capacity=64)
    preds, nuclei = _make_batch(rng, [[1, 2]])
    cm.update(jnp.array(preds), jnp.array(nuclei), ["s0"])
    df = cm.get_dataframe_cell_pred()
    assert len(df) == 0  # 36 px < 40


def test_logreg_head_reuse(setup, rng):
    """val-epoch head reused for test epoch (reference: models.py:329-342)."""
    slide_df, markers = setup
    cm = CellMetrics(slide_df, markers, capacity=64)
    preds, nuclei = _make_batch(rng, [[2, 3, 4, 6], [8, 9, 10, 12]])
    cm.update(jnp.array(preds), jnp.array(nuclei), ["s0", "s1"])
    metrics = cm.compute()
    head = metrics["logreg_head"]
    assert isinstance(head, LogRegHead)

    preds, nuclei = _make_batch(rng, [[14, 15, 16]])
    cm.update(jnp.array(preds), jnp.array(nuclei), ["s1"])
    metrics2, df = cm.compute(logreg_head=head, return_dataframe=True)
    assert len(df) == 3
    assert np.isfinite(metrics2["auc"])


def test_find_best_threshold():
    y = np.array([0, 0, 0, 1, 1, 1])
    p = np.array([1.0, 2.0, 3.0, 7.0, 8.0, 9.0])
    thresh, score = find_best_threshold(y, p)
    assert 3.0 < thresh < 7.0
    assert score == 1.0
