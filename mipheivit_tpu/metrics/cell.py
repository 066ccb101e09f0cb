"""Single-cell metrics: per-nucleus pooling -> AUC/F1 via logreg gating.

Reference: ``CellMetrics`` (src/metrics.py:11-253) — streaming per-slide
accumulation of per-nucleus marker sums + pixel counts (quantized uint32/
uint16 on the host), per-cell mean dataframe across tiles (area > min
filter), merge with GMM-gated ground-truth ``{m}_pos`` columns from
per-slide nuclei CSVs, then a OneVsRest logistic regression trained on the
epoch's cells; reports mean + per-marker AUC / AUC-logreg / balanced-acc /
F1. Hoechst/Dapi are excluded (src/metrics.py:14).

TPU-native twist: the pooling runs on device as a fixed-capacity
``nucleus_pool`` (jit/vmap, no per-sample host sync inside the step); only
the compact per-nucleus statistics cross to the host, already quantized.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from ..ops.segment_pool import nucleus_pool

EXCLUDED_MARKERS = ("Hoechst", "Dapi")


@dataclasses.dataclass
class LogRegHead:
    """sklearn-derived linear gating head (reference folds the scaler into
    the weights and bakes an nn.Linear — src/metrics.py:232-248)."""

    weight: np.ndarray  # [n_markers, n_markers]
    bias: np.ndarray    # [n_markers]

    def predict_proba(self, x: np.ndarray) -> np.ndarray:
        logits = x @ self.weight.T + self.bias
        return 1.0 / (1.0 + np.exp(-logits))

    def state_dict(self) -> Dict[str, np.ndarray]:
        return {"weight": self.weight, "bias": self.bias}


class CellMetrics:
    def __init__(self, slide_dataframe: pd.DataFrame,
                 marker_names: Sequence[str], min_area: int = 20,
                 capacity: int = 2048):
        filtered = [(i, n) for i, n in enumerate(marker_names)
                    if n not in EXCLUDED_MARKERS]
        self.marker_names = [n for _, n in filtered]
        self.marker_idxs = [i for i, _ in filtered]
        self.marker_cols = [f"{n}_pos" for n in self.marker_names]
        self.marker_pred_cols = [f"{n}_pred" for n in self.marker_names]
        self.min_area = min_area
        self.capacity = capacity
        self.slide_names = slide_dataframe["in_slide_name"].tolist()
        self.csv_path_dict = dict(zip(slide_dataframe["in_slide_name"],
                                      slide_dataframe["nuclei_csv_path"]))
        self.reset()

    def reset(self):
        self._acc: Dict[str, List[Tuple[np.ndarray, np.ndarray, np.ndarray]]] = {
            name: [] for name in self.slide_names}

    # -- device-side pooling + host accumulation --------------------------
    def pool(self, preds, nuclei_masks):
        """Jit-friendly pooling: preds NHWC in (-0.9,0.9), nuclei [B,H,W]
        int. Returns (ids, sums, counts) device arrays."""
        import jax.numpy as jnp

        p = jnp.clip(preds[..., jnp.asarray(self.marker_idxs)], -0.9, 0.9)
        p = (p + 0.9) / 1.8
        return nucleus_pool(p.astype(jnp.float32),
                            nuclei_masks.astype(jnp.int32), self.capacity)

    def update(self, preds, nuclei_masks, slide_names: Sequence[str]):
        ids, sums, counts = map(np.asarray, self.pool(preds, nuclei_masks))
        for b, slide_name in enumerate(slide_names):
            valid = (counts[b] > 0) & (ids[b] > 0)
            if not valid.any():
                continue
            # quantization parity (reference: src/metrics.py:68-70)
            self._acc[slide_name].append((
                ids[b][valid].astype(np.uint32),
                (sums[b][valid] * 255.0).astype(np.uint32),
                counts[b][valid].astype(np.uint16),
            ))

    # -- host-side dataframes ---------------------------------------------
    def get_dataframe_cell_pred(self) -> pd.DataFrame:
        frames = []
        for slide_name in self.slide_names:
            chunks = self._acc[slide_name]
            if not chunks:
                continue
            df = pd.DataFrame()
            df["cell_id"] = np.uint64(np.concatenate([c[0] for c in chunks]))
            sums = np.concatenate([c[1] for c in chunks]).astype(np.float64)
            df[self.marker_pred_cols] = sums
            df["area"] = np.concatenate([c[2] for c in chunks]).astype(np.int64)
            cols = self.marker_pred_cols + ["area"]
            df = df.groupby("cell_id")[cols].sum().reset_index(drop=False)
            df = df[df["area"] > self.min_area]
            df[self.marker_pred_cols] = df[self.marker_pred_cols].astype(
                np.float32).div(df["area"], axis=0)
            df["slide_name"] = pd.Categorical([slide_name] * len(df))
            frames.append(df)
        if not frames:
            return pd.DataFrame(columns=["cell_id", *self.marker_pred_cols,
                                         "area", "slide_name"])
        return pd.concat(frames, ignore_index=True)

    def get_dataframe_cell_target(self, slide_names=None) -> pd.DataFrame:
        usecols = ["label"] + self.marker_cols
        frames = []
        for slide_name in (slide_names if slide_names is not None
                           else self.slide_names):
            df = pd.read_csv(self.csv_path_dict[slide_name], usecols=usecols)
            df["slide_name"] = pd.Categorical([slide_name] * len(df))
            frames.append(df)
        return pd.concat(frames, ignore_index=True)

    def get_dataframe_cell_pred_target(self) -> pd.DataFrame:
        pred = self.get_dataframe_cell_pred()
        target = self.get_dataframe_cell_target(pred["slide_name"].unique())
        df = pred.merge(target, left_on=["slide_name", "cell_id"],
                        right_on=["slide_name", "label"], how="left")
        df = df.drop(columns=["area"])
        df = df[~df["label"].isna()]
        df[self.marker_cols] = df[self.marker_cols].astype(bool)
        return df

    # -- logreg gating -----------------------------------------------------
    def train_logistic_regression(self, train_dataframe,
                                  test_dataframe=None,
                                  return_metrics: bool = True):
        from sklearn.linear_model import LogisticRegression
        from sklearn.metrics import (balanced_accuracy_score, f1_score,
                                     roc_auc_score)
        from sklearn.multiclass import OneVsRestClassifier
        from sklearn.preprocessing import StandardScaler

        x_train = train_dataframe[self.marker_pred_cols].values
        y_train = train_dataframe[self.marker_cols].values
        scaler = StandardScaler()
        xs = scaler.fit_transform(x_train)
        model = OneVsRestClassifier(
            LogisticRegression(class_weight="balanced", random_state=42))
        model.fit(xs, y_train)

        results = None
        if return_metrics:
            if test_dataframe is None:
                x_test, y_test = x_train, y_train
            else:
                x_test = test_dataframe[self.marker_pred_cols].values
                y_test = test_dataframe[self.marker_cols].values
            proba = model.predict_proba(scaler.transform(x_test))
            pred = model.predict(scaler.transform(x_test))
            results = []
            for idx, marker in enumerate(self.marker_cols):
                results.append((
                    marker,
                    roc_auc_score(y_test[:, idx], proba[:, idx]),
                    balanced_accuracy_score(y_test[:, idx], pred[:, idx]),
                    f1_score(y_test[:, idx], pred[:, idx]),
                ))

        # fold the scaler into a plain linear head (reference: :232-248)
        means, stds = scaler.mean_, scaler.scale_
        n = len(self.marker_cols)
        weights = np.vstack([
            est.coef_.flatten() if hasattr(est, "coef_") else np.zeros(n)
            for est in model.estimators_])
        bias = np.hstack([
            est.intercept_.flatten() if hasattr(est, "intercept_") else 0.0
            for est in model.estimators_])
        head = LogRegHead(
            weight=(weights / stds).astype(np.float32),
            bias=(bias - np.sum(weights * means / stds, axis=1)).astype(np.float32),
        )
        if return_metrics:
            return results, head
        return head

    # -- epoch finalize ----------------------------------------------------
    def compute(self, logreg_head: Optional[LogRegHead] = None,
                return_dataframe: bool = False):
        from sklearn.metrics import (balanced_accuracy_score, f1_score,
                                     roc_auc_score)

        dataframe = self.get_dataframe_cell_pred_target()
        metrics: Dict = {"auc": 0.0, "auc_logreg": 0.0,
                         "balanced_acc": 0.0, "f1": 0.0}
        if logreg_head is None:
            logreg_head = self.train_logistic_regression(
                dataframe, return_metrics=False)
        preds = dataframe[self.marker_pred_cols].to_numpy()
        targets = dataframe[self.marker_cols].to_numpy()
        probs = logreg_head.predict_proba(preds)
        hard = probs > 0.5

        for idx, marker_col in enumerate(self.marker_cols):
            t = targets[..., idx]
            if len(t) == 0 or len(np.unique(t)) == 1:
                continue
            auc = roc_auc_score(t, preds[..., idx])
            auc_lr = roc_auc_score(t, probs[..., idx])
            bacc = balanced_accuracy_score(t, hard[..., idx])
            f1 = f1_score(t, hard[..., idx])
            metrics[f"{marker_col}_auc"] = auc
            metrics[f"{marker_col}_auc_logreg"] = auc_lr
            metrics[f"{marker_col}_balanced_acc"] = bacc
            metrics[f"{marker_col}_f1"] = f1
            metrics["auc"] += auc
            metrics["auc_logreg"] += auc_lr
            metrics["balanced_acc"] += bacc
            metrics["f1"] += f1
        n = len(self.marker_names)
        for key in ("auc", "auc_logreg", "balanced_acc", "f1"):
            metrics[key] /= n
        metrics["state_dict"] = logreg_head.state_dict()
        metrics["logreg_head"] = logreg_head
        self.reset()
        if return_dataframe:
            return metrics, dataframe
        return metrics


def find_best_threshold(y_true, y_pred, low=0, high=10, tol=1e-3):
    """Ternary search for the balanced-accuracy-optimal threshold
    (reference: src/metrics.py:256-278)."""
    from sklearn.metrics import balanced_accuracy_score

    best_thresh, best_score = None, 0.0
    while (high - low) > tol:
        mid1 = low + (high - low) / 3
        mid2 = high - (high - low) / 3
        s1 = balanced_accuracy_score(y_true=y_true, y_pred=y_pred > mid1)
        s2 = balanced_accuracy_score(y_true=y_true, y_pred=y_pred > mid2)
        if s1 > s2:
            high = mid2
            if s1 > best_score:
                best_score, best_thresh = s1, mid1
        else:
            low = mid1
            if s2 > best_score:
                best_score, best_thresh = s2, mid2
    return best_thresh, best_score
