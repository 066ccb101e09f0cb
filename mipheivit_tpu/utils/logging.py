"""Observability: metrics stream + debug image dumps.

The reference's backbone is Weights & Biases (reference: src/train.py:173-179,
src/callbacks.py) — here the primary sink is a local ``metrics.jsonl``
(always on, greppable, survives offline runs) with W&B mirroring when the
package is importable, plus the ``DebugImageLogger``-style PNG grids
(reference: src/callbacks.py:19-118).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, Optional

import numpy as np


class MetricsLogger:
    def __init__(self, logdir: str, project: Optional[str] = None,
                 run_name: Optional[str] = None, config: Optional[Dict] = None,
                 use_wandb: bool = True):
        self.logdir = Path(logdir)
        self.logdir.mkdir(parents=True, exist_ok=True)
        self.path = self.logdir / "metrics.jsonl"
        self._fh = open(self.path, "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(
                    project=project or "mipheivit-tpu", name=run_name,
                    dir=str(self.logdir), config=config or {})
            except Exception:
                self._wandb = None

    def log(self, metrics: Dict, step: Optional[int] = None):
        payload = {"time": time.time()}
        if step is not None:
            payload["step"] = int(step)
        for k, v in metrics.items():
            if hasattr(v, "item"):
                v = v.item()
            if isinstance(v, (int, float, bool, str)) and not (
                    isinstance(v, float) and not np.isfinite(v)):
                payload[k] = v
        self._fh.write(json.dumps(payload) + "\n")
        self._fh.flush()
        if self._wandb is not None:
            self._wandb.log(
                {k: v for k, v in payload.items() if k != "time"}, step=step)

    def finish(self):
        self._fh.close()
        if self._wandb is not None:
            self._wandb.finish()


def save_image_grid(path: str, he: np.ndarray, pred: np.ndarray,
                    target: Optional[np.ndarray] = None,
                    max_images: int = 4) -> None:
    """Input | per-marker predictions | targets grid as one PNG
    (reference DebugImageLogger semantics: src/callbacks.py:19-118)."""
    import cv2

    n = min(max_images, he.shape[0])
    rows = []
    for i in range(n):
        cols = [np.clip(he[i], 0, 255).astype(np.uint8)]
        pr = ((np.clip(pred[i], -0.9, 0.9) + 0.9) / 1.8 * 255).astype(np.uint8)
        for c in range(pr.shape[-1]):
            cols.append(np.repeat(pr[..., c:c + 1], 3, axis=-1))
        if target is not None:
            tg = ((np.clip(target[i], -0.9, 0.9) + 0.9) / 1.8 * 255).astype(np.uint8)
            for c in range(tg.shape[-1]):
                cols.append(np.repeat(tg[..., c:c + 1], 3, axis=-1))
        rows.append(np.concatenate(cols, axis=1))
    grid = np.concatenate(rows, axis=0)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    cv2.imwrite(str(path), cv2.cvtColor(grid, cv2.COLOR_RGB2BGR))
