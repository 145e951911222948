"""Checkpointing: best-by-metric retention + full-state resume.

The reference keeps n_saved=1 best-by-val-accuracy model files named
`best_label_net_model_<epoch>_accuracy=<v>.pt` and reloads them before the
test pass (reference: kfold_train_adversarial.py:222-233); it saves no
optimizer state and cannot resume mid-run. This module keeps the same
retention policy and filename scheme (msgpack payloads) and adds what the
reference lacks: a `latest` checkpoint carrying params + batch stats +
optimizer state + epoch for crash-resume.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Any, Dict, Optional

from flax import serialization


class BestCheckpointer:
    """Keep the n_saved best checkpoints by score (greater-or-equal wins,
    like the reference's greater_or_equal=True)."""

    def __init__(self, save_dir: str, prefix: str = "best_label_net_model",
                 score_name: str = "accuracy", n_saved: int = 1):
        self.save_dir = save_dir
        self.prefix = prefix
        self.score_name = score_name
        self.n_saved = n_saved
        self._saved = []  # list of (score, path), best last
        os.makedirs(save_dir, exist_ok=True)

    def maybe_save(self, target: Optional[Dict[str, Any]], score: float,
                   epoch: int, write: bool = True) -> Optional[str]:
        # greater_or_equal retention: skip only when full and strictly worse
        # than the current worst kept score.
        if len(self._saved) >= self.n_saved and score < self._saved[0][0]:
            return None
        path = os.path.join(
            self.save_dir,
            f"{self.prefix}_{epoch}_{self.score_name}={score:.4f}.msgpack",
        )
        if write:
            with open(path, "wb") as f:
                f.write(serialization.to_bytes(target))
        self._saved.append((score, path))
        self._saved.sort(key=lambda t: t[0])
        while len(self._saved) > self.n_saved:
            _, old = self._saved.pop(0)
            if write and os.path.exists(old):
                os.remove(old)
        return path

    def track(self, score: float, epoch: int) -> Optional[str]:
        """Record the retention decision WITHOUT touching disk: non-primary
        processes of a multi-host run mirror process 0's (identical) score
        stream so `best_path()` resolves to the same shared-storage file."""
        return self.maybe_save(None, score, epoch, write=False)

    def best_path(self) -> Optional[str]:
        if self._saved:
            return self._saved[-1][1]
        found = find_best(self.save_dir, self.prefix, self.score_name)
        return found


def find_best(save_dir: str, prefix: str = "best_label_net_model",
              score_name: str = "accuracy") -> Optional[str]:
    """Locate the best checkpoint on disk by the score in its filename."""
    pat = os.path.join(save_dir, f"{prefix}_*_{score_name}=*.msgpack")
    best, best_score = None, -float("inf")
    for p in glob.glob(pat):
        m = re.search(rf"{score_name}=([0-9.]+)\.msgpack$", p)
        if m:
            s = float(m.group(1))
            if s >= best_score:
                best, best_score = p, s
    return best


def load(path: str, target: Dict[str, Any]) -> Dict[str, Any]:
    """Restore a pytree saved with BestCheckpointer/`save_latest`."""
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


def save_latest(save_dir: str, target: Dict[str, Any]) -> str:
    """Full-state checkpoint for resume (params/batch_stats/opt_state/epoch)."""
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(save_dir, "latest.msgpack")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(target))
    os.replace(tmp, path)
    return path


def load_latest(save_dir: str, target: Dict[str, Any]) -> Optional[Dict[str, Any]]:
    path = os.path.join(save_dir, "latest.msgpack")
    if not os.path.exists(path):
        return None
    return load(path, target)
