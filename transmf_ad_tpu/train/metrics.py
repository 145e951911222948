"""Metric accumulators: accuracy, confusion matrix, ROC-AUC, averages.

The reference wires pytorch-ignite metrics per engine (reference:
kfold_train_adversarial.py:177-187) and derives sen/spe/f1 from the 2x2
confusion matrix (reference: utils/utils.py:44-51). Here:

 - `MetricState` is a pytree of device-side partial sums (psum-friendly:
   every field is an additive accumulator), updated inside the jitted step;
 - exact ROC-AUC (Mann-Whitney with tie correction, sklearn-equivalent) is
   computed from collected scores at epoch end — eval sets are tiny;
 - `streaming_auc_*` provides a fixed-bucket device-side alternative for
   scale, accurate to 1/n_bins.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np
from flax import struct


class MetricState(struct.PyTreeNode):
    correct: jnp.ndarray  # ()
    total: jnp.ndarray  # ()
    loss_sum: jnp.ndarray  # () sum of per-batch mean losses
    batches: jnp.ndarray  # ()
    confusion: jnp.ndarray  # (2, 2) [true, pred]

    @classmethod
    def zero(cls):
        # explicit dtype: weak-typed zeros would retrace the jitted eval
        # step on the second batch (output arrays are strongly typed)
        z = jnp.zeros((), jnp.float32)
        return cls(correct=z, total=z, loss_sum=z, batches=z,
                   confusion=jnp.zeros((2, 2), jnp.float32))

    def update(self, logits, labels, loss, mask=None) -> "MetricState":
        """Accumulate one batch. `mask` (B,) zeroes padded samples so a
        ragged final batch can be padded to a fixed shape (one jit compile,
        shardable) without biasing the metrics. `loss` may be a per-sample
        vector (preferred; masked sum accumulates — final loss is the
        per-sample mean, matching ignite's Loss metric) or a batch-mean
        scalar (weighted by the valid count)."""
        if mask is None:
            mask = jnp.ones(labels.shape[0], jnp.float32)
        mask = mask.astype(jnp.float32)
        pred = jnp.argmax(logits, axis=-1)
        correct = jnp.sum((pred == labels) * mask)
        onehot_t = jnp.eye(2)[labels] * mask[:, None]  # (B, 2)
        onehot_p = jnp.eye(2)[pred]
        conf = jnp.einsum("bi,bj->ij", onehot_t, onehot_p)
        loss = jnp.asarray(loss)
        n_valid = jnp.sum(mask)
        loss_sum = (jnp.sum(loss * mask) if loss.ndim else loss * n_valid)
        return MetricState(
            correct=self.correct + correct,
            total=self.total + n_valid,
            loss_sum=self.loss_sum + loss_sum,
            batches=self.batches + 1,
            confusion=self.confusion + conf,
        )


def confusion_metrics(c: np.ndarray) -> Dict[str, float]:
    """sen/spe/f1/precision/recall from a 2x2 [true, pred] confusion matrix
    (reference: utils/utils.py:44-51: TP=c[1,1], FN=c[1,0], FP=c[0,1])."""
    tp, fn, fp, tn = c[1, 1], c[1, 0], c[0, 1], c[0, 0]
    precision = tp / (tp + fp) if (tp + fp) else float("nan")
    recall = tp / (tp + fn) if (tp + fn) else float("nan")
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision and recall and np.isfinite(precision) and np.isfinite(recall)
        and (precision + recall) > 0
        else float("nan")
    )
    sen = recall
    spe = tn / (fp + tn) if (fp + tn) else float("nan")
    return {"sen": float(sen), "spe": float(spe), "f1": float(f1),
            "precision": float(precision), "recall": float(recall)}


def roc_auc(scores: np.ndarray, labels: np.ndarray) -> float:
    """Exact ROC-AUC via the rank statistic, with midrank tie handling
    (equivalent to sklearn.metrics.roc_auc_score for binary labels)."""
    scores = np.asarray(scores, np.float64)
    labels = np.asarray(labels)
    pos = labels == 1
    n_pos, n_neg = int(pos.sum()), int((~pos).sum())
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    order = np.argsort(scores, kind="mergesort")
    ranks = np.empty(len(scores), np.float64)
    sorted_scores = scores[order]
    i = 0
    r = 1.0
    while i < len(scores):
        j = i
        while j + 1 < len(scores) and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        ranks[order[i : j + 1]] = (r + r + (j - i)) / 2.0  # midrank
        r += j - i + 1
        i = j + 1
    auc = (ranks[pos].sum() - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)
    return float(auc)


def streaming_auc_init(n_bins: int = 512):
    """Device-side bucketed AUC state: per-bin positive/negative counts."""
    return {"pos": jnp.zeros(n_bins), "neg": jnp.zeros(n_bins)}


def streaming_auc_update(state, probs, labels):
    """probs: (B,) positive-class probabilities in [0, 1]."""
    n_bins = state["pos"].shape[0]
    idx = jnp.clip((probs * n_bins).astype(jnp.int32), 0, n_bins - 1)
    onehot = jnp.eye(n_bins)[idx]  # (B, n_bins)
    is_pos = (labels == 1).astype(jnp.float32)
    return {
        "pos": state["pos"] + is_pos @ onehot,
        "neg": state["neg"] + (1.0 - is_pos) @ onehot,
    }


def streaming_auc_result(state) -> float:
    """AUC = P(score_pos > score_neg) + 0.5 P(equal), binned."""
    pos = np.asarray(state["pos"], np.float64)
    neg = np.asarray(state["neg"], np.float64)
    n_pos, n_neg = pos.sum(), neg.sum()
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    neg_below = np.cumsum(neg) - neg  # negatives strictly below each bin
    wins = (pos * neg_below).sum() + 0.5 * (pos * neg).sum()
    return float(wins / (n_pos * n_neg))
