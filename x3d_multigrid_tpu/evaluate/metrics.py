"""Evaluation metrics: Top-1 accuracy and streaming per-class average
precision.

:class:`APMeter` reproduces the reference meter's math (apmeter.py:98-136):
per class, scores are sorted descending, precision = cumsum(tp) / rank, and
AP = mean precision at the positive positions, with the weighted variant
substituting weight-cumsums.  Buffers grow geometrically (1.5x) like the
reference (apmeter.py:77-85) so repeated ``add`` calls stay amortized O(1).
"""

from typing import Optional

import numpy as np


def top1_accuracy(logits: np.ndarray, labels: np.ndarray) -> float:
    """Fraction of rows where argmax(logits) == label."""
    return float(np.mean(np.argmax(logits, axis=-1) == labels))


class APMeter:
    """Streaming per-class average precision over (N, K) score/target
    buffers."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._scores = np.empty((0, 0), np.float64)
        self._targets = np.empty((0, 0), np.int64)
        self._weights = np.empty((0,), np.float64)
        self._n = 0
        self._has_weights = False

    def _ensure_capacity(self, n_new: int, k: int):
        cap = self._scores.shape[0]
        if self._scores.shape[1] != k:
            if self._n:
                raise ValueError("class count changed mid-stream")
            self._scores = np.empty((max(n_new, 16), k), np.float64)
            self._targets = np.empty((max(n_new, 16), k), np.int64)
            self._weights = np.empty((max(n_new, 16),), np.float64)
            cap = self._scores.shape[0]
        if self._n + n_new > cap:
            new_cap = max(int(np.ceil(cap * 1.5)) + n_new, self._n + n_new)
            for name in ("_scores", "_targets"):
                buf = getattr(self, name)
                grown = np.empty((new_cap, k), buf.dtype)
                grown[:self._n] = buf[:self._n]
                setattr(self, name, grown)
            grown = np.empty((new_cap,), np.float64)
            grown[:self._n] = self._weights[:self._n]
            self._weights = grown

    def add(self, output, target, weight: Optional[np.ndarray] = None):
        """Append a batch of (N, K) scores and binary targets, optionally
        with per-sample weights (N,)."""
        output = np.asarray(output, np.float64)
        target = np.asarray(target)
        if output.ndim == 1:
            output = output[:, None]
        if target.ndim == 1:
            target = target[:, None]
        if output.shape != target.shape:
            raise ValueError(f"shape mismatch {output.shape} {target.shape}")
        if not np.array_equal(target * target, target):
            raise ValueError("targets must be binary")
        n, k = output.shape
        if weight is not None:
            weight = np.asarray(weight, np.float64).reshape(-1)
            if weight.shape[0] != n:
                raise ValueError("weight length mismatch")
            if np.min(weight) < 0:
                raise ValueError("weights must be non-negative")
            self._has_weights = True
        self._ensure_capacity(n, k)
        self._scores[self._n:self._n + n] = output
        self._targets[self._n:self._n + n] = target
        self._weights[self._n:self._n + n] = (
            weight if weight is not None else 1.0)
        self._n += n

    def value(self) -> np.ndarray:
        """Per-class AP, shape (K,).  Returns 0 when empty (matching the
        reference's early-out)."""
        if self._n == 0:
            return np.zeros((0,))
        scores = self._scores[:self._n]
        targets = self._targets[:self._n]
        weights = self._weights[:self._n]
        k = scores.shape[1]
        ap = np.zeros((k,))
        rank = np.arange(1, self._n + 1, dtype=np.float64)
        for c in range(k):
            order = np.argsort(-scores[:, c], kind="stable")
            truth = targets[order, c].astype(np.float64)
            if self._has_weights:
                w = weights[order]
                tp = np.cumsum(truth * w)
                rg = np.cumsum(w)
            else:
                tp = np.cumsum(truth)
                rg = rank
            precision = tp / rg
            ap[c] = precision[truth > 0].sum() / max(truth.sum(), 1)
        return ap

    def mean(self) -> float:
        v = self.value()
        return float(v.mean()) if v.size else 0.0
