"""APMeter parity with the reference meter's sorted-precision-cumsum math
(apmeter.py:98-136) and Top-1 / multiview reductions."""

import numpy as np
import jax.numpy as jnp
import pytest

from x3d_multigrid_tpu.evaluate import (
    APMeter, top1_accuracy, multiview_softmax_top1, multiview_max_probs,
)


def _naive_ap(scores, targets, weights=None):
    """Independent oracle of the reference AP definition."""
    n, k = scores.shape
    ap = np.zeros(k)
    for c in range(k):
        order = np.argsort(-scores[:, c], kind="stable")
        truth = targets[order, c].astype(float)
        if weights is not None:
            w = weights[order]
            tp = np.cumsum(truth * w)
            rg = np.cumsum(w)
        else:
            tp = np.cumsum(truth)
            rg = np.arange(1, n + 1, dtype=float)
        prec = tp / rg
        ap[c] = prec[truth > 0].sum() / max(truth.sum(), 1)
    return ap


class TestAPMeter:
    def test_perfect_ranking(self):
        m = APMeter()
        m.add(np.array([[0.9], [0.8], [0.2], [0.1]]),
              np.array([[1], [1], [0], [0]]))
        np.testing.assert_allclose(m.value(), [1.0])

    def test_worst_ranking(self):
        m = APMeter()
        m.add(np.array([[0.9], [0.1]]), np.array([[0], [1]]))
        np.testing.assert_allclose(m.value(), [0.5])

    def test_streaming_equals_batch(self):
        rng = np.random.RandomState(0)
        scores = rng.rand(50, 7)
        targets = (rng.rand(50, 7) > 0.7).astype(np.int64)
        m1 = APMeter()
        m1.add(scores, targets)
        m2 = APMeter()
        for i in range(0, 50, 7):  # uneven chunks exercise regrowth
            m2.add(scores[i:i + 7], targets[i:i + 7])
        np.testing.assert_allclose(m1.value(), m2.value())
        np.testing.assert_allclose(m1.value(), _naive_ap(scores, targets))

    def test_weighted(self):
        rng = np.random.RandomState(1)
        scores = rng.rand(30, 3)
        targets = (rng.rand(30, 3) > 0.6).astype(np.int64)
        w = rng.rand(30) + 0.1
        m = APMeter()
        m.add(scores[:15], targets[:15], w[:15])
        m.add(scores[15:], targets[15:], w[15:])
        np.testing.assert_allclose(m.value(), _naive_ap(scores, targets, w))

    def test_1d_inputs_and_validation(self):
        m = APMeter()
        m.add(np.array([0.5, 0.2]), np.array([1, 0]))
        assert m.value().shape == (1,)
        with pytest.raises(ValueError):
            m.add(np.array([0.5]), np.array([2]))  # non-binary
        m2 = APMeter()
        m2.add(np.zeros((2, 3)), np.zeros((2, 3)))
        with pytest.raises(ValueError):
            m2.add(np.zeros((2, 4)), np.zeros((2, 4)))  # class count change

    def test_no_positives_class(self):
        m = APMeter()
        m.add(np.array([[0.5], [0.3]]), np.array([[0], [0]]))
        np.testing.assert_allclose(m.value(), [0.0])

    def test_reset(self):
        m = APMeter()
        m.add(np.ones((3, 2)), np.ones((3, 2)))
        m.reset()
        assert m.value().shape == (0,)
        assert m.mean() == 0.0


class TestTop1AndViews:
    def test_top1(self):
        logits = np.array([[1.0, 2.0], [3.0, 0.0]])
        assert top1_accuracy(logits, np.array([1, 0])) == 1.0
        assert top1_accuracy(logits, np.array([0, 0])) == 0.5

    def test_multiview_softmax_mean(self):
        rng = np.random.RandomState(0)
        logits = rng.randn(6, 4).astype(np.float32)  # 2 samples x 3 views
        probs, preds, mean_logits = multiview_softmax_top1(
            jnp.asarray(logits), n_views=3)
        lv = logits.reshape(2, 3, 4)
        e = np.exp(lv - lv.max(-1, keepdims=True))
        sm = (e / e.sum(-1, keepdims=True)).mean(1)
        np.testing.assert_allclose(probs, sm, rtol=1e-5)
        np.testing.assert_array_equal(preds, sm.argmax(-1))
        np.testing.assert_allclose(mean_logits, lv.mean(1), rtol=1e-5)

    def test_multiview_max(self):
        rng = np.random.RandomState(1)
        logits = rng.randn(4, 5).astype(np.float32)  # 2 samples x 2 views
        probs, ml = multiview_max_probs(jnp.asarray(logits), n_views=2)
        lv = logits.reshape(2, 2, 5)
        np.testing.assert_allclose(
            probs, (1 / (1 + np.exp(-lv))).max(1), rtol=1e-5)
        np.testing.assert_allclose(ml, lv.max(1), rtol=1e-5)
