"""Multi-view (multi-temporal-crop) evaluation reductions.

The reference folds N temporal views into the batch for the forward pass and
reduces afterwards:
- Kinetics: softmax over classes, mean over views, argmax
  (train_x3d_kinetics_multigrid.py:253-257).
- Charades classification: sigmoid, max over views
  (train_x3d_charades.py:169-174).
"""

import jax
import jax.numpy as jnp


def multiview_softmax_top1(logits, n_views: int):
    """``logits``: (B*n_views, K) view-flattened.  Returns
    ``(mean_softmax_probs (B, K), preds (B,), mean_logits (B, K))``."""
    b = logits.shape[0] // n_views
    lv = logits.reshape(b, n_views, -1)
    probs = jax.nn.softmax(lv.astype(jnp.float32), axis=-1).mean(axis=1)
    mean_logits = lv.mean(axis=1)
    return probs, jnp.argmax(probs, axis=-1), mean_logits


def multiview_max_probs(logits, n_views: int):
    """Charades-style view reduction: sigmoid probs and logits both reduced
    by max over views.  Returns ``(probs (B, K), logits (B, K))``."""
    b = logits.shape[0] // n_views
    lv = logits.reshape(b, n_views, -1).astype(jnp.float32)
    probs = jax.nn.sigmoid(lv).max(axis=1)
    return probs, lv.max(axis=1)
