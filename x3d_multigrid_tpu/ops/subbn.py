"""Split batch-norm ("SubBN") as a pure function over explicit state.

Semantics preserved from the reference ``SubBatchNorm3d`` (x3d.py:9-58):

- Training normalizes each *split* of the batch with its own statistics so
  the effective BN batch stays constant (``CONST_BN_SIZE`` samples) while
  multigrid rescales the real batch.  The reference realizes the grouping
  via ``x.view(n//S, c*S, t, h, w)`` through a ``BatchNorm3d(C*S)``
  (x3d.py:47-52); unfolding that view shows sample ``n`` lands in split
  ``n % S`` (strided grouping) and the running stats of split ``s`` live at
  channels ``[s*C, (s+1)*C)``.  Here the same grouping is a reshape to
  ``(N//S, S, T, H, W, C)`` with stats reduced over axes ``(0, 2, 3, 4)`` —
  a pure layout change, no module surgery.
- One shared affine ``scale/bias`` of width C across all splits
  (x3d.py:16-20,55-57).
- Eval uses aggregated stats: mean of split means; mean of split vars plus
  the variance of split means (x3d.py:27-45), stored separately so training
  stats keep accumulating.
- At a long-cycle change the reference *rebuilds* ``split_bn`` with the new
  split count, discarding split running stats (x3d.py:298-303).
  :func:`resize_subbn_splits` replicates that deliberately.

Running-stat update matches torch BatchNorm defaults: momentum 0.1,
eps 1e-5, running variance uses the *unbiased* batch variance.

On a data-parallel mesh, splits are local to each chip (the reference's
``nn.DataParallel`` computes BN per GPU with no cross-GPU sync — SURVEY
§5.8); callers inside ``shard_map`` simply pass their local shard.
"""

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

# State is a plain dict so it round-trips through checkpoints as a pytree:
#   split_mean, split_var: (S, C)  training running stats, one row per split
#   mean, var:             (C,)    aggregated stats used in eval
SubBNState = Dict[str, Any]

EPS = 1e-5
MOMENTUM = 0.1

# SubBN training implementation selector:
#   "cvjp"   — dense-lane layout + hand-written backward (custom_vjp):
#              the textbook 2-pass BN gradient (two reductions over (g, x),
#              then dx = A*g + B*x + C per (split, channel)) instead of
#              autodiff's mean/mean2 transpose graph, and the forward
#              normalize+affine folded into one FMA (y = a*x + b).
#              Measured a tie with "lanes" on v5e.
#   "lanes"  — dense-lane XLA expression, autodiff backward: collapse
#              (W, C) into the minor dim so thin X3D channels (C=24..216)
#              stop wasting 128-lane vector slots.  X3D-M stage shapes give
#              W*C == 2688 = 21*128 exactly at crop 224.  Default.
#   False    — the naive channels-minor XLA expression (C on lanes; at
#              C=24 only 24/128 lanes carry data, ~170 GB/s effective).
#   True     — fused Pallas kernel (ops/pallas/subbn_fused.py); measured
#              slower than XLA on v5e (two-phase revisiting grid), kept
#              for reference.
#   "auto"   — Pallas kernel on TPU backends, naive elsewhere.
FUSED_TRAIN = "lanes"


def set_fused_train(mode) -> None:
    """Select the SubBN training implementation: 'lanes' (default) /
    'cvjp' / True / False / 'auto' (see FUSED_TRAIN)."""
    global FUSED_TRAIN
    FUSED_TRAIN = mode


def _use_fused(x) -> bool:
    if FUSED_TRAIN is True:
        return True
    if FUSED_TRAIN == "auto":
        return jax.default_backend() in ("tpu", "axon")
    return False


def init_subbn_state(num_features: int, num_splits: int,
                     dtype=jnp.float32) -> SubBNState:
    return {
        "split_mean": jnp.zeros((num_splits, num_features), dtype),
        "split_var": jnp.ones((num_splits, num_features), dtype),
        "mean": jnp.zeros((num_features,), dtype),
        "var": jnp.ones((num_features,), dtype),
    }


def resize_subbn_splits(state: SubBNState, num_splits: int) -> SubBNState:
    """Fresh split stats for a new long-cycle split count.

    Mirrors x3d.py:298-303, where ``split_bn`` is recreated (stats reset to
    0/1) while the aggregated eval stats persist.
    """
    c = state["mean"].shape[0]
    dtype = state["mean"].dtype
    return {
        "split_mean": jnp.zeros((num_splits, c), dtype),
        "split_var": jnp.ones((num_splits, c), dtype),
        "mean": state["mean"],
        "var": state["var"],
    }


def aggregate_subbn_stats(state: SubBNState) -> SubBNState:
    """Fold split running stats into the eval stats (x3d.py:27-45).

    mean = E_s[mean_s];  var = E_s[var_s] + E_s[(mean_s - mean)^2]
    """
    sm, sv = state["split_mean"], state["split_var"]
    mean = jnp.mean(sm, axis=0)
    var = jnp.mean(sv, axis=0) + jnp.mean((sm - mean[None, :]) ** 2, axis=0)
    return {**state, "mean": mean, "var": var}


def _lanes_stats_normalize(x, s: int, eps: float):
    """Dense-lane SubBN train math: collapse ``(W, C)`` into the minor dim.

    With channels-last activations and thin X3D channels (C=24..216), the
    natural layout leaves 128-C vector lanes empty on every load, capping
    the BN passes at ~C/128 of HBM bandwidth.  Viewing ``x`` as
    ``(N/S, S, T*H, W*C)`` makes every load dense (X3D-M stage shapes at
    crop 224 give W*C = 2688 = 21*128 exactly); stats reduce to ``(S, W*C)``
    then fold the W copies on a tiny array.  Same arithmetic as the naive
    path (biased mean2-mean^2 in >=fp32, normalize in x.dtype), so results
    are bit-comparable.
    """
    n, t, h, w, c = x.shape
    acc = jnp.promote_types(x.dtype, jnp.float32)
    xr = x.reshape(n // s, s, t * h, w * c)
    xf = xr.astype(acc)
    cnt = (n // s) * t * h * w
    sum_wc = jnp.sum(xf, axis=(0, 2))                    # (S, W*C)
    sq_wc = jnp.sum(jnp.square(xf), axis=(0, 2))
    mean = sum_wc.reshape(s, w, c).sum(axis=1) / cnt     # (S, C)
    mean2 = sq_wc.reshape(s, w, c).sum(axis=1) / cnt
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)     # biased
    inv = jax.lax.rsqrt(var + eps)
    mean_t = jnp.tile(mean, (1, w)).astype(x.dtype)      # (S, W*C)
    inv_t = jnp.tile(inv, (1, w)).astype(x.dtype)
    y = (xr - mean_t[None, :, None, :]) * inv_t[None, :, None, :]
    return mean, var, y.reshape(x.shape)


def _split_stats_lanes(x, s: int):
    """Per-split batch stats in the dense-lane layout: reduce
    ``(N/S, S, T*H, W*C)`` over axes (0, 2) then fold the W copies.
    Returns ``(mean, var)`` of shape (S, C) in the accumulation dtype
    (fp32 for bf16/fp32 inputs; f64 stays f64)."""
    n, t, h, w, c = x.shape
    acc = jnp.promote_types(x.dtype, jnp.float32)
    xf = x.reshape(n // s, s, t * h, w * c).astype(acc)
    cnt = (n // s) * t * h * w
    sum_wc = jnp.sum(xf, axis=(0, 2))                    # (S, W*C)
    sq_wc = jnp.sum(jnp.square(xf), axis=(0, 2))
    mean = sum_wc.reshape(s, w, c).sum(axis=1) / cnt     # (S, C)
    mean2 = sq_wc.reshape(s, w, c).sum(axis=1) / cnt
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)     # biased
    return mean, var


def _tile_wc(v, w, dtype):
    """(S, C) -> (1, S, 1, W*C) broadcast constant for the lanes layout."""
    s = v.shape[0]
    return jnp.tile(v, (1, w)).astype(dtype)[None, :, None, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _norm_affine_cvjp(s, eps, x, mean, var, scale, bias):
    """``y = (x - mean) * rsqrt(var + eps) * scale + bias`` per (split,
    channel), with a hand-written backward implementing the full batch-norm
    gradient (mean/var treated as functions of x even though the primal
    receives them precomputed — pass them in stop_gradient'd).

    Forward folds the four elementwise ops into one FMA per element:
    ``y = x * A + B`` with per-(S, C) constants.  Backward is the textbook
    two-pass form: one fused read of (g, x) for the two reductions
    ``sum(g)`` and ``sum(g*x)``, then ``dx = A*g + B2*x + C1``.
    """
    n, t, h, w, c = x.shape
    acc = jnp.promote_types(x.dtype, jnp.float32)
    inv = jax.lax.rsqrt(var.astype(acc) + eps)           # (S, C)
    a = inv * scale.astype(acc)
    b = bias.astype(acc) - mean.astype(acc) * a
    xr = x.reshape(n // s, s, t * h, w * c)
    y = xr * _tile_wc(a, w, x.dtype) + _tile_wc(b, w, x.dtype)
    return y.reshape(x.shape)


def _norm_affine_fwd(s, eps, x, mean, var, scale, bias):
    y = _norm_affine_cvjp(s, eps, x, mean, var, scale, bias)
    return y, (x, mean, var, scale)


def _norm_affine_bwd(s, eps, res, g):
    x, mean, var, scale = res
    n, t, h, w, c = x.shape
    acc = jnp.promote_types(x.dtype, jnp.float32)
    inv = jax.lax.rsqrt(var.astype(acc) + eps)           # (S, C)
    cnt = (n // s) * t * h * w

    gr = g.reshape(n // s, s, t * h, w * c)
    xr = x.reshape(n // s, s, t * h, w * c)
    gf = gr.astype(acc)
    # pass 1: the two reductions, fused over one read of (g, x)
    gg_wc = jnp.sum(gf, axis=(0, 2))                     # (S, W*C)
    ggx_wc = jnp.sum(gf * xr.astype(acc), axis=(0, 2))
    gg = gg_wc.reshape(s, w, c).sum(axis=1)              # (S, C)
    ggx = ggx_wc.reshape(s, w, c).sum(axis=1)
    gxhat = (ggx - mean.astype(acc) * gg) * inv          # sum(g * xhat)

    dbias = jnp.sum(gg, axis=0).astype(scale.dtype)
    dscale = jnp.sum(gxhat, axis=0).astype(scale.dtype)

    # pass 2: dx = A*g + B2*x + C1
    a = inv * scale.astype(acc)                          # (S, C)
    b2 = -a * inv * gxhat / cnt
    c1 = -a * gg / cnt - b2 * mean.astype(acc)
    dx = (gr * _tile_wc(a, w, x.dtype)
          + xr * _tile_wc(b2, w, x.dtype)
          + _tile_wc(c1, w, x.dtype)).reshape(x.shape)
    return (dx, jnp.zeros_like(mean), jnp.zeros_like(var), dscale, dbias)


_norm_affine_cvjp.defvjp(_norm_affine_fwd, _norm_affine_bwd)


def sub_batch_norm(x, scale, bias, state: SubBNState, *, train: bool,
                   momentum: float = MOMENTUM, eps: float = EPS,
                   stats=None):
    """Apply SubBN to ``x`` of shape ``(N, T, H, W, C)``.

    Returns ``(y, new_state)``.  ``N`` must be divisible by the split count
    during training (guaranteed by the multigrid bucket construction, where
    per-chip batch = CONST_BN_SIZE * splits * short_multiplier).

    ``stats=(mean, var)`` (each ``(S, C)``, biased var, computed from this
    exact ``x``) skips the in-house stats pass — the conv-epilogue fusion
    path (ops/pallas/pw_conv_stats.py) supplies them from the pass that
    wrote ``x``.  They must be DIFFERENTIABLE functions of ``x`` so
    autodiff still produces the full batch-norm gradient.
    """
    c = x.shape[-1]
    if train:
        s = state["split_mean"].shape[0]
        n = x.shape[0]
        if n % s:
            raise ValueError(f"batch {n} not divisible by bn_splits {s}")
        if stats is not None:
            mean, var = stats
            if mean.shape != (s, c):
                raise ValueError(f"stats shape {mean.shape} != ({s}, {c})")
            inv = jax.lax.rsqrt(var + eps)
            xg = x.reshape(n // s, s, *x.shape[1:])
            y = (xg - mean[None, :, None, None, None, :].astype(x.dtype)) \
                * inv[None, :, None, None, None, :].astype(x.dtype)
            y = y.reshape(x.shape)
            mean = jax.lax.stop_gradient(mean)   # EMA side only
            var = jax.lax.stop_gradient(var)
        elif _use_fused(x):
            # fused Pallas kernel: stats + normalize + affine in one pass
            # pair (ops/pallas/subbn_fused.py); affine applied in-kernel
            from x3d_multigrid_tpu.ops.pallas.subbn_fused import (
                subbn_train_fused,
            )
            y, mean, var = subbn_train_fused(x, scale, bias, s)
            n_per = (n // s) * x.shape[1] * x.shape[2] * x.shape[3]
            unbias = n_per / max(n_per - 1, 1)
            new_state = {
                **state,
                "split_mean": (1 - momentum) * state["split_mean"]
                              + momentum * mean,
                "split_var": (1 - momentum) * state["split_var"]
                             + momentum * (var * unbias),
            }
            return y, new_state
        elif FUSED_TRAIN == "cvjp":
            mean, var = _split_stats_lanes(x, s)
            mean = jax.lax.stop_gradient(mean)
            var = jax.lax.stop_gradient(var)
            # custom backward implements the full BN gradient; affine is
            # folded in, so return early (no trailing scale/bias apply)
            y = _norm_affine_cvjp(s, eps, x, mean, var, scale, bias)
            n_per = (n // s) * x.shape[1] * x.shape[2] * x.shape[3]
            unbias = n_per / max(n_per - 1, 1)
            new_state = {
                **state,
                "split_mean": (1 - momentum) * state["split_mean"]
                              + momentum * mean.astype(
                                  state["split_mean"].dtype),
                "split_var": (1 - momentum) * state["split_var"]
                             + momentum * (var * unbias).astype(
                                 state["split_var"].dtype),
            }
            return y, new_state
        elif FUSED_TRAIN == "lanes":
            mean, var, y = _lanes_stats_normalize(x, s, eps)
        else:
            xg = x.reshape(n // s, s, *x.shape[1:])  # sample i*S+s -> split s
            # Stats in at least fp32 (fp32 for bf16 activations; f64 stays
            # f64 so the float64 reference-parity test is exact).
            xf = xg.astype(jnp.promote_types(x.dtype, jnp.float32))
            mean = jnp.mean(xf, axis=(0, 2, 3, 4))              # (S, C)
            mean2 = jnp.mean(jnp.square(xf), axis=(0, 2, 3, 4))
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)     # biased
            inv = jax.lax.rsqrt(var + eps)
            y = (xg - mean[None, :, None, None, None, :].astype(x.dtype)) * \
                inv[None, :, None, None, None, :].astype(x.dtype)
            y = y.reshape(x.shape)

        n_per = (n // s) * x.shape[1] * x.shape[2] * x.shape[3]
        unbias = n_per / max(n_per - 1, 1)
        new_state = {
            **state,
            "split_mean": (1 - momentum) * state["split_mean"] + momentum * mean,
            "split_var": (1 - momentum) * state["split_var"]
                         + momentum * (var * unbias),
        }
    else:
        inv = jax.lax.rsqrt(state["var"] + eps)
        y = (x - state["mean"].astype(x.dtype)) * inv.astype(x.dtype)
        new_state = state

    y = y * scale.astype(x.dtype) + bias.astype(x.dtype)
    return y, new_state
