"""Temporal linear interpolation (torch F.interpolate(mode='linear')
equivalent, align_corners=False) for the localization head
(train_x3d_charades_loc.py:169)."""

import jax.numpy as jnp


def linear_interp_time(x, out_len: int):
    """Resample axis 1 of ``x`` (B, T, C) to ``out_len`` samples.

    Matches torch's half-pixel-center sampling: output sample i reads input
    coordinate ``(i + 0.5) * T/out_len - 0.5`` with edge clamping.
    """
    t = x.shape[1]
    if out_len == t:
        return x
    pos = (jnp.arange(out_len) + 0.5) * (t / out_len) - 0.5
    pos = jnp.clip(pos, 0.0, t - 1.0)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t - 1)
    w = (pos - lo).astype(x.dtype)[None, :, None]
    return x[:, lo, :] * (1.0 - w) + x[:, hi, :] * w
