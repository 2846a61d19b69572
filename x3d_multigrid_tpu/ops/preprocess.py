"""Fused on-device clip preprocessing.

The reference does scale/crop/flip/ToTensor/normalize per frame in Python
workers with PIL — ``ToTensor``'s HWC->CHW transpose alone is "80% of the
loading time/CPU" (spatial_transforms.py:80-81) and JPEG decode needs a
native ``accimage`` build (README.md:22,33).  Here the host stops at
decoded uint8 crops; everything bandwidth-bound — dtype conversion, bilinear
resize, horizontal flip, mean/std normalization — runs fused in one ``jit``
on device, batched over the whole clip batch.

Host/device split (see data/loader.py):
- train: host supplies ``(B, T, C0, C0, 3)`` uint8 where C0 = the model's
  base crop size (224 for M) — the random multi-scale crop has already been
  taken at decode time; device resizes to the short-cycle output size,
  flips, normalizes.
- eval: host supplies ``(B, T, R, R, 3)`` uint8 center square crops at the
  canonical decode size R (256 for M); device resizes to the eval crop.

Resize uses ``jax.image.resize(method='linear', antialias=True)``, matching
PIL BILINEAR's triangle filter with downscale antialiasing (the reference's
interpolation, spatial_transforms.py:495).
"""

import jax
import jax.numpy as jnp


def _resize_frames(x, out_size: int):
    """Bilinear spatial resize of (B, T, H, W, 3) float to out_size^2."""
    b, t, h, w, c = x.shape
    if h == out_size and w == out_size:
        return x
    return jax.image.resize(
        x, (b, t, out_size, out_size, c), method="linear",
        antialias=True)


def train_preprocess_impl(frames_u8, flip, mean, std, *, out_size: int,
                          dtype=None):
    """uint8 crops -> normalized float clips (traceable, no jit wrapper —
    composed into the sharded train step so it runs on every chip's local
    shard).

    Bandwidth-ordered: the flip select runs on the uint8 bytes (3 narrow
    passes instead of 3 float32 ones), and /255 + mean/std collapse into
    one affine ``x*scale - shift`` applied at the cast.  Both reorderings
    are exact: the horizontal flip commutes with the symmetric bilinear
    resize, and the affine commutes with any convex resample (weights sum
    to 1).  Measured: 6.5 -> ~1 ms of the fine-bucket train step.

    Args:
      frames_u8: ``(B, T, S, S, 3)`` uint8.
      flip: ``(B,)`` bool — per-clip horizontal flip (clip-consistent, the
        ``randomize_parameters`` contract of spatial_transforms.py:30-32).
      mean/std: ``(3,)`` float (0-1 range, e.g. KINETICS_MEAN/STD).
      out_size: short-cycle output size.
      dtype: output/compute dtype (default float32); pass the step's
        compute dtype (bf16) to halve the pass bandwidth — uint8 values
        are exact in bf16, so only the affine constants round.
    """
    dtype = dtype or jnp.float32
    x = jnp.where(flip[:, None, None, None, None],
                  frames_u8[:, :, :, ::-1, :], frames_u8)
    scale = jnp.asarray(1.0 / (255.0 * std), dtype)
    shift = jnp.asarray(mean / std, dtype)
    x = x.astype(dtype) * scale - shift
    return _resize_frames(x, out_size)


def eval_preprocess_impl(frames_u8, mean, std, *, out_size: int,
                         dtype=None):
    """Center-cropped uint8 squares -> normalized float clips
    (CenterCropScaled + ToTensor + Normalize, spatial_transforms.py:199-231)."""
    dtype = dtype or jnp.float32
    scale = jnp.asarray(1.0 / (255.0 * std), dtype)
    shift = jnp.asarray(mean / std, dtype)
    x = frames_u8.astype(dtype) * scale - shift
    return _resize_frames(x, out_size)


train_preprocess = jax.jit(train_preprocess_impl,
                           static_argnames=("out_size", "dtype"))
eval_preprocess = jax.jit(eval_preprocess_impl,
                          static_argnames=("out_size", "dtype"))
