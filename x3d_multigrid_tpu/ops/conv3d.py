"""3D convolution wrappers, channels-last (NDHWC / "NTHWC" for video).

The X3D compute hot path is the depthwise-separable 3D conv: a depthwise
3x3x3 conv (VPU-bound, one multiply-add per tap per element) followed by a
pointwise 1x1x1 conv (a pure matmul on the MXU).  The reference needs a
patched PyTorch CUDA build to make the depthwise conv fast (reference:
README.md:20,31); here both legs lower through XLA with a TPU-friendly
layout, and the depthwise leg can optionally route through a Pallas kernel
(:mod:`x3d_multigrid_tpu.ops.pallas.dw_conv3d`).

Weight layouts (JAX-native):
- pointwise / dense conv: ``(kd, kh, kw, C_in, C_out)``  (DHWIO)
- depthwise:              ``(kd, kh, kw, 1, C)`` with ``feature_group_count=C``

Reference weight layout is ``(C_out, C_in/groups, kd, kh, kw)``; see
``train/checkpoint.py`` for the converter.
"""

import jax
import jax.numpy as jnp
from jax import lax

DIMSPEC = ("NDHWC", "DHWIO", "NDHWC")

# Depthwise 3x3x3 implementation selector:
#   "xla"           — lax.conv_general_dilated (feature_group_count=C).
#   "pallas_packed" — free-offset Pallas kernel, batch-packed lanes
#                     (ops/pallas/dw_conv3d_free.py); TPU only, stride-1
#                     SAME blocks only (others fall back to XLA).
#   "pallas_nc"     — same kernel, natural (N,T,H,W,C) layout.
DW_IMPL = "xla"


def set_dw_impl(mode: str) -> None:
    """Select the depthwise-conv implementation ('xla' / 'pallas_packed' /
    'pallas_nc')."""
    global DW_IMPL
    DW_IMPL = mode


def _pallas_dw_ok(x, w, spatial_stride, padding) -> bool:
    if spatial_stride != 1 or padding != (1, 1, 1):
        return False
    if w.shape[:3] != (3, 3, 3):
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    return True


def conv3d(x, w, *, stride=(1, 1, 1), padding=(0, 0, 0), groups=1,
           precision=None, preferred_dtype=None):
    """General 3D conv, channels-last.

    Args:
      x: ``(N, T, H, W, C_in)``.
      w: ``(kd, kh, kw, C_in // groups, C_out)``.
      stride: ``(st, sh, sw)``.
      padding: per-dim symmetric padding ``(pt, ph, pw)``.
      groups: feature group count (``C_in`` for depthwise).
    """
    pad = [(p, p) for p in padding]
    return lax.conv_general_dilated(
        x, w,
        window_strides=stride,
        padding=pad,
        dimension_numbers=DIMSPEC,
        feature_group_count=groups,
        precision=precision,
        preferred_element_type=preferred_dtype,
    )


def pointwise_conv3d(x, w, *, spatial_stride=1, preferred_dtype=None):
    """1x1x1 conv = batched matmul on the MXU.

    Matches the reference ``conv1x1x1`` (x3d.py:98-103): kernel 1, stride
    ``(1, s, s)``, no padding, no bias.  With stride 1 this is lowered as a
    single ``(N*T*H*W, C_in) @ (C_in, C_out)`` matmul which XLA tiles onto
    the MXU; with stride 2 the input is strided-sliced first (cheaper than a
    strided conv — the kernel is 1x1x1 so stride == subsample).
    """
    if spatial_stride != 1:
        x = x[:, :, ::spatial_stride, ::spatial_stride, :]
    cin, cout = w.shape[-2], w.shape[-1]
    out = jnp.einsum(
        "nthwc,cd->nthwd", x, w.reshape(cin, cout),
        preferred_element_type=preferred_dtype,
    )
    return out


def depthwise_conv3d(x, w, *, spatial_stride=1, padding=(1, 1, 1)):
    """Depthwise ``kd x kh x kw`` conv, stride ``(1, s, s)``.

    Matches the reference ``conv3x3x3`` (x3d.py:87-95): ``groups=C``,
    temporal stride always 1, symmetric padding.  ``w`` is
    ``(kd, kh, kw, 1, C)``.
    """
    if DW_IMPL != "xla" and _pallas_dw_ok(x, w, spatial_stride, padding):
        from x3d_multigrid_tpu.ops.pallas.dw_conv3d_free import (
            dw_conv3d_free,
        )
        layout = "packed" if DW_IMPL == "pallas_packed" else "nc"
        return dw_conv3d_free(x, w, layout)
    c = x.shape[-1]
    return conv3d(
        x, w,
        stride=(1, spatial_stride, spatial_stride),
        padding=padding,
        groups=c,
    )


def temporal_depthwise_conv(x, w):
    """Depthwise ``kt x 1 x 1`` temporal conv (the X3D stem's ``conv1_t``,
    reference x3d.py:202-208).  ``w``: ``(kt, 1, 1, 1, C)``."""
    kt = w.shape[0]
    c = x.shape[-1]
    return conv3d(x, w, stride=(1, 1, 1), padding=(kt // 2, 0, 0), groups=c)
