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

import functools

import jax
import jax.numpy as jnp
from jax import lax

DIMSPEC = ("NDHWC", "DHWIO", "NDHWC")

# Depthwise 3x3x3 implementation selector:
#   "xla"           — lax.conv_general_dilated (feature_group_count=C).
#   "dense_diag"    — the depthwise kernel embedded on the diagonal of a
#                     dense (kd,kh,kw,C,C) kernel, run as a groups=1 conv:
#                     trades C x wasted FLOPs for moving the op from the
#                     VPU (27 FMAs/element, the dw floor) onto the
#                     otherwise-idle MXU.  Gradients flow through the
#                     diagonal embedding, so dk is extracted exactly.
#   "auto"          — dense_diag where the channel count is thin enough
#                     that MXU wasted-FLOP time beats the VPU depthwise
#                     floor (C <= DENSE_DIAG_MAX_C), XLA otherwise.
#   "pallas_packed" — free-offset Pallas kernel, batch-packed lanes
#                     (ops/pallas/dw_conv3d_free.py); TPU only, stride-1
#                     SAME blocks only (others fall back to XLA).
#   "pallas_nc"     — same kernel, natural (N,T,H,W,C) layout.
DW_IMPL = "xla"

# "auto" threshold: dense_diag's MXU time scales with C (27*C*2 FLOPs per
# output element) while the VPU depthwise floor is C-independent per
# element, so the crossover sits where C * (27*2/MXU_rate) exceeds
# 27*2/VPU_rate — measured on v5e via tools/bench_kernels.py --impls
# xla,dense_diag (docs/roofline.md).
#
# MEASURED IN-STEP (v5e, fine bucket, tools/bench_kernels.py --section
# step --step-dw xla,auto): auto LOSES — 125.3 ms/step vs 119.2 for xla.
# The full step is HBM-bound (docs/roofline.md), so moving the dw FLOPs
# from the VPU to the MXU buys nothing while the 27x-fatter materialized
# kernel tensor and the lost input fusion add traffic.  Op-level wins do
# not compose into a memory-bound step; "xla" stays the default and
# "auto"/"dense_diag" remain available for experiments.
DENSE_DIAG_MAX_C = 54


def set_dw_impl(mode: str, *, dense_diag_max_c: int = None) -> None:
    """Select the depthwise-conv implementation ('xla' / 'dense_diag' /
    'auto' / 'pallas_packed' / 'pallas_nc')."""
    global DW_IMPL, DENSE_DIAG_MAX_C
    DW_IMPL = mode
    if dense_diag_max_c is not None:
        DENSE_DIAG_MAX_C = dense_diag_max_c


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
    if DW_IMPL == "dense_diag" or (
            DW_IMPL == "auto" and x.shape[-1] <= DENSE_DIAG_MAX_C):
        c = x.shape[-1]
        # (kd,kh,kw,1,C) -> (kd,kh,kw,C,C) with the per-channel taps on
        # the diagonal; autodiff through the embedding extracts the
        # diagonal of the dense dk, so gradients are exact.
        w_dense = w[:, :, :, 0, :][:, :, :, None, :] * jnp.eye(c, dtype=w.dtype)[None, None, None]
        return conv3d(
            x, w_dense,
            stride=(1, spatial_stride, spatial_stride),
            padding=padding,
            groups=1,
        )
    if DW_IMPL in ("pallas_packed", "pallas_nc") and \
            _pallas_dw_ok(x, w, spatial_stride, padding):
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


# Stem spatial-conv implementation selector ("xla" / "im2col"): XLA's TPU
# conv lowering pads C_in up to a full register tile, so the stem's dense
# 1x3x3 conv on 3 RGB channels wastes >40x of its vector work — the r3
# ablation attributed 12.2 ms of a 121 ms X3D-M train step to it
# (tools/ablate_step.py).  The s2d im2col route below (space-to-depth +
# one (16*C_in, C_out) MXU matmul with a hand-written backward) is
# mathematically identical and was shipped as the default in r3 after an
# in-step win at the (32, 8, 224) fine bucket.  Re-measured across ALL 10
# multigrid buckets in r5 (tools/probe_stem.py, full scan-loop train
# step), XLA's dense conv now wins every bucket — by 1.9-7.9 ms/step and
# 5-6 GB/step less post-fusion traffic (worst at the thin-per-chip-batch
# shapes: (64,8,158) 100.2 vs 108.1 ms, (32,8,224) 113.0 vs 118.9) — the
# im2col patch tensor's extra materialized traffic costs more than the
# lane-starved conv it replaces, and the earlier 1-2 ms fine-bucket win
# did not survive the surrounding fusion changes since r3.  "xla" is the
# default; the im2col path stays tested and selectable for experiments.
STEM_IMPL = "xla"


def set_stem_impl(mode: str) -> None:
    """Select the stem spatial-conv implementation ('im2col' / 'xla')."""
    global STEM_IMPL
    STEM_IMPL = mode


# --- space-to-depth im2col for the stride-2 3x3 stem conv -------------
#
# Naive im2col (9 stride-2 slices -> concat) forces a Mosaic relayout per
# slice: measured SLOWER than the XLA conv (31.7 ms vs 2.8 fwd at stem
# shape).  The space-to-depth form does ONE regular relayout — pad, view
# H and W as (H/2, 2)x(W/2, 2) blocks, move the 2x2 phase into channels —
# after which the 3x3 stride-2 conv is a 2x2 *stride-1* conv in block
# space: 4 contiguous slices and a (16*C_in, C_out) MXU matmul (a quarter
# of the folded taps are zero-padding).  The backward never scatters:
# dk is the transposed matmul over recomputed patches; dx folds the 4
# block taps back with shifted pads and inverts the space-to-depth.


def _stem_s2d_pack(x):
    """Pad H/W by 1 (+1 more if odd) and space-to-depth by 2:
    ``(N, T, HB, WB, 4*C)`` with channel order ``(ph, pw, ci)``."""
    n, t, h, wd, c = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1 + h % 2), (1, 1 + wd % 2),
                     (0, 0)))
    hp, wp = xp.shape[2], xp.shape[3]
    xb = xp.reshape(n, t, hp // 2, 2, wp // 2, 2, c)
    xb = xb.transpose(0, 1, 2, 4, 3, 5, 6)
    return xb.reshape(n, t, hp // 2, wp // 2, 4 * c)


def _stem_block_patches(xb, ho, wo):
    """2x2 block-space patches: ``(N, T, ho, wo, 16*C_in)``, channel
    order ``(bh, bw, ph, pw, ci)`` — all slices are stride-1."""
    cols = [xb[:, :, bh:bh + ho, bw:bw + wo, :]
            for bh in (0, 1) for bw in (0, 1)]
    return jnp.concatenate(cols, axis=-1)


def _stem_w16(w):
    """``(1, 3, 3, C_in, C_out)`` -> ``(16*C_in, C_out)`` matching the
    block-patch channel order (tap ``dh = 2*bh + ph``; dh==3 is zero)."""
    _, kh, kw, cin, cout = w.shape
    w4 = jnp.pad(w[0], ((0, 1), (0, 1), (0, 0), (0, 0)))
    w16 = w4.reshape(2, 2, 2, 2, cin, cout).transpose(0, 2, 1, 3, 4, 5)
    return w16.reshape(16 * cin, cout)


def _stem_out_hw(h, wd):
    return (h - 1) // 2 + 1, (wd - 1) // 2 + 1


@jax.custom_vjp
def _stem_im2col(x, w):
    n, t, h, wd, c = x.shape
    ho, wo = _stem_out_hw(h, wd)
    patches = _stem_block_patches(_stem_s2d_pack(x), ho, wo)
    return jnp.einsum("nthwk,kd->nthwd", patches, _stem_w16(w))


def _stem_im2col_fwd(x, w):
    return _stem_im2col(x, w), (x, w)


def _stem_im2col_bwd(res, g):
    x, w = res
    n, t, h, wd, cin = x.shape
    _, kh, kw, _, cout = w.shape
    ho, wo = _stem_out_hw(h, wd)
    xb = _stem_s2d_pack(x)
    hb, wb = xb.shape[2], xb.shape[3]
    patches = _stem_block_patches(xb, ho, wo)

    dk16 = jnp.einsum("nthwk,nthwd->kd", patches, g,
                      preferred_element_type=jnp.float32)
    dk4 = dk16.reshape(2, 2, 2, 2, cin, cout).transpose(
        0, 2, 1, 3, 4, 5).reshape(4, 4, cin, cout)
    dk = dk4[:kh, :kw][None].astype(w.dtype)

    dpatch = jnp.einsum("nthwd,kd->nthwk", g, _stem_w16(w))
    dxb = None
    for i, (bh, bw) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        chunk = dpatch[..., i * 4 * cin:(i + 1) * 4 * cin]
        term = jnp.pad(chunk, ((0, 0), (0, 0), (bh, hb - ho - bh),
                               (bw, wb - wo - bw), (0, 0)))
        dxb = term if dxb is None else dxb + term
    dxp = dxb.reshape(n, t, hb, wb, 2, 2, cin).transpose(
        0, 1, 2, 4, 3, 5, 6).reshape(n, t, 2 * hb, 2 * wb, cin)
    dx = dxp[:, :, 1:1 + h, 1:1 + wd, :]
    return dx, dk


_stem_im2col.defvjp(_stem_im2col_fwd, _stem_im2col_bwd)


def stem_spatial_conv(x, w, *, stride=2):
    """Dense ``1 x kh x kw`` conv, stride ``(1, s, s)``, padding
    ``(0, 1, 1)`` — the X3D stem's ``conv1_s`` (reference x3d.py:196-201).

    ``w``: ``(1, kh, kw, C_in, C_out)`` with small ``C_in`` (RGB).  The
    default routes through XLA's dense conv — measured fastest across all
    10 multigrid buckets in the full train step (see the ``STEM_IMPL``
    note above).  ``set_stem_impl('im2col')`` selects the space-to-depth
    im2col alternative: fold the 2x2 stride phase into channels, contract
    2x2 block-space patches with ``w`` reshaped to ``(16*C_in, C_out)`` —
    one well-shaped MXU matmul — with a hand-written backward
    (``_stem_im2col_bwd``).
    """
    if STEM_IMPL == "xla" or stride != 2 or w.shape[1:3] != (3, 3):
        return conv3d(x, w, stride=(1, stride, stride), padding=(0, 1, 1))
    return _stem_im2col(x, w)


def temporal_depthwise_conv(x, w):
    """Depthwise ``kt x 1 x 1`` temporal conv (the X3D stem's ``conv1_t``,
    reference x3d.py:202-208).  ``w``: ``(kt, 1, 1, 1, C)``."""
    kt = w.shape[0]
    c = x.shape[-1]
    return conv3d(x, w, stride=(1, 1, 1), padding=(kt // 2, 0, 0), groups=c)
