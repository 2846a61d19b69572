"""Inference-time BN folding: absorb each SubBN's aggregated statistics and
affine into the preceding conv's weights + a bias.

Every conv in the X3D trunk feeds a SubBN (stem, the three bottleneck
convs, the downsample conv, conv5 — x3d.py's structure), so folding
removes all eval-mode normalization passes:

    bn(conv(x)) = conv(x) * a + b,   a = scale / sqrt(var + eps)
                                     b = bias - mean * a
    => conv'(x) with W' = W * a[out], bias' = b.

The folded tree is served by ``forward_folded`` — the same architecture
with BN skipped and per-conv biases added.  Numerical parity with the
eval-mode ``forward`` is exact up to fp rounding (tested).
"""

from typing import Any, Dict

import jax
import jax.numpy as jnp

from x3d_multigrid_tpu.models.x3d import X3DConfig
from x3d_multigrid_tpu.ops.conv3d import (
    conv3d, pointwise_conv3d, depthwise_conv3d, temporal_depthwise_conv,
    stem_spatial_conv,
)
from x3d_multigrid_tpu.ops.swish import swish
from x3d_multigrid_tpu.ops.subbn import EPS


def _fold(conv_w, bn_p, bn_s, eps=EPS):
    a = bn_p["scale"] / jnp.sqrt(bn_s["var"] + eps)
    b = bn_p["bias"] - bn_s["mean"] * a
    return {"w": conv_w * a, "b": b}  # a broadcasts over the last (O) axis


def fold_bn(params: Dict[str, Any], bn_state: Dict[str, Any],
            eps: float = EPS) -> Dict[str, Any]:
    """Produce the folded inference parameter tree.

    ``bn_state`` must hold aggregated eval stats (run
    ``aggregate_all_subbn`` first if coming from training)."""
    out: Dict[str, Any] = {
        "conv1_s": {"w": params["conv1_s"]["w"]},  # bn follows conv1_t
        "conv1_t": _fold(params["conv1_t"]["w"], params["bn1"],
                         bn_state["bn1"], eps),
        "conv5": _fold(params["conv5"]["w"], params["bn5"],
                       bn_state["bn5"], eps),
        "fc1": {"w": params["fc1"]["w"]},
        "fc2": dict(params["fc2"]),
    }
    for stage in range(1, 5):
        blocks = []
        for bp, bs in zip(params[f"layer{stage}"],
                          bn_state[f"layer{stage}"]):
            blk = {
                "conv1": _fold(bp["conv1"]["w"], bp["bn1"], bs["bn1"], eps),
                "conv2": _fold(bp["conv2"]["w"], bp["bn2"], bs["bn2"], eps),
                "conv3": _fold(bp["conv3"]["w"], bp["bn3"], bs["bn3"], eps),
            }
            if "se" in bp:
                blk["se"] = jax.tree.map(lambda x: x, bp["se"])
            if "downsample" in bp:
                blk["downsample"] = _fold(
                    bp["downsample"]["conv"]["w"], bp["downsample"]["bn"],
                    bs["downsample_bn"], eps)
            blocks.append(blk)
        out[f"layer{stage}"] = blocks
    return out


def _se(blk, x):
    se = blk["se"]
    w = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    w = pointwise_conv3d(w, se["fc1"]["w"]) + se["fc1"]["b"]
    w = jax.nn.relu(w)
    w = pointwise_conv3d(w, se["fc2"]["w"]) + se["fc2"]["b"]
    return x * jax.nn.sigmoid(w)


def forward_folded(folded: Dict[str, Any], x, *, cfg: X3DConfig):
    """Eval-only forward on BN-folded params (no state, no normalization
    passes).  Same I/O contract as models.x3d.forward in eval mode."""
    out = stem_spatial_conv(x, folded["conv1_s"]["w"])
    ct = folded["conv1_t"]
    out = temporal_depthwise_conv(out, ct["w"]) + ct["b"]
    out = jax.nn.relu(out)

    for stage in range(1, 5):
        for i, blk in enumerate(folded[f"layer{stage}"]):
            residual = out
            h = pointwise_conv3d(out, blk["conv1"]["w"]) + blk["conv1"]["b"]
            h = jax.nn.relu(h)
            stride = 2 if "downsample" in blk else 1
            h = depthwise_conv3d(h, blk["conv2"]["w"],
                                 spatial_stride=stride) + blk["conv2"]["b"]
            if i % 2 == 0:
                h = _se(blk, h)
            h = swish(h)
            h = pointwise_conv3d(h, blk["conv3"]["w"]) + blk["conv3"]["b"]
            if "downsample" in blk:
                residual = pointwise_conv3d(
                    out, blk["downsample"]["w"], spatial_stride=stride) \
                    + blk["downsample"]["b"]
            out = jax.nn.relu(h + residual)

    out = pointwise_conv3d(out, folded["conv5"]["w"]) + folded["conv5"]["b"]
    out = jax.nn.relu(out)

    if cfg.task == "class":
        out = jnp.mean(out, axis=(1, 2, 3), keepdims=True)
        out = jax.nn.relu(pointwise_conv3d(out, folded["fc1"]["w"]))
        out = out.reshape(out.shape[0], -1)
        return out @ folded["fc2"]["w"] + folded["fc2"]["b"]
    out = jnp.mean(out, axis=(2, 3), keepdims=True)
    out = jax.nn.relu(pointwise_conv3d(out, folded["fc1"]["w"]))
    out = out.reshape(out.shape[0], out.shape[1], -1)
    return jnp.einsum("ntc,cd->ntd", out, folded["fc2"]["w"]) \
        + folded["fc2"]["b"]
