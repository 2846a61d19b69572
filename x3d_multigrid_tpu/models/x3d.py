"""X3D model family as functional JAX pytrees (channels-last, TPU-native).

Architecture parity with the reference ``x3d.py`` (ResNet trunk,
x3d.py:174-345): stem = spatial 1x3x3 s(1,2,2) conv + depthwise temporal
5x1x1 conv; four stages of inverted-bottleneck blocks (1x1x1 expand -> SubBN
-> ReLU -> depthwise 3x3x3 -> SubBN -> [SE on even-index blocks] -> swish ->
1x1x1 project -> SubBN -> +residual -> ReLU, x3d.py:106-171); conv5 1x1x1
expand; head = avg-pool -> fc1(2048) -> ReLU -> dropout -> fc2.

Differences by design (TPU-first, not a port):
- Activations are ``(N, T, H, W, C)``; C rides the 128-lane dimension so the
  pointwise convs (where the FLOPs are) become MXU matmuls without layout
  shuffles.
- Parameters and BN state are separate pytrees; nothing is stateful.  The
  multigrid long-cycle "rebuild split_bn" (x3d.py:298-303) is a pure state
  transformation (:func:`resize_bn_splits`).
- Class head returns ``(N, n_classes)``; loc head returns ``(N, T,
  n_classes)`` (the reference returns (B, C, 1) / (B, C, T)).

Version tables match x3d.py:352-363.
"""

import dataclasses
import functools
import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from x3d_multigrid_tpu.ops.conv3d import (
    pointwise_conv3d,
    depthwise_conv3d,
    temporal_depthwise_conv,
    stem_spatial_conv,
    conv3d,
)
from x3d_multigrid_tpu.ops.subbn import (
    init_subbn_state,
    sub_batch_norm,
    aggregate_subbn_stats,
    resize_subbn_splits,
)
from x3d_multigrid_tpu.ops.swish import swish

Params = Dict[str, Any]
BNState = Dict[str, Any]

# Per-version (expanded, bottleneck) channels per stage and block counts
# (reference x3d.py:352-363).
_INPLANES = {
    "S": [(54, 24), (108, 48), (216, 96), (432, 192)],
    "M": [(54, 24), (108, 48), (216, 96), (432, 192)],
    "XL": [(72, 32), (162, 72), (306, 136), (630, 280)],
}
_BLOCKS = {"S": [3, 5, 11, 7], "M": [3, 5, 11, 7], "XL": [5, 10, 25, 15]}

# Per-version input geometry (reference train_x3d_kinetics_multigrid.py:111-113).
CROP_SIZE = {"S": 160, "M": 224, "XL": 312}
RESIZE_SIZE = {"S": [180.0, 225.0], "M": [256.0, 256.0], "XL": [360.0, 450.0]}
GAMMA_TAU = {"S": 6, "M": 10, "XL": 5}  # M: 10 short-schedule, 5 long


@dataclasses.dataclass(frozen=True)
class X3DConfig:
    version: str = "M"
    n_classes: int = 400
    n_input_channels: int = 3
    dropout: float = 0.5
    widen_factor: float = 1.0
    task: str = "class"  # 'class' | 'loc'
    fc1_dim: int = 2048
    # Rematerialize bottleneck blocks in backward (jax.checkpoint):
    #   True/"full" — save nothing per block: O(stage) live activations
    #     for the coarse 2048-clip buckets (more recompute traffic).
    #   "convs" — selective: save only the three conv outputs
    #     (checkpoint_name'd below) and recompute the BN/ReLU/SE/swish
    #     elementwise chains in backward — a residual-TRAFFIC reduction
    #     lever (docs/roofline.md: the step is bandwidth-bound on
    #     materialized intermediates).
    remat: object = False
    # Overrides for custom model sizes (None -> version tables).
    blocks_override: Optional[Tuple[int, ...]] = None
    inplanes_override: Optional[Tuple[Tuple[int, int], ...]] = None

    @property
    def block_inplanes(self) -> List[Tuple[int, int]]:
        planes = (self.inplanes_override if self.inplanes_override is not None
                  else _INPLANES[self.version])
        w = self.widen_factor
        return [(int(x * w), int(y * w)) for x, y in planes]

    @property
    def stage_blocks(self) -> List[int]:
        if self.blocks_override is not None:
            return list(self.blocks_override)
        return _BLOCKS[self.version]


def x3d_config(version: str = "M", **kw) -> X3DConfig:
    return X3DConfig(version=version, **kw)


def _se_width(width: int, multiplier: float = 0.0625, min_width: int = 8,
              divisor: int = 8) -> int:
    """SE reduction width (reference round_width, x3d.py:129-140)."""
    if not multiplier:
        return width
    width *= multiplier
    min_width = min_width or divisor
    width_out = max(min_width, int(width + divisor / 2) // divisor * divisor)
    if width_out < 0.9 * width:
        width_out += divisor
    return int(width_out)


# ---------------------------------------------------------------------------
# Initialization (torch-compatible distributions so from-scratch training
# matches the reference recipe).
# ---------------------------------------------------------------------------

def _kaiming_normal_conv(key, shape, dtype=jnp.float32):
    """Kaiming-normal fan_out/relu for conv weights (x3d.py:246-250).

    ``shape`` is DHWIO ``(kd, kh, kw, cin_per_group, cout)``; torch computes
    fan_out = cout * kd*kh*kw from its (O, I/g, kd, kh, kw) layout.
    """
    kd, kh, kw, _, cout = shape
    fan_out = cout * kd * kh * kw
    std = math.sqrt(2.0 / fan_out)
    return jax.random.normal(key, shape, dtype) * std


def _torch_linear_init(key, in_dim, out_dim, dtype=jnp.float32):
    """torch nn.Linear default init (kaiming-uniform a=sqrt(5) => U(+-1/sqrt(fan_in)))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    w = jax.random.uniform(kw, (in_dim, out_dim), dtype, -bound, bound)
    b = jax.random.uniform(kb, (out_dim,), dtype, -bound, bound)
    return {"w": w, "b": b}


def _bn_params(c, dtype=jnp.float32):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def init_params(key, cfg: X3DConfig, dtype=jnp.float32) -> Params:
    """Build the parameter pytree.  Key layout mirrors the reference state
    dict (conv1_s, conv1_t, bn1, layer{1..4}.{i}.{conv1,bn1,...}, conv5,
    bn5, fc1, fc2) for easy checkpoint conversion (SURVEY §5.4)."""
    keys = iter(jax.random.split(key, 4096))
    planes = cfg.block_inplanes
    c0 = planes[0][1]

    params: Params = {
        "conv1_s": {"w": _kaiming_normal_conv(
            next(keys), (1, 3, 3, cfg.n_input_channels, c0), dtype)},
        "conv1_t": {"w": _kaiming_normal_conv(
            next(keys), (5, 1, 1, 1, c0), dtype)},
        "bn1": _bn_params(c0, dtype),
    }

    in_c = c0
    block_index = 0  # resets per stage (reference x3d.py:290)
    for stage, (exp_c, out_c) in enumerate(planes):
        blocks = []
        for i in range(cfg.stage_blocks[stage]):
            stride = 2 if i == 0 else 1
            blk: Params = {
                "conv1": {"w": _kaiming_normal_conv(
                    next(keys), (1, 1, 1, in_c, exp_c), dtype)},
                "bn1": _bn_params(exp_c, dtype),
                "conv2": {"w": _kaiming_normal_conv(
                    next(keys), (3, 3, 3, 1, exp_c), dtype)},
                "bn2": _bn_params(exp_c, dtype),
                "conv3": {"w": _kaiming_normal_conv(
                    next(keys), (1, 1, 1, exp_c, out_c), dtype)},
                "bn3": _bn_params(out_c, dtype),
            }
            if i % 2 == 0:  # SE on even-index blocks of each stage
                se_c = _se_width(exp_c)
                kf1, kf2 = next(keys), next(keys)
                blk["se"] = {
                    "fc1": {"w": _kaiming_normal_conv(
                        kf1, (1, 1, 1, exp_c, se_c), dtype),
                        "b": jnp.zeros((se_c,), dtype)},
                    "fc2": {"w": _kaiming_normal_conv(
                        kf2, (1, 1, 1, se_c, exp_c), dtype),
                        "b": jnp.zeros((exp_c,), dtype)},
                }
            if stride != 1 or in_c != out_c:  # shortcut type 'B'
                blk["downsample"] = {
                    "conv": {"w": _kaiming_normal_conv(
                        next(keys), (1, 1, 1, in_c, out_c), dtype)},
                    "bn": _bn_params(out_c, dtype),
                }
            blocks.append(blk)
            in_c = out_c
            block_index += 1
        params[f"layer{stage + 1}"] = blocks
        block_index = 0

    conv5_out = planes[3][0]
    params["conv5"] = {"w": _kaiming_normal_conv(
        next(keys), (1, 1, 1, in_c, conv5_out), dtype)}
    params["bn5"] = _bn_params(conv5_out, dtype)
    params["fc1"] = {"w": _kaiming_normal_conv(
        next(keys), (1, 1, 1, conv5_out, cfg.fc1_dim), dtype)}
    params["fc2"] = _torch_linear_init(next(keys), cfg.fc1_dim,
                                       cfg.n_classes, dtype)
    return params


def init_bn_state(cfg: X3DConfig, num_splits: int,
                  dtype=jnp.float32) -> BNState:
    """BN running-stat pytree matching the param tree structure."""
    planes = cfg.block_inplanes
    c0 = planes[0][1]
    state: BNState = {"bn1": init_subbn_state(c0, num_splits, dtype)}
    in_c = c0
    for stage, (exp_c, out_c) in enumerate(planes):
        blocks = []
        for i in range(cfg.stage_blocks[stage]):
            stride = 2 if i == 0 else 1
            blk = {
                "bn1": init_subbn_state(exp_c, num_splits, dtype),
                "bn2": init_subbn_state(exp_c, num_splits, dtype),
                "bn3": init_subbn_state(out_c, num_splits, dtype),
            }
            if stride != 1 or in_c != out_c:
                blk["downsample_bn"] = init_subbn_state(out_c, num_splits,
                                                        dtype)
            blocks.append(blk)
            in_c = out_c
        state[f"layer{stage + 1}"] = blocks
    state["bn5"] = init_subbn_state(planes[3][0], num_splits, dtype)
    return state


# ---------------------------------------------------------------------------
# State transformations (multigrid long-cycle support, eval aggregation)
# ---------------------------------------------------------------------------

def _is_subbn(d) -> bool:
    return isinstance(d, dict) and "split_mean" in d


def _map_subbn(state, fn):
    if _is_subbn(state):
        return fn(state)
    if isinstance(state, dict):
        return {k: _map_subbn(v, fn) for k, v in state.items()}
    if isinstance(state, list):
        return [_map_subbn(v, fn) for v in state]
    return state


def resize_bn_splits(state: BNState, num_splits: int) -> BNState:
    """Long-cycle split-count change: fresh split stats everywhere
    (reference update_bn_splits_long_cycle, x3d.py:298-303)."""
    return _map_subbn(state, lambda s: resize_subbn_splits(s, num_splits))


def aggregate_all_subbn(state: BNState) -> BNState:
    """Fold split stats into eval stats for every SubBN
    (reference aggregate_sub_bn_stats, x3d.py:306-313)."""
    return _map_subbn(state, aggregate_subbn_stats)


def replace_logits(params: Params, key, n_classes: int) -> Params:
    """Swap the classifier head (reference replace_logits, x3d.py:294)."""
    in_dim = params["fc2"]["w"].shape[0]
    dtype = params["fc2"]["w"].dtype
    return {**params, "fc2": _torch_linear_init(key, in_dim, n_classes, dtype)}


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _ckpt_name(x, name):
    # no-op outside jax.checkpoint; under remat="convs" marks the conv
    # outputs as the only saved residuals (everything elementwise between
    # them is recomputed in backward)
    from jax.ad_checkpoint import checkpoint_name
    return checkpoint_name(x, name)


# Pointwise-conv + SubBN-stats epilogue fusion (ops/pallas/pw_conv_stats):
# the conv pass that writes each pointwise output also emits the per-split
# (sum, sumsq), so the following SubBN skips its stats re-read.  Off by
# default — flip with set_pw_stats_epilogue(True) to measure (the roofline
# experiment for the conv+BN hot pair, reference x3d.py:150-151).
PW_STATS_EPILOGUE = False


def set_pw_stats_epilogue(on: bool) -> None:
    global PW_STATS_EPILOGUE
    PW_STATS_EPILOGUE = bool(on)


def _pw_conv_bn(x, w, bn_p, bn_state, *, train, momentum, ckpt=None):
    """Pointwise conv -> SubBN, optionally with the fused stats epilogue.

    ``ckpt=None`` skips the checkpoint_name wrapper (conv5 sits outside
    the per-block remat, and an extra name primitive would change the
    compiled HLO — invalidating the committed compilation cache — for
    zero effect)."""
    if train and PW_STATS_EPILOGUE:
        from x3d_multigrid_tpu.ops.pallas.pw_conv_stats import (
            pw_conv_subbn_stats, stats_from_sums,
        )
        s = bn_state["split_mean"].shape[0]
        y, ps, pq = pw_conv_subbn_stats(x, w, s, x.dtype)
        if ckpt:
            y = _ckpt_name(y, ckpt)
        cnt = (y.shape[0] // s) * y.shape[1] * y.shape[2] * y.shape[3]
        return sub_batch_norm(y, bn_p["scale"], bn_p["bias"], bn_state,
                              train=True, momentum=momentum,
                              stats=stats_from_sums(ps, pq, cnt))
    y = pointwise_conv3d(x, w)
    if ckpt:
        y = _ckpt_name(y, ckpt)
    return sub_batch_norm(y, bn_p["scale"], bn_p["bias"], bn_state,
                          train=train, momentum=momentum)


def _bottleneck(blk_p, blk_s, x, *, has_se, train, momentum):
    """One inverted-bottleneck block (reference Bottleneck.forward,
    x3d.py:143-171)."""
    residual = x

    out, s1 = _pw_conv_bn(x, blk_p["conv1"]["w"], blk_p["bn1"],
                          blk_s["bn1"], train=train, momentum=momentum,
                          ckpt="pw1")
    out = jax.nn.relu(out)

    stride = 2 if "downsample" in blk_p else 1
    # Downsampling blocks may also just widen channels with stride 1:
    # stride is 2 exactly for the first block of each stage, which is also
    # the only block with a downsample branch in X3D (in_c != out_c happens
    # only there).
    out = _ckpt_name(
        depthwise_conv3d(out, blk_p["conv2"]["w"], spatial_stride=stride),
        "dw")
    out, s2 = sub_batch_norm(out, blk_p["bn2"]["scale"], blk_p["bn2"]["bias"],
                             blk_s["bn2"], train=train, momentum=momentum)

    if has_se:
        se = blk_p["se"]
        w = jnp.mean(out, axis=(1, 2, 3), keepdims=True)  # (N,1,1,1,C)
        w = pointwise_conv3d(w, se["fc1"]["w"]) + se["fc1"]["b"]
        w = jax.nn.relu(w)
        w = pointwise_conv3d(w, se["fc2"]["w"]) + se["fc2"]["b"]
        out = out * jax.nn.sigmoid(w)

    out = swish(out)

    out, s3 = _pw_conv_bn(out, blk_p["conv3"]["w"], blk_p["bn3"],
                          blk_s["bn3"], train=train, momentum=momentum,
                          ckpt="pw3")

    new_s = {"bn1": s1, "bn2": s2, "bn3": s3}
    if "downsample" in blk_p:
        residual = _ckpt_name(
            pointwise_conv3d(x, blk_p["downsample"]["conv"]["w"],
                             spatial_stride=stride), "ds")
        residual, sd = sub_batch_norm(
            residual, blk_p["downsample"]["bn"]["scale"],
            blk_p["downsample"]["bn"]["bias"], blk_s["downsample_bn"],
            train=train, momentum=momentum)
        new_s["downsample_bn"] = sd

    out = jax.nn.relu(out + residual)
    return out, new_s


def forward(params: Params, state: BNState, x, *, cfg: X3DConfig,
            train: bool = False, rng: Optional[jax.Array] = None,
            momentum: float = 0.1):
    """X3D forward pass.

    Args:
      x: ``(N, T, H, W, C_in)`` video clips.
      train: training mode (SubBN batch stats + dropout).
      rng: dropout PRNG key (required when ``train`` and dropout > 0).

    Returns:
      ``(logits, new_state)`` — logits ``(N, n_classes)`` for
      ``task='class'`` or ``(N, T, n_classes)`` for ``task='loc'``.
    """
    new_state: BNState = {}

    out = stem_spatial_conv(x, params["conv1_s"]["w"])
    out = temporal_depthwise_conv(out, params["conv1_t"]["w"])
    out, new_state["bn1"] = sub_batch_norm(
        out, params["bn1"]["scale"], params["bn1"]["bias"], state["bn1"],
        train=train, momentum=momentum)
    out = jax.nn.relu(out)

    for stage in range(4):
        name = f"layer{stage + 1}"
        stage_states = []
        for i, blk_p in enumerate(params[name]):
            block = functools.partial(
                _bottleneck, has_se=(i % 2 == 0), train=train,
                momentum=momentum)
            if cfg.remat == "convs":
                block = jax.checkpoint(
                    block, policy=jax.checkpoint_policies.
                    save_only_these_names("pw1", "dw", "pw3", "ds"))
            elif cfg.remat:
                block = jax.checkpoint(block)
            out, blk_s = block(blk_p, state[name][i], out)
            stage_states.append(blk_s)
        new_state[name] = stage_states

    out, new_state["bn5"] = _pw_conv_bn(
        out, params["conv5"]["w"], params["bn5"], state["bn5"],
        train=train, momentum=momentum)
    out = jax.nn.relu(out)

    if cfg.task == "class":
        out = jnp.mean(out, axis=(1, 2, 3), keepdims=True)  # (N,1,1,1,C)
        out = pointwise_conv3d(out, params["fc1"]["w"])
        out = jax.nn.relu(out)
        out = out.reshape(out.shape[0], -1)  # (N, 2048)
        if train and cfg.dropout > 0:
            keep = 1.0 - cfg.dropout
            mask = jax.random.bernoulli(rng, keep, out.shape)
            out = jnp.where(mask, out / keep, 0.0).astype(out.dtype)
        logits = out @ params["fc2"]["w"] + params["fc2"]["b"]
    elif cfg.task == "loc":
        out = jnp.mean(out, axis=(2, 3), keepdims=True)  # (N,T,1,1,C)
        out = pointwise_conv3d(out, params["fc1"]["w"])
        out = jax.nn.relu(out)
        out = out.reshape(out.shape[0], out.shape[1], -1)  # (N, T, 2048)
        if train and cfg.dropout > 0:
            keep = 1.0 - cfg.dropout
            mask = jax.random.bernoulli(rng, keep, out.shape)
            out = jnp.where(mask, out / keep, 0.0).astype(out.dtype)
        logits = jnp.einsum("ntc,cd->ntd", out, params["fc2"]["w"]) \
            + params["fc2"]["b"]
    else:
        raise ValueError(f"unknown task {cfg.task!r}")

    return logits, new_state
