"""Spatial / sequence parallelism for inference: GSPMD over a 2-D mesh.

Pure data parallelism cannot accelerate a single large input — exactly the
shape of Charades whole-video localization (batch 1, hundreds of frames at
224x224: the reference evaluates those one video per GPU,
train_x3d_charades_loc.py:146-171).  Here the clip's H (or T) axis is
sharded over a ``spatial`` mesh axis with plain ``jax.jit`` +
``NamedSharding`` and XLA's SPMD partitioner inserts the convolution halo
exchanges and pooling reductions automatically — the TPU-native equivalent
of hand-written halo-exchange kernels.  Inference normalizes with
aggregated running BN stats (elementwise), so the partitioned program
computes exactly what the unsharded one does; no BN-semantics caveats.

This composes with data parallelism: a ``(data, spatial)`` mesh shards the
batch over ``data`` and each clip's H/T extent over ``spatial``.  Training
is deliberately NOT offered on the spatial axis — train-mode SubBatchNorm
reduces batch statistics per chip by design (per-GPU BN parity, SURVEY
§2.3), and a spatially-split batch would silently change those statistics;
use :mod:`x3d_multigrid_tpu.parallel.train_step` for training.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from x3d_multigrid_tpu.models.x3d import X3DConfig, forward
from x3d_multigrid_tpu.parallel.mesh import DATA_AXIS

SPATIAL_AXIS = "spatial"

# clip layout is (B, T, H, W, C) channels-last throughout the framework
_CLIP_SPECS = {
    "H": P(DATA_AXIS, None, SPATIAL_AXIS, None, None),
    "T": P(DATA_AXIS, SPATIAL_AXIS, None, None, None),
}


def data_spatial_mesh(dp: int, sp: int, devices=None) -> Mesh:
    """2-D ``(data, spatial)`` mesh over ``dp * sp`` devices.

    ``spatial`` is the minor (fastest-varying) axis so halo exchanges ride
    neighbouring ICI links.
    """
    if devices is None:
        devices = jax.devices()
    if dp * sp > len(devices):
        raise ValueError(
            f"mesh {dp}x{sp} needs {dp * sp} devices, have {len(devices)}")
    grid = np.asarray(devices[: dp * sp]).reshape(dp, sp)
    return Mesh(grid, (DATA_AXIS, SPATIAL_AXIS))


def make_sharded_eval_step(cfg: X3DConfig, mesh: Mesh, *,
                           shard_dim: str = "H",
                           compute_dtype=None,
                           preprocess_mean_std=None):
    """Jitted eval forward with the clip sharded inside each sample.

    ``shard_dim`` selects which clip axis rides the ``spatial`` mesh axis:
    ``"H"`` (image rows — spatial partitioning) or ``"T"`` (frames —
    sequence partitioning; the natural choice for long-video
    localization).  The batch axis is sharded over ``data`` as usual.

    Signature of the returned fn (mirrors ``make_eval_step``):
      ``(params, bn_state, clip[, out_size]) -> logits (float32, on host
      sharding)``; ``clip`` is (B, T, H, W, C) float — or uint8 square
    crops when ``preprocess_mean_std`` is given (then pass static
    ``out_size``; note the resize runs under the same sharding, XLA
    inserts any cross-shard interpolation traffic).

    Unlike the shard_map DP step there is no per-chip code here at all:
    the per-device program — including conv halo exchanges on the sharded
    axis — is derived by the XLA SPMD partitioner from the sharding
    annotations alone.
    """
    if shard_dim not in _CLIP_SPECS:
        raise ValueError(f"shard_dim must be one of {set(_CLIP_SPECS)}, "
                         f"got {shard_dim!r}")
    from x3d_multigrid_tpu.ops.preprocess import eval_preprocess_impl

    if preprocess_mean_std is not None:
        # host numpy on purpose — see the note in _build_local_step
        pp_mean = np.asarray(preprocess_mean_std[0], np.float32)
        pp_std = np.asarray(preprocess_mean_std[1], np.float32)

    rep = NamedSharding(mesh, P())
    clip_in = NamedSharding(mesh, _CLIP_SPECS[shard_dim])
    logits_out = NamedSharding(mesh, P(DATA_AXIS))

    def _cast(tree, dtype):
        return jax.tree.map(
            lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, tree)

    # pjit with in_shardings forbids kwargs: out_size is a *positional*
    # static arg (step(params, bn_state, clip, out_size)).
    @functools.partial(
        jax.jit,
        in_shardings=(rep, rep, clip_in),
        out_shardings=logits_out,
        static_argnums=(3,),
    )
    def step(params, bn_state, clip, out_size=None):
        if preprocess_mean_std is not None:
            clip = eval_preprocess_impl(clip, pp_mean, pp_std,
                                        out_size=out_size,
                                        dtype=compute_dtype)
        if compute_dtype is not None:
            params = _cast(params, compute_dtype)
            clip = clip.astype(compute_dtype)
        logits, _ = forward(params, bn_state, clip, cfg=cfg, train=False)
        return logits.astype(jnp.float32)

    return step


def shard_clip(clip, mesh: Mesh, shard_dim: str = "H"):
    """Place a host clip array onto the mesh with the eval-step's input
    sharding (avoids a fully-replicated transfer before jit re-shards)."""
    return jax.device_put(clip,
                          NamedSharding(mesh, _CLIP_SPECS[shard_dim]))
