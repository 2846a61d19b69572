"""Serving: a compiled, BN-folded inference engine for deployment.

Wraps checkpoint loading, BN stat aggregation + folding
(models/folding.py), the fused on-device preprocess, multi-view reduction
and softmax into one object with a single jitted call — the deployment
counterpart of the reference's ad-hoc eval loops.

    engine = InferenceEngine.from_checkpoint("ckpt.npz", x3d_config("M"))
    probs, preds = engine.classify(clips_u8)   # (B, n, T, R, R, 3) uint8
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from x3d_multigrid_tpu.models.x3d import X3DConfig, CROP_SIZE
from x3d_multigrid_tpu.models import aggregate_all_subbn
from x3d_multigrid_tpu.models.folding import fold_bn, forward_folded
from x3d_multigrid_tpu.ops.interpolate import linear_interp_time
from x3d_multigrid_tpu.ops.preprocess import eval_preprocess_impl
from x3d_multigrid_tpu.train.recipes.kinetics_multigrid import (
    KINETICS_MEAN, KINETICS_STD,
)


class InferenceEngine:
    """BN-folded, jitted multi-view classifier."""

    def __init__(self, params, bn_state, cfg: X3DConfig, *,
                 crop_size: Optional[int] = None, compute_dtype=jnp.bfloat16,
                 mean=KINETICS_MEAN, std=KINETICS_STD,
                 mesh=None, shard_dim: str = "H"):
        """``mesh``: optional 2-D ``(data, spatial)`` mesh from
        :func:`x3d_multigrid_tpu.parallel.data_spatial_mesh`.  When given,
        the clip batch is sharded over ``data`` and each clip's
        ``shard_dim`` axis (``"H"`` rows or ``"T"`` frames) over
        ``spatial`` — XLA SPMD derives the conv halo exchanges, so one
        whole-video localization call scales across chips (batch DP
        cannot do that).  The batch must divide the ``data`` axis and the
        sharded clip extent the ``spatial`` axis."""
        self.cfg = cfg
        self.crop_size = crop_size or CROP_SIZE[cfg.version]
        folded = fold_bn(params, aggregate_all_subbn(bn_state))
        if compute_dtype is not None:
            folded = jax.tree.map(
                lambda a: a.astype(compute_dtype)
                if a.dtype == jnp.float32 else a, folded)
        self._folded = folded
        # host numpy on purpose: closed-over device arrays get embedded as
        # program constants and force a D2H fetch at every lowering (slow
        # on remote-attached TPUs); numpy folds in as a literal.
        self._mean = np.asarray(mean, np.float32)
        self._std = np.asarray(std, np.float32)
        self._dtype = compute_dtype

        def _classify(folded_params, clips_u8, n_views):
            b = clips_u8.shape[0]
            flat = clips_u8.reshape((b * n_views,) + clips_u8.shape[2:])
            x = eval_preprocess_impl(flat, self._mean, self._std,
                                     out_size=self.crop_size)
            if self._dtype is not None:
                x = x.astype(self._dtype)
            logits = forward_folded(folded_params, x, cfg=cfg)
            logits = logits.astype(jnp.float32).reshape(b, n_views, -1)
            probs = jax.nn.softmax(logits, axis=-1).mean(axis=1)
            return probs, jnp.argmax(probs, axis=-1)

        def _localize(folded_params, clips_u8, out_len):
            x = eval_preprocess_impl(clips_u8, self._mean, self._std,
                                     out_size=self.crop_size)
            if self._dtype is not None:
                x = x.astype(self._dtype)
            logits = forward_folded(folded_params, x, cfg=cfg)  # (B, T', C)
            logits = linear_interp_time(logits.astype(jnp.float32), out_len)
            return jax.nn.sigmoid(logits)

        # Unsharded impls kept for export_serialized (a serialized blob
        # must not bake in one serving topology's mesh).
        self._classify_impl = _classify
        self._loc_impl = _localize

        if mesh is None:
            self._fn = jax.jit(_classify, static_argnames=("n_views",))
            self._loc_fn = jax.jit(_localize, static_argnames=("out_len",))
        else:
            # clip layouts: classify (B, views, T, H, W, C),
            #               localize (B, T, H, W, C)
            from x3d_multigrid_tpu.parallel.mesh import DATA_AXIS
            from x3d_multigrid_tpu.parallel.spatial import SPATIAL_AXIS
            d, s = DATA_AXIS, SPATIAL_AXIS
            cls_specs = {"H": P(d, None, None, s), "T": P(d, None, s)}
            loc_specs = {"H": P(d, None, s), "T": P(d, s)}
            if shard_dim not in cls_specs:
                raise ValueError(f"shard_dim must be one of "
                                 f"{set(cls_specs)}, got {shard_dim!r}")
            rep = NamedSharding(mesh, P())
            rows = NamedSharding(mesh, P(d))
            # in_shardings forbids kwargs: static args are positional.
            self._fn = jax.jit(
                _classify, static_argnums=(2,),
                in_shardings=(rep, NamedSharding(mesh, cls_specs[shard_dim])),
                out_shardings=(rows, rows))
            self._loc_fn = jax.jit(
                _localize, static_argnums=(2,),
                in_shardings=(rep, NamedSharding(mesh, loc_specs[shard_dim])),
                out_shardings=rows)

    @classmethod
    def from_checkpoint(cls, path: str, cfg: X3DConfig, **kw):
        if path.endswith(".pt"):
            from x3d_multigrid_tpu.train.checkpoint import (
                load_torch_checkpoint,
            )
            params, bn_state, _ = load_torch_checkpoint(path, cfg)
        else:
            from x3d_multigrid_tpu.train.checkpoint import load_checkpoint
            ck = load_checkpoint(path)
            params, bn_state = ck["params"], ck["bn_state"]
        params = jax.tree.map(jnp.asarray, params)
        bn_state = jax.tree.map(jnp.asarray, bn_state)
        return cls(params, bn_state, cfg, **kw)

    def classify(self, clips_u8) -> Tuple[np.ndarray, np.ndarray]:
        """``clips_u8``: (B, n_views, T, R, R, 3) uint8 center-crop squares
        (or (B, T, R, R, 3) for single view).  Returns (probs, preds)."""
        if self.cfg.task != "class":
            raise ValueError("classify() requires a task='class' model; "
                             "use localize() for task='loc'")
        clips_u8 = jnp.asarray(clips_u8)
        if clips_u8.ndim == 5:
            clips_u8 = clips_u8[:, None]
        probs, preds = self._fn(self._folded, clips_u8,
                                clips_u8.shape[1])
        return np.asarray(probs), np.asarray(preds)

    def localize(self, clips_u8, out_len: int) -> np.ndarray:
        """Per-frame action probabilities for a ``task='loc'`` model.

        ``clips_u8``: (B, T, R, R, 3) uint8 whole-video windows.  The
        head's (B, T', C) logits are linearly interpolated to ``out_len``
        frames then passed through sigmoid — the reference's localization
        scoring (train_x3d_charades_loc.py:168-186).  Returns
        (B, out_len, C) float32 probabilities."""
        if self.cfg.task != "loc":
            raise ValueError("localize() requires a task='loc' model; "
                             "use classify() for task='class'")
        probs = self._loc_fn(self._folded, jnp.asarray(clips_u8), out_len)
        return np.asarray(probs)

    def export_serialized(self, batch_size: int, t: int, in_size: int, *,
                          n_views: int = 1, out_len: Optional[int] = None,
                          platforms=("cpu", "tpu")) -> bytes:
        """AOT-export the folded inference computation — weights baked in
        as constants — to a serialized StableHLO artifact (``jax.export``).

        The blob is self-contained: reload it anywhere with
        ``load_serialized`` (no model code, config, or checkpoint needed)
        or hand the MLIR to a PjRT C++ runtime.  Shapes are fixed at
        export time.

        task='class': input (B, n_views, T, R, R, 3) uint8 →
        (probs, preds).  task='loc' (``out_len`` required):
        (B, T, R, R, 3) uint8 → (B, out_len, C) per-frame probs.
        """
        from jax import export as jax_export
        if self.cfg.task == "class":
            fn = jax.jit(
                lambda clips: self._classify_impl(self._folded, clips,
                                                  n_views))
            spec = jax.ShapeDtypeStruct(
                (batch_size, n_views, t, in_size, in_size, 3), jnp.uint8)
        else:
            if out_len is None:
                raise ValueError("out_len is required for task='loc'")
            fn = jax.jit(
                lambda clips: self._loc_impl(self._folded, clips, out_len))
            spec = jax.ShapeDtypeStruct(
                (batch_size, t, in_size, in_size, 3), jnp.uint8)
        return bytes(jax_export.export(fn, platforms=list(platforms))(
            spec).serialize())


def load_serialized(blob: bytes):
    """Rehydrate an ``export_serialized`` artifact into a jitted callable
    taking the uint8 clip array.  Works without the checkpoint or any
    model code."""
    from jax import export as jax_export
    return jax.jit(jax_export.deserialize(blob).call)
