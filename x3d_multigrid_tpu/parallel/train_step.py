"""Data-parallel train/eval steps: shard_map over a 1-D mesh.

Design (SURVEY §5.8): the batch is sharded over the ``data`` axis; params,
momentum and BN state are replicated.  Inside ``shard_map`` each chip runs
the forward/backward on its local shard with *local* SubBN splits — exactly
the reference's per-GPU BN semantics (no cross-device BN sync) — then
gradients are ``pmean``-reduced over ICI.  BN running stats are
``pmean``-ed too (tiny (S, C) arrays): a deliberate improvement over
``nn.DataParallel``, which silently keeps only GPU-0's stats.

Loss parity: Kinetics uses mean cross-entropy (train_x3d_kinetics_multigrid
.py:189,259); Charades uses mean BCE-with-logits (train_x3d_charades.py:122);
the loc task uses (BCE(max_t) + BCE(per-frame)) / 2 with temporal linear
interpolation of logits to label length (train_x3d_charades_loc.py:168-189).

One compiled step per multigrid shape bucket; the trainer caches them by
``IterationPlan.bucket_key``.
"""

import functools
from typing import Callable, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from x3d_multigrid_tpu.models.x3d import X3DConfig, forward
from x3d_multigrid_tpu.parallel.mesh import DATA_AXIS
from x3d_multigrid_tpu.train.sgd import sgd_update
from x3d_multigrid_tpu.ops.interpolate import linear_interp_time


class TrainStepOutputs(NamedTuple):
    loss: jax.Array
    correct: jax.Array  # summed top-1 correct (class task) or 0.0


def cross_entropy(logits, labels):
    """Mean CE over the batch; labels are int class ids (B,)."""
    # promote (never demote): f32 accumulation for bf16 logits, but f64
    # stays f64 so the float64 reference-parity tests see the real loss
    acc = jnp.promote_types(logits.dtype, jnp.float32)
    logp = jax.nn.log_softmax(logits.astype(acc), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def bce_with_logits(logits, targets, mask=None):
    """Mean binary cross-entropy with logits (torch BCEWithLogitsLoss)."""
    acc = jnp.promote_types(logits.dtype, jnp.float32)
    x = logits.astype(acc)
    t = targets.astype(acc)
    # log(1+e^-|x|) formulation for stability
    loss = jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    if mask is not None:
        loss = loss * mask
        return jnp.sum(loss) / jnp.maximum(jnp.sum(mask) * 1.0, 1.0)
    return jnp.mean(loss)


def _kinetics_loss(logits, batch):
    loss = cross_entropy(logits, batch["label"])
    correct = jnp.sum(jnp.argmax(logits, -1) == batch["label"]).astype(
        jnp.float32)
    return loss, correct


def _charades_class_loss(logits, batch):
    loss = bce_with_logits(logits, batch["label"])
    return loss, jnp.float32(0.0)


def _charades_loc_loss(logits, batch):
    """logits (B, T, C); labels (B, TL, C); mask (B, TL).

    cls_loss = BCE(max_t logits, max_t labels);
    loc_loss = BCE(interp(logits, TL), labels);  total = mean/2
    (train_x3d_charades_loc.py:172-189 — reference BCE is unmasked, padded
    frames included; preserved for parity.)
    """
    labels = batch["label"]
    tl = labels.shape[1]
    up = linear_interp_time(logits, tl)  # (B, TL, C)
    cls_loss = bce_with_logits(jnp.max(up, axis=1), jnp.max(labels, axis=1))
    loc_loss = bce_with_logits(up, labels)
    return (cls_loss + loc_loss) / 2.0, jnp.float32(0.0)


LOSS_FNS: Dict[str, Callable] = {
    "kinetics": _kinetics_loss,
    "charades_class": _charades_class_loss,
    "charades_loc": _charades_loc_loss,
}


def _cast_tree(tree, dtype):
    return jax.tree.map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, tree)


def _build_local_step(cfg: X3DConfig, *, loss: str, momentum: float,
                      weight_decay: float, compute_dtype,
                      preprocess_mean_std, bn_momentum: float = 0.1):
    """The per-chip step body shared by make_train_step (one dispatch per
    step) and make_train_loop (lax.scan of many steps in one dispatch)."""
    from x3d_multigrid_tpu.ops.preprocess import train_preprocess_impl

    loss_fn = LOSS_FNS[loss]
    if preprocess_mean_std is not None:
        # HOST numpy, deliberately: a jnp.asarray here would create eager
        # device arrays that get closed over and embedded as program
        # constants — and constant embedding fetches the value back from
        # the device at every lowering (measured 90-380 s per lowering on
        # a remote-attached TPU whose first D2H round trip stalls).  As
        # numpy they fold into the trace as literals, zero device traffic.
        pp_mean = np.asarray(preprocess_mean_std[0], np.float32)
        pp_std = np.asarray(preprocess_mean_std[1], np.float32)

    def local_grads(params, bn_state, batch, rng, out_size):
        """Per-chip loss/grads for one micro-batch (no optimizer update)."""
        # Per-chip rng: fold in the data-axis index so dropout masks differ.
        idx = jax.lax.axis_index(DATA_AXIS)
        rng = jax.random.fold_in(rng, idx)

        def compute_loss(p):
            if preprocess_mean_std is not None:
                clip = train_preprocess_impl(
                    batch["clip"], batch["flip"], pp_mean, pp_std,
                    out_size=out_size, dtype=compute_dtype)
            else:
                clip = batch["clip"]
            if compute_dtype is not None:
                # bf16 compute with fp32 master weights: cast at use so the
                # grads (cast transpose) accumulate back in fp32.  BN stats
                # are always fp32 internally (ops/subbn.py).
                p = _cast_tree(p, compute_dtype)
                clip = clip.astype(compute_dtype)
            logits, new_bn = forward(p, bn_state, clip, cfg=cfg,
                                     train=True, rng=rng,
                                     momentum=bn_momentum)
            l, correct = loss_fn(logits, batch)
            return l, (new_bn, correct)

        (l, (new_bn, correct)), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(params)
        return grads, new_bn, l, correct

    def local_step(params, mom, bn_state, batch, lr, rng, out_size):
        grads, new_bn, l, correct = local_grads(params, bn_state, batch,
                                                rng, out_size)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        new_bn = jax.lax.pmean(new_bn, DATA_AXIS)
        l = jax.lax.pmean(l, DATA_AXIS)
        correct = jax.lax.psum(correct, DATA_AXIS)

        new_params, new_mom = sgd_update(
            params, grads, mom, lr=lr, momentum=momentum,
            weight_decay=weight_decay)
        return new_params, new_mom, new_bn, l, correct

    local_step.local_grads = local_grads
    local_step.sgd_kwargs = dict(momentum=momentum,
                                 weight_decay=weight_decay)
    return local_step


def _batch_spec(loss: str, preprocess_mean_std):
    batch_keys = ["clip", "label"]
    if loss == "charades_loc":
        batch_keys.append("mask")
    if preprocess_mean_std is not None:
        batch_keys.append("flip")
    return {k: P(DATA_AXIS) for k in batch_keys}


def make_train_step(cfg: X3DConfig, mesh: Mesh, *, loss: str = "kinetics",
                    momentum: float = 0.9, weight_decay: float = 5e-5,
                    donate: bool = True, compute_dtype=None,
                    preprocess_mean_std=None, bn_momentum: float = 0.1):
    """Build a jitted DP train step.

    Signature of the returned fn:
      ``(params, mom, bn_state, batch, lr, rng[, out_size]) ->
        (params, mom, bn_state, TrainStepOutputs)``

    ``batch`` is a dict with ``clip`` plus task labels; the batch is
    sharded over ``data``, everything else replicated.  ``lr`` is a scalar
    (host-fed; changes don't recompile — it is a traced 0-d array).

    With ``preprocess_mean_std=(mean, std)`` the step fuses the on-device
    input stage (ops/preprocess.py): ``batch['clip']`` is then uint8
    ``(B, T, C0, C0, 3)`` with a ``batch['flip']`` bool vector, and the
    static ``out_size`` kwarg selects the short-cycle resize target.
    ``out_size`` must be static because distinct multigrid buckets can
    share the uint8 input shape while differing in output crop.
    """
    local_step = _build_local_step(
        cfg, loss=loss, momentum=momentum, weight_decay=weight_decay,
        compute_dtype=compute_dtype,
        preprocess_mean_std=preprocess_mean_std, bn_momentum=bn_momentum)
    batch_spec = _batch_spec(loss, preprocess_mean_std)
    rep = P()

    donate_args = (0, 1, 2) if donate else ()

    @functools.partial(jax.jit, donate_argnums=donate_args,
                       static_argnames=("out_size",))
    def step(params, mom, bn_state, batch, lr, rng, out_size=None):
        sharded = shard_map(
            functools.partial(local_step, out_size=out_size),
            mesh=mesh,
            in_specs=(rep, rep, rep, batch_spec, rep, rep),
            out_specs=(rep, rep, rep, rep, rep),
            check_vma=False,
        )
        p, m, bn, l, c = sharded(params, mom, bn_state, batch, lr, rng)
        return p, m, bn, TrainStepOutputs(loss=l, correct=c)

    return step


def make_train_loop(cfg: X3DConfig, mesh: Mesh, *, num_steps: int,
                    loss: str = "kinetics", momentum: float = 0.9,
                    weight_decay: float = 5e-5, compute_dtype=None,
                    preprocess_mean_std=None, per_step_batches: bool = True,
                    bn_momentum: float = 0.1):
    """Multi-step in-graph training: ``num_steps`` sequential SGD steps in
    ONE dispatch via ``lax.scan``.

    Amortizes host->device dispatch latency (important both for remote-
    attached TPUs and for tight step times) at the cost of staging
    ``num_steps`` batches on device.  All steps share one shape bucket —
    the multigrid trainer groups same-bucket iterations before using it.

    ``batch`` leaves carry a leading ``num_steps`` axis when
    ``per_step_batches`` (scan consumes one slice per step); with
    ``per_step_batches=False`` a single batch is reused every step
    (benchmarking).  ``lr`` may be scalar or (num_steps,).

    Returns fn(params, mom, bn_state, batch, lr, rng[, out_size]) ->
    (params, mom, bn_state, TrainStepOutputs with (num_steps,) leaves).
    """
    local_step = _build_local_step(
        cfg, loss=loss, momentum=momentum, weight_decay=weight_decay,
        compute_dtype=compute_dtype,
        preprocess_mean_std=preprocess_mean_std, bn_momentum=bn_momentum)
    # batch dim 0 is the scan axis when per-step batches are stacked; the
    # data-parallel shard axis is then dim 1
    batch_spec = {
        k: (P(None, DATA_AXIS) if per_step_batches else P(DATA_AXIS))
        for k in _batch_spec(loss, preprocess_mean_std)}
    rep = P()

    def local_loop(params, mom, bn_state, batch, lr, rng, out_size):
        lr_vec = jnp.broadcast_to(lr, (num_steps,))

        def body(carry, idx):
            p, m, bn = carry
            b = jax.tree.map(lambda x: x[idx], batch) \
                if per_step_batches else batch
            step_rng = jax.random.fold_in(rng, idx)
            p, m, bn, l, c = local_step(p, m, bn, b, lr_vec[idx], step_rng,
                                        out_size)
            return (p, m, bn), (l, c)

        (params, mom, bn_state), (losses, corrects) = jax.lax.scan(
            body, (params, mom, bn_state), jnp.arange(num_steps))
        return params, mom, bn_state, losses, corrects

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2),
                       static_argnames=("out_size",))
    def loop(params, mom, bn_state, batch, lr, rng, out_size=None):
        sharded = shard_map(
            functools.partial(local_loop, out_size=out_size),
            mesh=mesh,
            in_specs=(rep, rep, rep, batch_spec, rep, rep),
            out_specs=(rep, rep, rep, rep, rep),
            check_vma=False,
        )
        p, m, bn, l, c = sharded(params, mom, bn_state, batch, lr, rng)
        return p, m, bn, TrainStepOutputs(loss=l, correct=c)

    return loop


def make_grad_accum_step(cfg: X3DConfig, mesh: Mesh, *, accum_steps: int,
                         loss: str = "kinetics", momentum: float = 0.9,
                         weight_decay: float = 5e-5, compute_dtype=None,
                         preprocess_mean_std=None, bn_momentum: float = 0.1):
    """Gradient accumulation: ``accum_steps`` micro-batch backwards, one
    SGD update (the reference's ``num_steps_per_update``,
    train_x3d_kinetics_multigrid.py:119,267-277 — loss is divided by the
    accumulation count, so the applied gradient is the micro-batch mean).

    Batch leaves carry a leading ``accum_steps`` axis.  SubBN running stats
    thread through the micro-batches sequentially, as in the reference's
    consecutive backward passes.
    """
    local_step = _build_local_step(
        cfg, loss=loss, momentum=momentum, weight_decay=weight_decay,
        compute_dtype=compute_dtype,
        preprocess_mean_std=preprocess_mean_std, bn_momentum=bn_momentum)
    local_grads = local_step.local_grads
    batch_spec = {k: P(None, DATA_AXIS)
                  for k in _batch_spec(loss, preprocess_mean_std)}
    rep = P()

    def local_accum(params, mom, bn_state, batch, lr, rng, out_size):
        def body(carry, idx):
            g_acc, bn = carry
            b = jax.tree.map(lambda x: x[idx], batch)
            g, bn, l, c = local_grads(params, bn, b,
                                      jax.random.fold_in(rng, idx),
                                      out_size)
            g_acc = jax.tree.map(jnp.add, g_acc, g)
            return (g_acc, bn), (l, c)

        zeros = jax.tree.map(jnp.zeros_like, params)
        (g_sum, new_bn), (losses, corrects) = jax.lax.scan(
            body, (zeros, bn_state), jnp.arange(accum_steps))

        grads = jax.tree.map(lambda g: g / accum_steps, g_sum)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        new_bn = jax.lax.pmean(new_bn, DATA_AXIS)
        l = jax.lax.pmean(jnp.mean(losses), DATA_AXIS)
        correct = jax.lax.psum(jnp.sum(corrects), DATA_AXIS)

        new_params, new_mom = sgd_update(
            params, grads, mom, lr=lr, momentum=momentum,
            weight_decay=weight_decay)
        return new_params, new_mom, new_bn, l, correct

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2),
                       static_argnames=("out_size",))
    def step(params, mom, bn_state, batch, lr, rng, out_size=None):
        sharded = shard_map(
            functools.partial(local_accum, out_size=out_size),
            mesh=mesh,
            in_specs=(rep, rep, rep, batch_spec, rep, rep),
            out_specs=(rep, rep, rep, rep, rep),
            check_vma=False,
        )
        p, m, bn, l, c = sharded(params, mom, bn_state, batch, lr, rng)
        return p, m, bn, TrainStepOutputs(loss=l, correct=c)

    return step


def make_grad_microstep(cfg: X3DConfig, mesh: Mesh, *, loss: str = "kinetics",
                        compute_dtype=None, preprocess_mean_std=None,
                        bn_momentum: float = 0.1):
    """One micro-batch of gradient accumulation: pmean'd grads + updated BN
    state, NO optimizer update.

    Unlike :func:`make_grad_accum_step` (which scans a stacked same-shape
    batch), this dispatches one micro-batch at a time, so consecutive
    micro-batches may come from *different multigrid shape buckets* — the
    situation the reference's ``num_steps_per_update`` loop actually hits,
    since short cycles change the batch shape every iteration
    (train_x3d_kinetics_multigrid.py:119,267-277).  Pair with
    :func:`make_apply_step` every ``num_steps_per_update`` micro-steps.

    Returns fn(params, bn_state, batch, rng[, out_size]) ->
    (grads, new_bn_state, loss, correct).
    """
    local_step = _build_local_step(
        cfg, loss=loss, momentum=0.0, weight_decay=0.0,
        compute_dtype=compute_dtype,
        preprocess_mean_std=preprocess_mean_std, bn_momentum=bn_momentum)
    local_grads = local_step.local_grads
    batch_spec = _batch_spec(loss, preprocess_mean_std)
    rep = P()

    def local(params, bn_state, batch, rng, out_size):
        g, bn, l, c = local_grads(params, bn_state, batch, rng, out_size)
        g = jax.lax.pmean(g, DATA_AXIS)
        bn = jax.lax.pmean(bn, DATA_AXIS)
        l = jax.lax.pmean(l, DATA_AXIS)
        c = jax.lax.psum(c, DATA_AXIS)
        return g, bn, l, c

    @functools.partial(jax.jit, static_argnames=("out_size",))
    def step(params, bn_state, batch, rng, out_size=None):
        return shard_map(
            functools.partial(local, out_size=out_size),
            mesh=mesh,
            in_specs=(rep, rep, batch_spec, rep),
            out_specs=(rep, rep, rep, rep),
            check_vma=False,
        )(params, bn_state, batch, rng)

    return step


def make_apply_step(*, accum_steps: int, momentum: float = 0.9,
                    weight_decay: float = 5e-5):
    """SGD update from an accumulated gradient sum: divides by
    ``accum_steps`` (the reference divides each micro-loss by
    ``num_steps_per_update``, so the applied gradient is the micro-batch
    mean — train_x3d_kinetics_multigrid.py:268).  Donates params/momentum/
    gradient buffers.

    Returns fn(params, mom, grad_sum, lr) -> (params, mom).
    """
    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def apply(params, mom, grad_sum, lr):
        grads = jax.tree.map(lambda g: g / accum_steps, grad_sum)
        return sgd_update(params, grads, mom, lr=lr, momentum=momentum,
                          weight_decay=weight_decay)

    return apply


# Donating the running sum keeps grad accumulation allocation-free.
accumulate_grads = jax.jit(
    lambda acc, g: jax.tree.map(jnp.add, acc, g), donate_argnums=(0,))


def make_eval_step(cfg: X3DConfig, mesh: Mesh, *, compute_dtype=None,
                   preprocess_mean_std=None):
    """Jitted DP eval forward: returns logits gathered on the host.

    ``clip``: (B, T, H, W, C) float — or uint8 center-crop squares when
    ``preprocess_mean_std`` is given (then pass static ``out_size``).
    Multi-view eval flattens views into B upstream (the reference's
    view-folding, train_x3d_kinetics_multigrid.py:241-242).
    """
    from x3d_multigrid_tpu.ops.preprocess import eval_preprocess_impl

    if preprocess_mean_std is not None:
        # host numpy on purpose — see the note in _build_local_step
        pp_mean = np.asarray(preprocess_mean_std[0], np.float32)
        pp_std = np.asarray(preprocess_mean_std[1], np.float32)

    def local_fwd(params, bn_state, clip, out_size):
        if preprocess_mean_std is not None:
            clip = eval_preprocess_impl(clip, pp_mean, pp_std,
                                        out_size=out_size,
                                        dtype=compute_dtype)
        if compute_dtype is not None:
            params = _cast_tree(params, compute_dtype)
            clip = clip.astype(compute_dtype)
        logits, _ = forward(params, bn_state, clip, cfg=cfg, train=False)
        return logits.astype(jnp.float32)

    @functools.partial(jax.jit, static_argnames=("out_size",))
    def step(params, bn_state, clip, out_size=None):
        return shard_map(
            functools.partial(local_fwd, out_size=out_size),
            mesh=mesh,
            in_specs=(P(), P(), P(DATA_AXIS)),
            out_specs=P(DATA_AXIS),
            check_vma=False,
        )(params, bn_state, clip)

    return step
