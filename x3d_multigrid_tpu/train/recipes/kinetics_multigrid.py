"""Kinetics-400 multigrid training recipe (the reference's main entry point,
train_x3d_kinetics_multigrid.py:108-319, rebuilt TPU-first).

Differences from the reference by design:
- One ``jax.jit`` train step serves every multigrid shape bucket (XLA's jit
  cache keys on shapes); ``precompile()`` warms all 10 buckets up front so
  no compile stalls land mid-training.
- The multigrid state machine is the host-side
  :class:`~x3d_multigrid_tpu.multigrid.schedule.MultigridSchedule`; at a
  long-cycle change the BN split state is resized functionally and the LR
  scaled, mirroring update_bn_splits_long_cycle + the param-group edit
  (train_x3d_kinetics_multigrid.py:227-234).
- Input batches arrive as uint8 crops; resize/flip/normalize run fused on
  device (ops/preprocess.py).
- Validation aggregates SubBN stats and runs 3-view softmax-mean Top-1
  (train_x3d_kinetics_multigrid.py:204-205,239-257).

Run ``python -m x3d_multigrid_tpu.train.recipes.kinetics_multigrid
--synthetic`` for a dataset-free smoke run.
"""

import argparse
import dataclasses
import os
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from x3d_multigrid_tpu.models import (
    x3d_config, init_params, init_bn_state, resize_bn_splits,
    aggregate_all_subbn,
)
from x3d_multigrid_tpu.models.x3d import CROP_SIZE, RESIZE_SIZE, GAMMA_TAU
from x3d_multigrid_tpu.multigrid import (
    MultigridConfig, MultigridSchedule, enumerate_buckets,
)
from x3d_multigrid_tpu.parallel import (
    data_mesh, make_train_step, make_eval_step,
)
from x3d_multigrid_tpu.train import init_momentum, LRController
from x3d_multigrid_tpu.train.checkpoint import (
    save_checkpoint, load_checkpoint,
)
from x3d_multigrid_tpu.evaluate import multiview_softmax_top1
from x3d_multigrid_tpu.data.spatial import train_scales
from x3d_multigrid_tpu.utils import MetricLogger, StepTimer

KINETICS_MEAN = np.array([110.63666788, 103.16065604, 96.29023126]) / 255.0
KINETICS_STD = np.array([38.7568578, 37.88248729, 40.02898126]) / 255.0


@dataclasses.dataclass
class KineticsRecipe:
    """Tunables of the reference recipe (constants at
    train_x3d_kinetics_multigrid.py:49-67,108-123), as a real config."""
    version: str = "M"
    n_classes: int = 400
    batch_size: int = 128                # BS * BS_UPSCALE
    max_epochs: int = 120
    dataset_size: int = 220000
    warmup_steps: int = 8000
    init_lr: Optional[float] = None      # default: linear scaling 1.6/1024*B
    weight_decay: float = 5e-5
    sgd_momentum: float = 0.9
    base_bs_per_replica: int = 32        # BASE_BS_PER_GPU
    const_bn_size: int = 8
    long_cycle: Tuple[int, ...] = (8, 4, 2, 1)
    long_cycle_lr_scale: Tuple[float, ...] = (8, 0.5, 0.5, 0.5)
    frames: int = 80
    val_crops: int = 3
    ckpt_every_steps: int = 4000
    train_epochs_per_val: int = 4
    out_dir: str = "runs/kinetics_multigrid"
    ckpt_backend: str = "npz"            # "npz" | "orbax" (async, retained)
    num_devices: Optional[int] = None
    compute_dtype: Optional[str] = "bf16"
    short_side: int = 256                # host decode canonical short side
    remat: bool = False                  # jax.checkpoint per block
    bn_momentum: float = 0.1             # SubBN running-stat EMA rate
    # Gradient accumulation: micro-batches per optimizer update (the
    # reference's num_steps_per_update, train_x3d_kinetics_multigrid.py:119).
    # LR warmup/milestones/checkpoints count UPDATE steps; the multigrid
    # schedule keeps counting iterations (micro-steps), exactly like the
    # reference (cur_iterations = steps * num_steps_per_update, :120, and
    # lr_schedule = [i // num_steps_per_update ...], :130).
    num_steps_per_update: int = 1
    # jax.profiler trace of the first N train iterations into
    # out_dir/profile (SURVEY §5.1: tracing is first-class here; the
    # reference has only wall-clock progress bars)
    profile_steps: int = 0
    # Smoke-run overrides (None -> per-version defaults)
    crop_size_override: Optional[int] = None
    gamma_tau_override: Optional[int] = None
    model_overrides: Optional[dict] = None  # extra X3DConfig kwargs

    @property
    def lr(self) -> float:
        return self.init_lr if self.init_lr is not None \
            else (1.6 / 1024) * self.batch_size

    @property
    def crop_size(self) -> int:
        return self.crop_size_override or CROP_SIZE[self.version]

    @property
    def gamma_tau(self) -> int:
        return self.gamma_tau_override or GAMMA_TAU[self.version]

    @property
    def base_bn_splits(self) -> int:
        return self.base_bs_per_replica // self.const_bn_size

    @property
    def iterations_per_epoch(self) -> int:
        return self.dataset_size // self.batch_size

    def multigrid_config(self) -> MultigridConfig:
        return MultigridConfig(
            base_batch_size=self.batch_size,
            total_iterations=self.max_epochs * self.iterations_per_epoch,
            long_cycle=self.long_cycle,
            long_cycle_lr_scale=self.long_cycle_lr_scale,
            sample_duration=self.frames,
            crop_size=self.crop_size,
            gamma_tau=self.gamma_tau,
            base_bn_splits=self.base_bn_splits,
        )


class MultigridTrainer:
    """Owns model/optimizer state and the schedule-driven step dispatch.

    ``group_size > 1`` enables grouped dispatch: consecutive iterations are
    buffered per shape bucket and executed as one ``lax.scan`` of
    ``group_size`` SGD steps (parallel/train_step.make_train_loop).
    Within a long-cycle chunk the short cycles alternate deterministically,
    so a window of ``period * group_size`` iterations contains exactly
    ``group_size`` of each bucket; groups are flushed at long-cycle
    transitions (where BN state is resized) and at epoch end.  Batch order
    is permuted within the window — statistically neutral for IID-sampled
    batches — while each iteration keeps its own scheduled LR.
    """

    def __init__(self, recipe: KineticsRecipe, *, seed: int = 0,
                 group_size: int = 1,
                 logger: Optional[MetricLogger] = None):
        self.recipe = recipe
        self.logger = logger or MetricLogger()
        self.mesh = data_mesh(recipe.num_devices)
        self.ndev = self.mesh.devices.size
        self.cfg = x3d_config(recipe.version, n_classes=recipe.n_classes,
                              remat=recipe.remat,
                              **(recipe.model_overrides or {}))
        self.mcfg = recipe.multigrid_config()

        # Per-chip batch must divide into bn_splits groups at every bucket:
        # batch * mult / (ndev * base_bn_splits) must be integral (mult>=1),
        # i.e. batch % (ndev * base_bn_splits) == 0.
        div = self.ndev * recipe.base_bn_splits
        if recipe.batch_size % div:
            raise ValueError(
                f"batch_size {recipe.batch_size} must be a multiple of "
                f"num_devices*base_bn_splits = {self.ndev}*"
                f"{recipe.base_bn_splits} = {div} so each chip's shard "
                f"splits into SubBN groups")

        key = jax.random.PRNGKey(seed)
        self.params = init_params(key, self.cfg)
        self.momentum = init_momentum(self.params)
        self.bn_splits = recipe.base_bn_splits * recipe.long_cycle[0]
        self.bn_state = init_bn_state(self.cfg, self.bn_splits)
        self.step_count = 0    # optimizer updates
        self.iterations = 0    # micro-steps == schedule iterations
        self.epochs = 0
        self.last_val_top1: Optional[float] = None

        dtype = {"bf16": jnp.bfloat16, "fp32": None,
                 None: None}[recipe.compute_dtype]
        self.train_step = make_train_step(
            self.cfg, self.mesh, loss="kinetics",
            momentum=recipe.sgd_momentum, weight_decay=recipe.weight_decay,
            donate=True, compute_dtype=dtype,
            preprocess_mean_std=(KINETICS_MEAN, KINETICS_STD),
            bn_momentum=recipe.bn_momentum)
        self.eval_step = make_eval_step(
            self.cfg, self.mesh, compute_dtype=dtype,
            preprocess_mean_std=(KINETICS_MEAN, KINETICS_STD))

        # Gradient accumulation (num_steps_per_update > 1): per-bucket
        # micro-grad dispatches + one apply per group.  Milestones move to
        # update-step units, as in the reference (:130).
        self.nspu = recipe.num_steps_per_update
        self._grad_sum = None
        self._accum_count = 0
        if group_size > 1 and jax.process_count() > 1:
            # the grouped scan stacks host batches on a leading group dim,
            # which _stage's multi-host global assembly does not shard —
            # grouped dispatch is a single-host latency optimization
            raise ValueError("group_size > 1 is not supported in "
                             "multi-process runs")
        if self.nspu > 1:
            if group_size > 1:
                raise ValueError("group_size > 1 is incompatible with "
                                 "num_steps_per_update > 1")
            from x3d_multigrid_tpu.parallel import (
                make_grad_microstep, make_apply_step)
            self.grad_step = make_grad_microstep(
                self.cfg, self.mesh, loss="kinetics", compute_dtype=dtype,
                preprocess_mean_std=(KINETICS_MEAN, KINETICS_STD),
                bn_momentum=recipe.bn_momentum)
            self.apply_step = make_apply_step(
                accum_steps=self.nspu, momentum=recipe.sgd_momentum,
                weight_decay=recipe.weight_decay)

        self.schedule = MultigridSchedule(self.mcfg,
                                          cur_iterations=self.iterations)
        self.lr_ctrl = LRController(
            recipe.lr, warmup_steps=recipe.warmup_steps,
            milestones=[m // self.nspu for m in self.mcfg.lr_milestones])
        self.timer = StepTimer()
        self.rng = jax.random.PRNGKey(seed + 1)

        self.group_size = group_size
        self._groups: dict = {}   # bucket_key -> list[(batch, lr)]
        self._train_loop = None
        if group_size > 1:
            from x3d_multigrid_tpu.parallel import make_train_loop
            self._train_loop = make_train_loop(
                self.cfg, self.mesh, num_steps=group_size, loss="kinetics",
                momentum=recipe.sgd_momentum,
                weight_decay=recipe.weight_decay, compute_dtype=dtype,
                preprocess_mean_std=(KINETICS_MEAN, KINETICS_STD),
                per_step_batches=True, bn_momentum=recipe.bn_momentum)

    # -- multigrid transitions ---------------------------------------------
    def _maybe_transition(self, plan):
        if plan.bn_splits != self.bn_splits:
            # fresh split stats, mirroring x3d.py:298-303
            self.bn_state = resize_bn_splits(self.bn_state, plan.bn_splits)
            self.bn_splits = plan.bn_splits
        if plan.lr_scale is not None:
            lr = self.lr_ctrl.on_long_cycle(plan.lr_scale)
            self.logger.log(
                "multigrid", long_ind=plan.long_cycle_index,
                frames=plan.frames, crop=plan.crop,
                batch=plan.batch_size, bn_splits=plan.bn_splits, lr=lr)

    # -- steps --------------------------------------------------------------
    def _stage(self, batch) -> dict:
        """Host batch -> device arrays.  Single-process: plain transfers
        (shard_map shards them).  Multi-process (parallel/multihost.py):
        each host holds only its slice of the global batch
        (data/loader.py process_index/process_count), assembled here into
        one globally-sharded array without cross-host movement."""
        tree = {"clip": batch["clip"], "flip": batch["flip"],
                "label": batch["label"]}
        if jax.process_count() > 1:
            from x3d_multigrid_tpu.parallel import global_batch_from_local
            return global_batch_from_local(self.mesh, tree)
        return {k: jnp.asarray(v) for k, v in tree.items()}

    def train_batch(self, batch) -> dict:
        """One iteration.  ``batch``: uint8 ``clip`` (B,T,C0,C0,3), ``flip``
        (B,), ``label`` (B,), ``plan``.  Resize/flip/normalize run inside
        the sharded step (static ``out_size`` = short-cycle crop)."""
        plan = batch["plan"]
        if self.nspu > 1:
            return self._train_batch_accum(batch)
        self._maybe_transition(plan)
        lr = self.lr_ctrl.step_lr(self.step_count)

        self.timer.start(plan.bucket_key)
        self.rng, step_rng = jax.random.split(self.rng)
        self.params, self.momentum, self.bn_state, out = self.train_step(
            self.params, self.momentum, self.bn_state,
            self._stage(batch),
            jnp.float32(lr), step_rng, out_size=plan.crop)
        self.step_count += 1
        self.iterations += 1
        self.timer.stop()
        return {"loss": out.loss, "correct": out.correct, "lr": lr,
                "batch_size": plan.batch_size, "updated": True}

    def _train_batch_accum(self, batch) -> dict:
        """One micro-step of gradient accumulation; applies SGD every
        ``num_steps_per_update`` micro-steps (the reference's num_iter
        counter, train_x3d_kinetics_multigrid.py:267-277).  Micro-steps may
        span different shape buckets — each bucket has its own compiled
        micro-grad step, the accumulated gradient tree is shape-invariant."""
        plan = batch["plan"]
        self._maybe_transition(plan)
        self.timer.start(plan.bucket_key)
        self.rng, step_rng = jax.random.split(self.rng)
        grads, self.bn_state, loss, correct = self.grad_step(
            self.params, self.bn_state,
            self._stage(batch),
            step_rng, out_size=plan.crop)
        if self._grad_sum is None:
            self._grad_sum = grads
        else:
            from x3d_multigrid_tpu.parallel import accumulate_grads
            self._grad_sum = accumulate_grads(self._grad_sum, grads)
        self._accum_count += 1
        self.iterations += 1

        updated = False
        lr = self.lr_ctrl.lr
        if self._accum_count == self.nspu:
            lr = self.lr_ctrl.step_lr(self.step_count)
            self.params, self.momentum = self.apply_step(
                self.params, self.momentum, self._grad_sum, jnp.float32(lr))
            self._grad_sum = None
            self._accum_count = 0
            self.step_count += 1
            updated = True
        self.timer.stop()
        return {"loss": loss, "correct": correct, "lr": lr,
                "batch_size": plan.batch_size, "updated": updated}

    # -- grouped dispatch -----------------------------------------------
    def train_batch_grouped(self, batch) -> list:
        """Buffer one iteration; dispatch when its bucket group fills.
        Returns a list of completed-step result dicts (possibly empty)."""
        plan = batch["plan"]
        results = []
        if plan.lr_scale is not None or plan.bn_splits != self.bn_splits:
            results.extend(self.flush_groups())
        self._maybe_transition(plan)
        lr = self.lr_ctrl.step_lr(self.step_count)
        self.step_count += 1
        self.iterations += 1
        buf = self._groups.setdefault(plan.bucket_key, [])
        buf.append((batch, lr))
        if len(buf) == self.group_size:
            results.extend(self._dispatch_group(plan.bucket_key))
        return results

    def flush_groups(self) -> list:
        results = []
        for key in list(self._groups):
            results.extend(self._dispatch_group(key))
        return results

    def _dispatch_group(self, key) -> list:
        items = self._groups.pop(key, [])
        if not items:
            return []
        plan = items[0][0]["plan"]
        self.timer.start(key)
        self.rng, grp_rng = jax.random.split(self.rng)
        if len(items) == self.group_size and self._train_loop is not None:
            # host batches: one big np.stack then a single transfer;
            # already-on-device batches (run_synthetic device_data):
            # stack on device
            stacked = {
                f: (jnp.asarray(np.stack([b[f] for b, _ in items]))
                    if isinstance(items[0][0][f], np.ndarray)
                    else jnp.stack([b[f] for b, _ in items]))
                for f in ("clip", "flip", "label")}
            lrs = jnp.asarray([lr for _, lr in items], jnp.float32)
            self.params, self.momentum, self.bn_state, out = \
                self._train_loop(self.params, self.momentum, self.bn_state,
                                 stacked, lrs, grp_rng, out_size=plan.crop)
            self.timer.stop()
            return [{"loss": out.loss[i], "correct": out.correct[i],
                     "lr": float(lrs[i]), "batch_size": plan.batch_size}
                    for i in range(len(items))]
        # partial group (transition/epoch flush): single-step dispatches
        results = []
        for i, (b, lr) in enumerate(items):
            self.params, self.momentum, self.bn_state, out = \
                self.train_step(
                    self.params, self.momentum, self.bn_state,
                    self._stage(b),
                    jnp.float32(lr), jax.random.fold_in(grp_rng, i),
                    out_size=plan.crop)
            results.append({"loss": out.loss, "correct": out.correct,
                            "lr": lr, "batch_size": plan.batch_size})
        self.timer.stop()
        return results

    def precompile(self):
        """Compile every bucket's dispatch path up-front on throwaway
        cloned state (the live trees must not be donated here).  Batches
        go through ``_stage`` so multi-process runs compile against the
        same globally-sharded layout training will use.

        Warms whichever step the configuration actually dispatches:
        ``grad_step``+``apply_step`` under gradient accumulation, the
        grouped ``lax.scan`` loop (plus the single step, used for
        partial-group flushes at transitions) under ``group_size > 1``,
        else the plain train step."""
        t0 = time.time()
        c0 = self.recipe.crop_size
        pcount = jax.process_count()
        apply_warmed = False
        for b in enumerate_buckets(self.mcfg):
            bn_c = init_bn_state(self.cfg, b.bn_splits)
            # fail fast, before minutes of compiles, with the same
            # constraint the train loader enforces per batch
            if b.batch_size % pcount or b.batch_size < pcount:
                raise ValueError(
                    f"bucket batch {b.batch_size} not divisible by "
                    f"{pcount} processes (every multigrid bucket's batch "
                    f"must split evenly across hosts)")
            local = b.batch_size // pcount  # host-local share
            batch = self._stage({
                "clip": np.zeros((local, b.frames, c0, c0, 3), np.uint8),
                "flip": np.zeros((local,), bool),
                "label": np.zeros((local,), np.int32),
            })
            if self.nspu > 1:
                grads, _, loss, _ = self.grad_step(
                    self.params, bn_c, batch, jax.random.PRNGKey(0),
                    out_size=b.crop)
                jax.block_until_ready(loss)
                if not apply_warmed:  # shape-invariant: once is enough
                    self.apply_step(jax.tree.map(jnp.copy, self.params),
                                    jax.tree.map(jnp.copy, self.momentum),
                                    grads, jnp.float32(0.0))
                    apply_warmed = True
                continue
            params_c = jax.tree.map(jnp.copy, self.params)
            mom_c = jax.tree.map(jnp.copy, self.momentum)
            _, _, _, out = self.train_step(
                params_c, mom_c, bn_c, batch, jnp.float32(0.0),
                jax.random.PRNGKey(0), out_size=b.crop)
            jax.block_until_ready(out.loss)
            if self._train_loop is not None:
                gbatch = {k: jnp.stack([v] * self.group_size)
                          for k, v in batch.items()}
                lrs = jnp.zeros((self.group_size,), jnp.float32)
                _, _, _, out = self._train_loop(
                    jax.tree.map(jnp.copy, self.params),
                    jax.tree.map(jnp.copy, self.momentum),
                    init_bn_state(self.cfg, b.bn_splits),
                    gbatch, lrs, jax.random.PRNGKey(0), out_size=b.crop)
                jax.block_until_ready(out.loss)
        self.logger.log("precompile", seconds=time.time() - t0,
                        buckets=len(enumerate_buckets(self.mcfg)))

    def eval_epoch(self, loader) -> float:
        """3-view Top-1 over a validation loader (SubBN stats aggregated
        first, as the reference does before every val pass).

        Multi-process: each host's loader supplies its slice of every
        global batch (``valid`` masks zero-padding), logits come back
        batch-sharded, and each host scores its own rows before a final
        cross-host sum (parallel/multihost.py)."""
        from x3d_multigrid_tpu.parallel.mesh import pad_to_multiple
        from x3d_multigrid_tpu.parallel import local_rows, all_hosts_sum
        agg_state = aggregate_all_subbn(self.bn_state)
        correct = total = 0
        for batch in loader:
            clips = batch["clip"]           # (B, n, T, R, R, 3) uint8
            b, n = clips.shape[:2]
            flat = clips.reshape((b * n,) + clips.shape[2:])
            if jax.process_count() > 1:
                from x3d_multigrid_tpu.parallel import (
                    global_batch_from_local)
                # ragged final chunks: keep global rows divisible by the
                # mesh by padding the (host-equal) local share to the
                # local device count
                flat, n_real = pad_to_multiple(
                    flat, jax.local_device_count())
                feed = global_batch_from_local(
                    self.mesh, {"clip": flat})["clip"]
                logits = self.eval_step(self.params, agg_state, feed,
                                        out_size=self.recipe.crop_size)
                logits = local_rows(logits)[:n_real]  # this host's rows
            else:
                # ragged final batches must stay shardable over the mesh
                flat, n_real = pad_to_multiple(flat, self.ndev)
                logits = self.eval_step(self.params, agg_state,
                                        jnp.asarray(flat),
                                        out_size=self.recipe.crop_size)
                logits = logits[:n_real]
            _, preds, _ = multiview_softmax_top1(logits, n)
            valid = np.asarray(batch.get("valid", np.ones(b, bool)))
            hits = (np.asarray(preds) == np.asarray(batch["label"]))
            correct += int(np.sum(hits & valid))
            total += int(np.sum(valid))
        correct, total = all_hosts_sum(correct, total)
        acc = correct / max(total, 1)
        self.last_val_top1 = acc
        self.logger.log("val", epoch=self.epochs, top1=acc, samples=total)
        return acc

    # -- checkpointing ------------------------------------------------------
    def _ckpt_meta(self) -> dict:
        return {"step": self.step_count, "iterations": self.iterations,
                "epochs": self.epochs,
                "long_ind": self.last_long_from_schedule(),
                "bn_splits": self.bn_splits,
                **{f"lr_{k}": v
                   for k, v in self.lr_ctrl.state_dict().items()}}

    def _orbax_mgr(self):
        if getattr(self, "_orbax", None) is None:
            from x3d_multigrid_tpu.train.orbax_ckpt import OrbaxCheckpointer
            self._orbax = OrbaxCheckpointer(
                os.path.join(self.recipe.out_dir, "orbax"))
        return self._orbax

    def save(self, path: Optional[str] = None):
        if self.recipe.ckpt_backend == "orbax":
            # Async production backend (train/orbax_ckpt.py): the save
            # returns as soon as the host gather is done; serialization,
            # retention pruning and the atomic commit happen off-thread.
            mgr = self._orbax_mgr()
            mgr.save(self.step_count, params=self.params,
                     bn_state=self.bn_state, momentum=self.momentum,
                     meta=self._ckpt_meta())
            path = os.path.join(self.recipe.out_dir, "orbax")
        else:
            path = path or os.path.join(
                self.recipe.out_dir, f"ckpt_{self.step_count:06d}")
            # npz is a single-writer format: on pods only process 0 writes
            # (orbax coordinates multi-host saves itself)
            if jax.process_index() == 0:
                save_checkpoint(
                    path, params=self.params, bn_state=self.bn_state,
                    momentum=self.momentum, meta=self._ckpt_meta())
        self.logger.log("checkpoint", path=path, step=self.step_count)
        return path

    def last_long_from_schedule(self) -> int:
        return self.schedule.last_long

    def restore(self, path: str):
        if os.path.isdir(path):  # orbax step directory tree -> latest step
            from x3d_multigrid_tpu.train.orbax_ckpt import OrbaxCheckpointer
            mgr = OrbaxCheckpointer(path)
            ck = mgr.restore()
            mgr.close()
        else:
            ck = load_checkpoint(path)
        self.params = jax.tree.map(jnp.asarray, ck["params"])
        self.bn_state = jax.tree.map(jnp.asarray, ck["bn_state"])
        if "momentum" in ck:
            self.momentum = jax.tree.map(jnp.asarray, ck["momentum"])
        meta = ck["meta"]
        self.step_count = int(meta["step"])
        # pre-accumulation checkpoints carry only update steps; like the
        # reference resume, cur_iterations = steps * num_steps_per_update
        self.iterations = int(meta.get("iterations",
                                       self.step_count * self.nspu))
        self.epochs = int(meta.get("epochs", 0))
        self.bn_splits = int(meta.get("bn_splits", self.bn_splits))
        self.schedule = MultigridSchedule(
            self.mcfg, cur_iterations=self.iterations)
        self.schedule.last_long = int(meta.get("long_ind", -2))
        self.lr_ctrl.load_state_dict(
            {"lr": meta["lr_lr"], "base": meta["lr_base"]})
        self.logger.log("restore", path=path, step=self.step_count)


def _maybe_start_profile(trainer, recipe):
    if recipe.profile_steps <= 0:
        trainer._profiling = False
        return
    logdir = os.path.join(recipe.out_dir, "profile")
    try:
        jax.profiler.start_trace(logdir)
        trainer._profiling = True
        trainer.logger.log("profile", status="started", logdir=logdir)
    except Exception as e:  # some remote backends cannot trace devices
        trainer._profiling = False
        trainer.logger.log("profile", status=f"unavailable: {e}")


def _maybe_stop_profile(trainer, n, force: bool = False):
    """Stop the trace once ``n`` reaches ``profile_steps`` — or
    unconditionally at run exit (``force``), so a run shorter than the
    requested window still writes a usable trace."""
    if getattr(trainer, "_profiling", False) \
            and (force or n >= trainer.recipe.profile_steps):
        trainer._profiling = False
        try:
            jax.profiler.stop_trace()
            trainer.logger.log("profile", status="written", steps=n)
        except Exception as e:
            trainer.logger.log("profile", status=f"stop failed: {e}")


def run_synthetic(recipe: KineticsRecipe, *, iterations: int = 12,
                  logger: Optional[MetricLogger] = None,
                  group_size: int = 1, adaptive_crops: bool = True,
                  class_coded: bool = False, device_data: bool = False):
    """Dataset-free smoke run: drives the full multigrid machinery (bucket
    transitions, BN resize, LR events) on random data.

    ``adaptive_crops`` mirrors the real loader's adaptive decode: batches
    arrive already at the bucket's short-cycle crop (the device resize is
    a no-op), so host gen + H2D cost scales with the bucket like
    production.  ``group_size>1`` uses the grouped lax.scan dispatch.
    This is also the real-TPU training-record path (--synthetic with a
    shrunken --dataset-size so long-cycle transitions land inside the
    run, mirroring the reference log's transition table,
    log_x3d_kinetics_multigrid.txt:15-234).  ``device_data`` generates
    the batches on-chip (see synthetic_train_batch_device's docstring:
    required when the TPU sits behind a slow staging relay)."""
    from x3d_multigrid_tpu.data.synthetic import (
        synthetic_train_batch, synthetic_train_batch_device,
    )

    trainer = MultigridTrainer(recipe, logger=logger,
                               group_size=group_size)
    data_key = jax.random.PRNGKey(1234)
    n = 0
    _maybe_start_profile(trainer, recipe)
    while n < iterations:
        for plan in trainer.schedule.epoch(iterations - n):
            crop = plan.crop if adaptive_crops else recipe.crop_size
            if device_data:
                batch = synthetic_train_batch_device(
                    jax.random.fold_in(data_key, n),
                    plan.batch_size, plan.frames, crop,
                    n_classes=recipe.n_classes, class_coded=class_coded)
            else:
                batch = synthetic_train_batch(
                    plan.batch_size, plan.frames, crop,
                    n_classes=recipe.n_classes, seed=n,
                    class_coded=class_coded)
            batch["plan"] = plan
            if group_size > 1:
                outs = trainer.train_batch_grouped(batch)
            else:
                outs = [trainer.train_batch(batch)]
            for out in outs:
                trainer.logger.log(
                    "train", step=trainer.step_count,
                    iteration=n, loss=float(out["loss"]),
                    lr=out["lr"], bucket=str(plan.bucket_key),
                    bn_splits=trainer.bn_splits)
            # no early break: epoch() advances its state after each yield,
            # so the generator must be exhausted, not abandoned
            n += 1
            _maybe_stop_profile(trainer, n)
    _maybe_stop_profile(trainer, n, force=True)
    if group_size > 1:
        for out in trainer.flush_groups():
            trainer.logger.log(
                "train", step=trainer.step_count, iteration=n,
                loss=float(out["loss"]), lr=out["lr"],
                bucket="flush", bn_splits=trainer.bn_splits)
    trainer.logger.log("bucket_times", **{
        k: round(v["mean_s"], 4)
        for k, v in trainer.timer.summary().items()})
    return trainer


def run(recipe: KineticsRecipe, *, train_root: str, train_anno: str,
        val_root: str, val_anno: str, labels: str,
        resume: Optional[str] = None, precompile: bool = True,
        group_size: int = 1):
    """Full training loop (reference run(),
    train_x3d_kinetics_multigrid.py:108-297)."""
    from x3d_multigrid_tpu.data.kinetics import scan_kinetics
    from x3d_multigrid_tpu.data.loader import (
        KineticsTrainLoader, KineticsEvalLoader,
    )
    from x3d_multigrid_tpu.data.reader import default_reader

    # scan the datasets FIRST: an empty index silently trains on nothing /
    # reports 0.0 val top-1, and should fail loudly before the minutes of
    # bucket precompilation below
    train_samples = scan_kinetics(train_root, train_anno, labels, "train",
                                  min_frames=recipe.frames)
    val_samples = scan_kinetics(val_root, val_anno, labels, "validate",
                                min_frames=recipe.frames)
    for name, found, where in (("train", train_samples, train_root),
                               ("validate", val_samples, val_root)):
        if not found:
            raise ValueError(
                f"{name} scan found no clips with > {recipe.frames + 1} "
                f"frames under {where} (check the annotation subset "
                "labels and frame-folder layout)")

    logger = MetricLogger(os.path.join(recipe.out_dir, "train_log.jsonl"))
    trainer = MultigridTrainer(recipe, logger=logger,
                               group_size=group_size)
    if resume:
        trainer.restore(resume)
    if precompile:
        trainer.precompile()

    reader = default_reader()
    scales = train_scales(recipe.crop_size, RESIZE_SIZE[recipe.version])
    # every host decodes ONLY its process_index slice of each global batch
    # (parallel/multihost.py); single-process this is the whole batch
    loader = KineticsTrainLoader(
        train_samples, trainer.schedule, reader=reader,
        short_side=recipe.short_side, crop_size=recipe.crop_size,
        scales=scales, gamma_tau=recipe.gamma_tau,
        process_index=jax.process_index(),
        process_count=jax.process_count())
    val_loader = KineticsEvalLoader(
        val_samples, reader=reader, short_side=recipe.short_side,
        gamma_tau=recipe.gamma_tau,
        frames=recipe.frames // recipe.gamma_tau, crops=recipe.val_crops,
        batch_size=recipe.batch_size,
        process_index=jax.process_index(),
        process_count=jax.process_count())

    ipe = recipe.iterations_per_epoch
    _maybe_start_profile(trainer, recipe)
    while trainer.epochs < recipe.max_epochs:
        for phase in recipe.train_epochs_per_val * ["train"] + ["val"]:
            if phase == "train":
                trainer.epochs += 1
                # accumulate device scalars; convert only at log points so
                # the host loop never blocks on the in-flight step
                pending = []
                t_epoch = time.perf_counter()
                clips_epoch = 0
                for batch in loader.epoch(ipe):
                    clips_epoch += int(batch["clip"].shape[0])
                    if trainer.group_size > 1:
                        outs = trainer.train_batch_grouped(batch)
                    else:
                        outs = [trainer.train_batch(batch)]
                    for out in outs:
                        pending.append((out["loss"], out["correct"],
                                        out["batch_size"]))
                    _maybe_stop_profile(trainer, trainer.iterations)
                    # cadences count UPDATE steps (reference:275-291), so
                    # skip micro-steps that did not apply an update
                    if not any(o.get("updated", True) for o in outs):
                        continue
                    if trainer.step_count % max(ipe // 2, 1) == 0:
                        losses = [float(l) for l, _, _ in pending]
                        corr = sum(float(c) for _, c, _ in pending)
                        n = sum(b for _, _, b in pending)
                        logger.log("train", epoch=trainer.epochs,
                                   step=trainer.step_count,
                                   loss=sum(losses) / max(len(losses), 1),
                                   top1=corr / max(n, 1))
                        pending = []
                    if trainer.step_count % recipe.ckpt_every_steps == 0:
                        trainer.save()
                if trainer.group_size > 1:
                    for out in trainer.flush_groups():
                        pending.append((out["loss"], out["correct"],
                                        out["batch_size"]))
                if pending:  # tail of the epoch's logging interval
                    losses = [float(l) for l, _, _ in pending]
                    corr = sum(float(c) for _, c, _ in pending)
                    n = sum(b for _, _, b in pending)
                    logger.log("train", epoch=trainer.epochs,
                               step=trainer.step_count,
                               loss=sum(losses) / max(len(losses), 1),
                               top1=corr / max(n, 1))
                # sustained END-TO-END rate: wall time of the whole epoch
                # loop (decode + staging + device steps overlapped by the
                # prefetcher), synced on the in-flight step — the number
                # docs/throughput_e2e.md reconciles against the bench's
                # compute-only buckets
                jax.block_until_ready(trainer.params)
                dt = time.perf_counter() - t_epoch
                logger.log(
                    "sustained", epoch=trainer.epochs,
                    clips=clips_epoch, wall_s=round(dt, 2),
                    clips_per_sec=round(clips_epoch / dt, 2),
                    clips_per_sec_per_chip=round(
                        clips_epoch / dt / jax.local_device_count(), 2))
            else:
                trainer.eval_epoch(val_loader)
    _maybe_stop_profile(trainer, trainer.iterations, force=True)
    return trainer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", help="JSON file of KineticsRecipe fields "
                    "(defaults < config < explicit flags)")
    ap.add_argument("--dump-config", metavar="PATH",
                    help="write the resolved recipe as JSON ('-' = stdout) "
                         "and exit")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--iterations", type=int, default=12)
    ap.add_argument("--version", default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--dataset-size", type=int, default=None)
    ap.add_argument("--max-epochs", type=int, default=None)
    ap.add_argument("--train-root")
    ap.add_argument("--train-anno")
    ap.add_argument("--val-root")
    ap.add_argument("--val-anno")
    ap.add_argument("--labels")
    ap.add_argument("--resume")
    ap.add_argument("--out-dir", default=None)
    ap.add_argument("--dtype", default=None, choices=["bf16", "fp32"])
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model + geometry for smoke runs")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize blocks in backward (less memory)")
    ap.add_argument("--group-size", type=int, default=1,
                    help="scan this many same-bucket iterations per "
                         "dispatch (amortizes host dispatch latency)")
    ap.add_argument("--ckpt-backend", default=None,
                    choices=["npz", "orbax"])
    ap.add_argument("--num-steps-per-update", type=int, default=None,
                    help="gradient-accumulation micro-steps per optimizer "
                         "update (reference num_steps_per_update)")
    ap.add_argument("--warmup-steps", type=int, default=None,
                    help="LR warmup steps (default: reference 8000; set "
                         "small for compressed training-record runs)")
    ap.add_argument("--class-coded", action="store_true",
                    help="synthetic clips carry a label-determined color "
                         "so the loss trajectory descends")
    ap.add_argument("--device-data", action="store_true",
                    help="generate synthetic batches on-device (for "
                         "record runs on remote-tunneled TPUs where host "
                         "staging of full batches is impractical)")
    ap.add_argument("--profile-steps", type=int, default=None,
                    help="capture a jax.profiler trace of the first N "
                         "train iterations into OUT_DIR/profile")
    ap.add_argument("--n-classes", type=int, default=None,
                    help="output classes (default 400; set to the label "
                         "count when training on a non-Kinetics-400 "
                         "directory, e.g. a smoke-test dataset)")
    args = ap.parse_args()

    from x3d_multigrid_tpu.utils.config import make_recipe, save_recipe

    kw = dict(version=args.version, max_epochs=args.max_epochs,
              dataset_size=args.dataset_size, out_dir=args.out_dir,
              compute_dtype=args.dtype,
              ckpt_backend=args.ckpt_backend,
              num_steps_per_update=args.num_steps_per_update,
              profile_steps=args.profile_steps,
              n_classes=args.n_classes, warmup_steps=args.warmup_steps,
              batch_size=args.batch_size)
    if args.remat:  # store_true: absent != explicit False
        kw["remat"] = True
    # --tiny is a PRESET: below-config precedence, so a --config file's
    # geometry/batch settings still win over it (defaults < tiny < config
    # < explicit flags)
    tiny_defaults = None
    if args.tiny:
        tiny_defaults = dict(
            frames=16, crop_size_override=32, gamma_tau_override=2,
            base_bs_per_replica=4, const_bn_size=2, short_side=40,
            batch_size=8,
            model_overrides=dict(
                blocks_override=(1, 1, 1, 1),
                inplanes_override=((12, 8), (16, 8), (24, 16), (32, 16)),
                fc1_dim=32),
        )
    recipe = make_recipe(KineticsRecipe, args.config,
                         defaults=tiny_defaults, **kw)
    if args.dump_config:
        save_recipe(recipe, args.dump_config)
        return

    if args.synthetic:
        logger = MetricLogger(os.path.join(recipe.out_dir,
                                           "synthetic_log.jsonl"))
        run_synthetic(recipe, iterations=args.iterations, logger=logger,
                      group_size=max(args.group_size, 1),
                      class_coded=args.class_coded,
                      device_data=args.device_data)
    else:
        missing = [k for k in ("train_root", "train_anno", "val_root",
                               "val_anno", "labels")
                   if getattr(args, k) is None]
        if missing:
            ap.error(f"missing required data paths: {missing} "
                     "(or use --synthetic)")
        run(recipe, train_root=args.train_root, train_anno=args.train_anno,
            val_root=args.val_root, val_anno=args.val_anno,
            labels=args.labels, resume=args.resume,
            group_size=args.group_size)


if __name__ == "__main__":
    main()
