"""Charades fine-tune recipes: multi-label classification and temporal
localization (reference train_x3d_charades.py / train_x3d_charades_loc.py,
rebuilt TPU-first).

Shared skeleton: X3D-M initialized from a Kinetics checkpoint with the
classifier head swapped to 157 classes (replace_logits), base_bn_splits=1
(no multigrid), SGD + ReduceLROnPlateau on val loss, BCE-with-logits loss,
mAP via the streaming APMeter; val every 2 train epochs with aggregated
SubBN stats.  Classification evaluates 10 temporal views reduced by max;
localization interpolates per-frame logits to label resolution and computes
masked per-sample AP.

Run ``python -m x3d_multigrid_tpu.train.recipes.charades --task class
--synthetic`` for a dataset-free smoke run.
"""

import argparse
import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from x3d_multigrid_tpu.models import (
    x3d_config, init_params, init_bn_state, replace_logits,
    aggregate_all_subbn,
)
from x3d_multigrid_tpu.models.x3d import CROP_SIZE, RESIZE_SIZE
from x3d_multigrid_tpu.parallel import (
    data_mesh, make_train_step, make_train_loop, make_eval_step,
)
from x3d_multigrid_tpu.train import init_momentum, PlateauLRController
from x3d_multigrid_tpu.train.checkpoint import (
    save_checkpoint, load_checkpoint, load_torch_checkpoint,
)
from x3d_multigrid_tpu.ops.interpolate import linear_interp_time
from x3d_multigrid_tpu.evaluate import APMeter, multiview_max_probs
from x3d_multigrid_tpu.utils import MetricLogger

CHARADES_MEAN = np.array([0.413, 0.368, 0.338])
CHARADES_STD = np.array([0.131, 0.125, 0.132])


@dataclasses.dataclass
class CharadesRecipe:
    """Reference constants (train_x3d_charades.py:38-50,116-117)."""
    task: str = "class"                  # 'class' | 'loc'
    version: str = "M"
    n_classes: int = 157
    batch_size: int = 32                 # BS * BS_UPSCALE
    max_epochs: int = 100
    init_lr: float = 0.04                # 0.02 * BS_UPSCALE
    weight_decay: float = 1e-5
    sgd_momentum: float = 0.9
    bn_momentum: float = 0.1          # torch BN default (x3d.py SubBN);
                                      # short runs (tests) raise it so the
                                      # aggregated eval stats catch up
    frames: int = 80                     # doubled in the dataset (=160 raw)
    gamma_tau: int = 5                   # doubled in the dataset (=10)
    val_crops: int = 10
    ckpt_every_steps: int = 1000
    train_epochs_per_val: int = 2
    out_dir: str = "runs/charades"
    ckpt_backend: str = "npz"            # "npz" | "orbax" (async, retained)
    num_devices: Optional[int] = None
    compute_dtype: Optional[str] = "bf16"
    short_side: int = 256
    crop_size_override: Optional[int] = None
    model_overrides: Optional[dict] = None

    @property
    def crop_size(self) -> int:
        return self.crop_size_override or CROP_SIZE[self.version]

    @property
    def model_frames(self) -> int:
        return (2 * self.frames) // (2 * self.gamma_tau)  # 16 for defaults


class CharadesTrainer:
    """Owns state for both Charades tasks."""

    def __init__(self, recipe: CharadesRecipe, *, seed: int = 0,
                 pretrained: Optional[str] = None,
                 logger: Optional[MetricLogger] = None,
                 group_size: int = 1):
        self.recipe = recipe
        self.group_size = max(group_size, 1)
        if self.group_size > 1 and jax.process_count() > 1:
            raise ValueError("group_size > 1 is single-process only "
                             "(grouped batches bypass the global-assembly "
                             "staging path)")
        self._group_buf = []
        self.logger = logger or MetricLogger()
        self.mesh = data_mesh(recipe.num_devices)
        if recipe.batch_size % self.mesh.devices.size:
            raise ValueError(
                f"batch_size {recipe.batch_size} must be a multiple of "
                f"num_devices {self.mesh.devices.size}")
        task = "loc" if recipe.task == "loc" else "class"
        self.cfg = x3d_config(recipe.version, n_classes=400, task=task,
                              **(recipe.model_overrides or {}))

        key = jax.random.PRNGKey(seed)
        if pretrained and pretrained.endswith(".pt"):
            self.params, self.bn_state, _ = load_torch_checkpoint(
                pretrained, self.cfg)
            self.params = jax.tree.map(jnp.asarray, self.params)
            self.bn_state = jax.tree.map(jnp.asarray, self.bn_state)
            self.logger.log("pretrained", path=pretrained)
        elif pretrained:
            ck = load_checkpoint(pretrained)
            self.params = jax.tree.map(jnp.asarray, ck["params"])
            self.bn_state = jax.tree.map(jnp.asarray, ck["bn_state"])
            self.logger.log("pretrained", path=pretrained)
        else:
            self.params = init_params(key, self.cfg)
            self.bn_state = init_bn_state(self.cfg, 1)
        # swap the head to 157 classes (train_x3d_charades.py:102)
        self.params = replace_logits(self.params, jax.random.fold_in(key, 1),
                                     recipe.n_classes)
        self.cfg = dataclasses.replace(self.cfg, n_classes=recipe.n_classes)
        # base_bn_splits=1: collapse split stats to a single split
        from x3d_multigrid_tpu.models import resize_bn_splits
        self.bn_state = resize_bn_splits(self.bn_state, 1)

        self.momentum = init_momentum(self.params)
        self.step_count = 0
        self.epochs = 0
        self.last_val = None

        dtype = {"bf16": jnp.bfloat16, "fp32": None,
                 None: None}[recipe.compute_dtype]
        loss = "charades_loc" if task == "loc" else "charades_class"
        self.train_step = make_train_step(
            self.cfg, self.mesh, loss=loss, momentum=recipe.sgd_momentum,
            weight_decay=recipe.weight_decay, donate=True,
            compute_dtype=dtype, bn_momentum=recipe.bn_momentum,
            preprocess_mean_std=(CHARADES_MEAN, CHARADES_STD))
        self.eval_step = make_eval_step(
            self.cfg, self.mesh, compute_dtype=dtype,
            preprocess_mean_std=(CHARADES_MEAN, CHARADES_STD))
        # grouped dispatch: Charades shapes are fixed (no multigrid), so
        # there is exactly one group — group_size steps per lax.scan
        # dispatch, same amortization as the Kinetics grouped path
        self._train_loop = None
        if self.group_size > 1:
            self._train_loop = make_train_loop(
                self.cfg, self.mesh, num_steps=self.group_size, loss=loss,
                momentum=recipe.sgd_momentum,
                weight_decay=recipe.weight_decay, compute_dtype=dtype,
                per_step_batches=True, bn_momentum=recipe.bn_momentum,
                preprocess_mean_std=(CHARADES_MEAN, CHARADES_STD))
        self.lr_ctrl = PlateauLRController(recipe.init_lr)
        self.rng = jax.random.PRNGKey(seed + 1)
        self.train_apm = APMeter()

    def train_batch(self, batch) -> dict:
        """``batch``: uint8 ``clip`` (B,T,C0,C0,3), ``flip`` (B,),
        ``label`` (B,C) class / (B,TL,C) loc, optional ``mask`` (B,TL)."""
        self.rng, step_rng = jax.random.split(self.rng)
        keys = ("clip", "flip", "label") + (
            ("mask",) if "mask" in batch else ())
        if jax.process_count() > 1:  # pod fine-tunes (parallel/multihost.py)
            from x3d_multigrid_tpu.parallel import global_batch_from_local
            feed = global_batch_from_local(
                self.mesh, {k: batch[k] for k in keys})
        else:
            feed = {k: jnp.asarray(batch[k]) for k in keys}
        self.params, self.momentum, self.bn_state, out = self.train_step(
            self.params, self.momentum, self.bn_state, feed,
            jnp.float32(self.lr_ctrl.lr), step_rng,
            out_size=self.recipe.crop_size)
        self.step_count += 1
        return {"loss": out.loss}

    def train_batch_grouped(self, batch) -> list:
        """Buffer one iteration; dispatch ``group_size`` steps in one
        in-graph scan when the buffer fills.  Returns the completed
        steps' result dicts (empty while buffering)."""
        self._group_buf.append(batch)
        if len(self._group_buf) < self.group_size:
            return []
        return self.flush_group()

    def flush_group(self) -> list:
        """Dispatch whatever is buffered (scan if a full group, else
        single-step calls — e.g. the end-of-epoch remainder)."""
        items, self._group_buf = self._group_buf, []
        if not items:
            return []
        if len(items) < self.group_size or self._train_loop is None:
            return [self.train_batch(b) for b in items]
        keys = ("clip", "flip", "label") + (
            ("mask",) if "mask" in items[0] else ())
        stacked = {
            k: (jnp.asarray(np.stack([b[k] for b in items]))
                if isinstance(items[0][k], np.ndarray)
                else jnp.stack([b[k] for b in items]))
            for k in keys}
        self.rng, grp_rng = jax.random.split(self.rng)
        self.params, self.momentum, self.bn_state, out = self._train_loop(
            self.params, self.momentum, self.bn_state, stacked,
            jnp.float32(self.lr_ctrl.lr), grp_rng,
            out_size=self.recipe.crop_size)
        self.step_count += len(items)
        return [{"loss": out.loss[i]} for i in range(len(items))]

    # -- evaluation ---------------------------------------------------------
    def _eval_logits(self, flat) -> np.ndarray:
        """Run the sharded eval step on row-flattened uint8 clips and
        return this host's rows.  Multi-process: the host-local rows are
        assembled into one globally-sharded array
        (parallel/multihost.py), and each host reads back exactly the
        logits of its own inputs."""
        from x3d_multigrid_tpu.parallel.mesh import pad_to_multiple
        agg = aggregate_all_subbn(self.bn_state)
        if jax.process_count() > 1:
            from x3d_multigrid_tpu.parallel import (
                global_batch_from_local, local_rows)
            # ragged final chunks: global rows must stay divisible by the
            # mesh size, so pad the (host-equal) local share to a multiple
            # of the local device count
            flat, n_real = pad_to_multiple(flat, jax.local_device_count())
            feed = global_batch_from_local(
                self.mesh, {"clip": flat})["clip"]
            logits = self.eval_step(self.params, agg, feed,
                                    out_size=self.recipe.crop_size)
            return local_rows(logits)[:n_real]
        flat, n_real = pad_to_multiple(flat, self.mesh.devices.size)
        logits = self.eval_step(self.params, agg, jnp.asarray(flat),
                                out_size=self.recipe.crop_size)
        return np.asarray(logits[:n_real])

    @staticmethod
    def _gather_rows(*arrays):
        """Concatenate per-host eval rows across processes so the APMeter
        sees the global score set (identity when single-process).

        This is a COLLECTIVE: every host must call it once per batch with
        identically-shaped arrays (the loaders pad ragged chunks to equal
        per-host shares — gather the full padded rows plus the ``valid``
        mask and filter AFTER, never before)."""
        if jax.process_count() == 1:
            return arrays
        from jax.experimental import multihost_utils
        out = []
        for a in arrays:
            g = multihost_utils.process_allgather(np.asarray(a))
            out.append(g.reshape((-1,) + g.shape[2:]))
        return tuple(out)

    def eval_class_epoch(self, loader) -> dict:
        """10-view max-reduced mAP + val loss
        (train_x3d_charades.py:158-174,208-213).  Loader batches may carry
        a ``valid`` mask (zero-padded rows from multi-host sharding or
        ragged final chunks) — masked rows are excluded from both loss
        and AP."""
        from x3d_multigrid_tpu.parallel.train_step import bce_with_logits
        from x3d_multigrid_tpu.parallel import all_hosts_sum
        apm = APMeter()
        loss_sum, loss_n = 0.0, 0
        for batch in loader:
            clips = batch["clip"]  # (B, n, T, R, R, 3) uint8
            b, n = clips.shape[:2]
            flat = clips.reshape((b * n,) + clips.shape[2:])
            logits = self._eval_logits(flat)
            probs, max_logits = multiview_max_probs(logits, n)
            valid = np.asarray(batch.get("valid", np.ones(b, bool)))
            labels = np.asarray(batch["label"])
            if valid.any():
                loss_sum += float(bce_with_logits(
                    jnp.asarray(np.asarray(max_logits)[valid]),
                    jnp.asarray(labels[valid]))) * int(valid.sum())
                loss_n += int(valid.sum())
            # collective: full padded rows + mask, filter after gathering
            p, l, v = self._gather_rows(np.asarray(probs), labels, valid)
            v = v.astype(bool)
            if v.any():
                apm.add(p[v], l[v])
        loss_sum, loss_n = all_hosts_sum(loss_sum, loss_n)
        val_loss = loss_sum / max(loss_n, 1)
        m = apm.mean()
        lr = self.lr_ctrl.step(val_loss)
        self.last_val = {"map": m, "loss": val_loss}
        self.logger.log("val", epoch=self.epochs, map=m, loss=val_loss,
                        lr=lr)
        return self.last_val

    def eval_loc_epoch(self, loader) -> dict:
        """Per-frame masked AP on interpolated logits
        (train_x3d_charades_loc.py:168-186)."""
        from x3d_multigrid_tpu.parallel.train_step import _charades_loc_loss
        from x3d_multigrid_tpu.parallel import all_hosts_sum
        apm = APMeter()
        loss_sum, loss_n = 0.0, 0
        for batch in loader:
            clips = batch["clip"]  # (B, T, R, R, 3) uint8, padded
            b = clips.shape[0]
            valid = np.asarray(batch.get("valid", np.ones(b, bool)))
            logits = self._eval_logits(clips)
            labels = batch["label"]     # (B, TL, C)
            mask = batch["mask"]        # (B, TL)
            if valid.any():
                loss, _ = _charades_loc_loss(
                    jnp.asarray(logits[valid]),
                    {"label": jnp.asarray(labels[valid]),
                     "mask": jnp.asarray(mask[valid])})
                loss_sum += float(loss) * int(valid.sum())
                loss_n += int(valid.sum())
            up = np.asarray(linear_interp_time(jnp.asarray(logits),
                                               labels.shape[1]))
            probs = 1.0 / (1.0 + np.exp(-up)) * mask[..., None]
            # collective: full padded rows + mask, filter after gathering
            probs, labels, mask, gvalid = self._gather_rows(
                probs, labels, mask, valid)
            for i in np.flatnonzero(gvalid):
                t_valid = int(mask[i].sum())
                apm.add(probs[i, :t_valid], labels[i, :t_valid])
        loss_sum, loss_n = all_hosts_sum(loss_sum, loss_n)
        val_loss = loss_sum / max(loss_n, 1)
        m = apm.mean()
        lr = self.lr_ctrl.step(val_loss)
        self.last_val = {"map": m, "loss": val_loss}
        self.logger.log("val", epoch=self.epochs, map=m, loss=val_loss,
                        lr=lr)
        return self.last_val

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
        self.step_count = int(meta.get("step", 0))
        self.epochs = int(meta.get("epochs", 0))
        st = {k[3:]: v for k, v in meta.items() if k.startswith("lr_")}
        if "lr" in st:
            self.lr_ctrl.load_state_dict({
                "lr": st["lr"], "best": st.get("best"),
                "num_bad": st.get("num_bad", 0)})
        self.logger.log("restore", path=path, step=self.step_count)

    def _ckpt_meta(self) -> dict:
        return {"step": self.step_count, "epochs": self.epochs,
                **{f"lr_{k}": v for k, v in
                   self.lr_ctrl.state_dict().items() if v is not None}}

    def save(self, path: Optional[str] = None):
        if self.recipe.ckpt_backend == "orbax":
            # async production backend, same layout as the Kinetics recipe
            # (train/orbax_ckpt.py): retention + atomic commit off-thread
            if getattr(self, "_orbax", None) is None:
                from x3d_multigrid_tpu.train.orbax_ckpt import (
                    OrbaxCheckpointer)
                self._orbax = OrbaxCheckpointer(
                    os.path.join(self.recipe.out_dir,
                                 f"orbax_{self.recipe.task}"))
            self._orbax.save(self.step_count, params=self.params,
                             bn_state=self.bn_state,
                             momentum=self.momentum, meta=self._ckpt_meta())
            path = os.path.join(self.recipe.out_dir,
                                f"orbax_{self.recipe.task}")
        else:
            path = path or os.path.join(
                self.recipe.out_dir,
                f"ckpt_{self.recipe.task}_{self.step_count:06d}")
            # npz is single-writer: only process 0 writes on pods
            if jax.process_index() == 0:
                save_checkpoint(path, params=self.params,
                                bn_state=self.bn_state,
                                momentum=self.momentum,
                                meta=self._ckpt_meta())
        self.logger.log("checkpoint", path=path, step=self.step_count)
        return path


def run_synthetic(recipe: CharadesRecipe, *, iterations: int = 4,
                  logger: Optional[MetricLogger] = None,
                  group_size: int = 1):
    """Dataset-free smoke run for either task."""
    rng = np.random.RandomState(0)
    trainer = CharadesTrainer(recipe, logger=logger,
                              group_size=group_size)
    b, t, c0 = recipe.batch_size, recipe.model_frames, recipe.crop_size
    for i in range(iterations):
        batch = {
            "clip": rng.randint(0, 255, (b, t, c0, c0, 3), np.uint8),
            "flip": rng.rand(b) < 0.5,
        }
        if recipe.task == "loc":
            tl = 2 * recipe.frames
            batch["label"] = (rng.rand(b, tl, recipe.n_classes) > 0.95
                              ).astype(np.float32)
            batch["mask"] = np.ones((b, tl), np.float32)
        else:
            batch["label"] = (rng.rand(b, recipe.n_classes) > 0.9
                              ).astype(np.float32)
        outs = (trainer.train_batch_grouped(batch) if group_size > 1
                else [trainer.train_batch(batch)])
        for out in outs:
            trainer.logger.log("train", step=trainer.step_count,
                               loss=float(out["loss"]))
    if group_size > 1:
        for out in trainer.flush_group():
            trainer.logger.log("train", step=trainer.step_count,
                               loss=float(out["loss"]))
    return trainer


def run(recipe: CharadesRecipe, *, root: str, anno: str,
        pretrained: Optional[str] = None, resume: Optional[str] = None,
        group_size: int = 1):
    """Full fine-tune loop (train_x3d_charades*.py run())."""
    from x3d_multigrid_tpu.data.charades_loader import (
        CharadesTrainLoader, CharadesEvalLoader,
    )
    from x3d_multigrid_tpu.data.charades import scan_charades
    from x3d_multigrid_tpu.data.reader import default_reader
    from x3d_multigrid_tpu.data.spatial import train_scales

    logger = MetricLogger(os.path.join(recipe.out_dir,
                                       f"{recipe.task}_log.jsonl"))
    trainer = CharadesTrainer(recipe, pretrained=pretrained, logger=logger,
                              group_size=group_size)
    if resume:
        trainer.restore(resume)

    reader = default_reader()
    scales = train_scales(recipe.crop_size, RESIZE_SIZE[recipe.version])
    min_frames = 2 * recipe.frames + 2  # charades.py:88 with doubling
    train_videos = scan_charades(anno, "training", root,
                                 min_frames=min_frames)
    test_videos = scan_charades(anno, "testing", root,
                                min_frames=min_frames)
    # each host decodes only its process_index slice (parallel/multihost.py)
    pidx, pcount = jax.process_index(), jax.process_count()
    loader = CharadesTrainLoader(
        train_videos, root, reader=reader, task=recipe.task,
        batch_size=recipe.batch_size, frames=2 * recipe.frames,
        gamma_tau=2 * recipe.gamma_tau, short_side=recipe.short_side,
        crop_size=recipe.crop_size, scales=scales,
        process_index=pidx, process_count=pcount,
        num_classes=recipe.n_classes)
    val_loader = CharadesEvalLoader(
        test_videos, root, reader=reader, task=recipe.task,
        batch_size=max(recipe.batch_size // 2, pcount),
        frames=2 * recipe.frames, gamma_tau=2 * recipe.gamma_tau,
        short_side=recipe.short_side, crops=recipe.val_crops,
        process_index=pidx, process_count=pcount,
        num_classes=recipe.n_classes)

    ipe = max(len(train_videos) // recipe.batch_size, 1)
    # interval-based cadences: grouped dispatch advances step_count by
    # group_size, so exact-modulo checks could skip their firing step.
    # Anchors persist across epochs — the interval is in steps, and an
    # epoch can be shorter than it.
    last_ckpt = trainer.step_count
    while trainer.epochs < recipe.max_epochs:
        for phase in recipe.train_epochs_per_val * ["train"] + ["val"]:
            if phase == "train":
                trainer.epochs += 1
                pending = []
                last_log = trainer.step_count
                for batch in loader.epoch():
                    if trainer.group_size > 1:
                        outs = trainer.train_batch_grouped(batch)
                    else:
                        outs = [trainer.train_batch(batch)]
                    pending.extend(o["loss"] for o in outs)
                    if not outs:
                        continue
                    if trainer.step_count - last_log >= max(ipe // 2, 1):
                        logger.log("train", epoch=trainer.epochs,
                                   step=trainer.step_count,
                                   loss=float(jnp.mean(jnp.stack(pending))))
                        pending = []
                        last_log = trainer.step_count
                    if trainer.step_count - last_ckpt >= \
                            recipe.ckpt_every_steps:
                        trainer.save()
                        last_ckpt = trainer.step_count
                if trainer.group_size > 1:
                    pending.extend(o["loss"]
                                   for o in trainer.flush_group())
                if pending:  # tail of the epoch's logging interval
                    logger.log("train", epoch=trainer.epochs,
                               step=trainer.step_count,
                               loss=float(jnp.mean(jnp.stack(pending))))
            else:
                if recipe.task == "loc":
                    trainer.eval_loc_epoch(val_loader)
                else:
                    trainer.eval_class_epoch(val_loader)
    return trainer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", help="JSON file of CharadesRecipe fields "
                    "(defaults < config < explicit flags)")
    ap.add_argument("--dump-config", metavar="PATH",
                    help="write the resolved recipe as JSON ('-' = stdout) "
                         "and exit")
    ap.add_argument("--task", default=None, choices=["class", "loc"])
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--iterations", type=int, default=4)
    ap.add_argument("--root")
    ap.add_argument("--anno")
    ap.add_argument("--pretrained")
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--out-dir", default=None)
    ap.add_argument("--dtype", default=None, choices=["bf16", "fp32"])
    ap.add_argument("--ckpt-backend", default=None,
                    choices=["npz", "orbax"])
    ap.add_argument("--resume",
                    help=".npz checkpoint or orbax directory")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--group-size", type=int, default=1,
                    help="scan this many iterations per dispatch "
                         "(amortizes host dispatch latency; single-"
                         "process only)")
    args = ap.parse_args()

    from x3d_multigrid_tpu.utils.config import make_recipe, save_recipe

    kw = dict(task=args.task, out_dir=args.out_dir,
              compute_dtype=args.dtype, ckpt_backend=args.ckpt_backend,
              batch_size=args.batch_size)
    # --tiny is a PRESET: below-config precedence (defaults < tiny <
    # config < explicit flags), matching the Kinetics CLI
    tiny_defaults = None
    if args.tiny:
        tiny_defaults = dict(
            frames=16, gamma_tau=2, crop_size_override=32, short_side=40,
            batch_size=4,
            model_overrides=dict(
                blocks_override=(1, 1, 1, 1),
                inplanes_override=((12, 8), (16, 8), (24, 16), (32, 16)),
                fc1_dim=32))
    recipe = make_recipe(CharadesRecipe, args.config,
                         defaults=tiny_defaults, **kw)
    if args.dump_config:
        save_recipe(recipe, args.dump_config)
        return

    if args.synthetic:
        run_synthetic(recipe, iterations=args.iterations,
                      group_size=max(args.group_size, 1))
    else:
        if not (args.root and args.anno):
            ap.error("need --root and --anno (or --synthetic)")
        run(recipe, root=args.root, anno=args.anno,
            pretrained=args.pretrained, resume=args.resume,
            group_size=max(args.group_size, 1))


if __name__ == "__main__":
    main()
