"""Shared fixture for the real multi-process eval test: deterministic
tiny trainers and the per-host batch shards of one fixed "global" eval
epoch, importable both by the pytest process (single-host reference) and
by the spawned jax.distributed workers (tests/mp_worker_evals.py).

The batch layouts replicate what KineticsEvalLoader/CharadesEvalLoader
emit on a pod (data/loader.py: equal per-host shares, zero-padded ragged
final chunks with ``valid`` masks) — including a final chunk where one
host's entire share is padding, which is exactly the case whose eval
collectives must stay host-symmetric.
"""

import numpy as np

TINY_MODEL = dict(
    blocks_override=(1, 1, 1, 1),
    inplanes_override=((6, 4), (12, 8), (12, 8), (16, 8)),
    fc1_dim=16)

N_KIN, KIN_CHUNK, N_CLASSES = 9, 8, 5
N_CHA, CHA_CHUNK, CHA_CLASSES = 5, 4, 13


def kinetics_trainer():
    from x3d_multigrid_tpu.train.recipes.kinetics_multigrid import (
        KineticsRecipe, MultigridTrainer)
    recipe = KineticsRecipe(
        batch_size=16, max_epochs=1, dataset_size=64, frames=8,
        crop_size_override=32, gamma_tau_override=2, short_side=40,
        base_bs_per_replica=4, const_bn_size=2, n_classes=N_CLASSES,
        compute_dtype=None, num_devices=8, warmup_steps=0,
        model_overrides=TINY_MODEL)
    return MultigridTrainer(recipe)


def charades_trainer():
    from x3d_multigrid_tpu.train.recipes.charades import (
        CharadesRecipe, CharadesTrainer)
    recipe = CharadesRecipe(
        task="class", batch_size=8, frames=16, gamma_tau=2,
        crop_size_override=32, short_side=40, n_classes=CHA_CLASSES,
        model_overrides=TINY_MODEL, compute_dtype=None, num_devices=8)
    return CharadesTrainer(recipe)


def _kin_global():
    rng = np.random.RandomState(7)
    clips = rng.randint(0, 255, (N_KIN, 3, 4, 40, 40, 3), np.uint8)
    labels = rng.randint(0, N_CLASSES, (N_KIN,)).astype(np.int32)
    return clips, labels


def _cha_global():
    rng = np.random.RandomState(8)
    clips = rng.randint(0, 255, (N_CHA, 2, 8, 40, 40, 3), np.uint8)
    labels = (rng.rand(N_CHA, CHA_CLASSES) > 0.8).astype(np.float32)
    return clips, labels


def _host_chunks(clips, labels, chunk, pi, pc):
    """Per-host shares of each global chunk, padded equal (the loaders'
    contract: per = ceil(len/pc), zero rows with valid=False)."""
    out = []
    for start in range(0, clips.shape[0], chunk):
        c = clips[start:start + chunk]
        l = labels[start:start + chunk]
        per = -(-c.shape[0] // pc)
        lo = min(pi * per, c.shape[0])
        hi = min(lo + per, c.shape[0])
        n = hi - lo
        pad = per - n
        batch_c = np.concatenate(
            [c[lo:hi], np.zeros((pad,) + c.shape[1:], c.dtype)])
        batch_l = np.concatenate(
            [l[lo:hi], np.zeros((pad,) + l.shape[1:], l.dtype)])
        out.append({"clip": batch_c, "label": batch_l,
                    "valid": np.asarray([True] * n + [False] * pad)})
    return out


def kinetics_batches(pi, pc):
    clips, labels = _kin_global()
    return _host_chunks(clips, labels, KIN_CHUNK, pi, pc)


def charades_batches(pi, pc):
    clips, labels = _cha_global()
    return _host_chunks(clips, labels, CHA_CHUNK, pi, pc)


def run_train_steps(n_steps: int = 4):
    """Drive real train steps through the trainer's multi-host staging
    path (host_shard slices -> global_batch_from_local -> shard_map psum)
    and fingerprint the result.  Identical across 1-process and 2-process
    runs: same global batches, same mesh, same SPMD program."""
    import jax
    from x3d_multigrid_tpu.parallel import host_shard
    trainer = kinetics_trainer()
    rng = np.random.RandomState(11)
    pi, pc = jax.process_index(), jax.process_count()
    losses = []
    for plan in trainer.schedule.epoch(n_steps):
        b, t, s = plan.batch_size, plan.frames, plan.crop
        clip = rng.randint(0, 255, (b, t, s, s, 3)).astype(np.uint8)
        flip = rng.rand(b) < 0.5
        label = rng.randint(0, N_CLASSES, (b,)).astype(np.int32)
        sl = host_shard(b, pi, pc)
        out = trainer.train_batch({"clip": clip[sl], "flip": flip[sl],
                                   "label": label[sl], "plan": plan})
        losses.append(float(out["loss"]))
    checksum = float(sum(np.abs(np.asarray(l)).sum()
                         for l in jax.tree.leaves(trainer.params)))
    return {"train_losses": losses, "param_checksum": checksum}
