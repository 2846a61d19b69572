"""Synthetic fixtures: fake frame-folder datasets (for tests) and random
batch generators (for benches/smoke runs without Kinetics/Charades data)."""

import json
import os

import numpy as np


def make_fake_kinetics(root: str, *, n_classes: int = 4,
                       videos_per_class: int = 2, n_frames: int = 90,
                       frame_size=(64, 48), seed: int = 0,
                       val_videos_per_class: int = 0,
                       test_videos: int = 0,
                       class_coded: bool = False):
    """Write a miniature Kinetics-layout dataset: frame JPEGs, annotation
    JSON and labels.txt.  Returns (root, anno_path, labels_path).

    ``class_coded=True`` paints each video a class-determined mean color
    (plus noise), making the dataset trivially learnable — used by the
    end-to-end convergence test.  ``val_videos_per_class`` adds a
    'validate' subset in the reference's ``<label>/<video>`` layout.
    """
    from PIL import Image
    rng = np.random.RandomState(seed)
    labels = [f"class_{i}" for i in range(n_classes)]
    anno = {}
    os.makedirs(root, exist_ok=True)

    def write_video(vdir, ci):
        os.makedirs(vdir, exist_ok=True)
        base = np.zeros(3)
        if class_coded:
            base = np.array([(ci * 97) % 256, (ci * 53 + 80) % 256,
                             (ci * 31 + 160) % 256], float)
        for f in range(1, n_frames + 1):
            noise = rng.randint(0, 60, frame_size[::-1] + (3,))
            arr = np.clip(base[None, None] * (0.8 if class_coded else 0)
                          + noise, 0, 255).astype(np.uint8)
            Image.fromarray(arr).save(
                os.path.join(vdir, f"frame_{f:05d}.jpg"), quality=90)

    for ci, label in enumerate(labels):
        for v in range(videos_per_class):
            vid = f"vid{ci}_{v}"
            name = f"{vid}_{str(0).zfill(6)}_{str(10).zfill(6)}"
            write_video(os.path.join(root, label, name), ci)
            anno[vid] = {
                "subset": "train",
                "annotations": {"segment": [0, 10], "label": label},
            }
        for v in range(val_videos_per_class):
            vid = f"val{ci}_{v}"
            write_video(os.path.join(root, label, vid), ci)
            anno[vid] = {
                "subset": "validate",
                "annotations": {"segment": [0, 10], "label": label},
            }
    # unlabeled test split: test/<vid> dirs, subset 'testing' annotations
    # without a label (reference scan kinetics.py:110-118)
    for v in range(test_videos):
        vid = f"test{v}"
        write_video(os.path.join(root, "test", vid), v % n_classes)
        anno[vid] = {"subset": "testing", "annotations": {}}
    anno_path = os.path.join(root, "anno.json")
    labels_path = os.path.join(root, "labels.txt")
    with open(anno_path, "w") as f:
        json.dump(anno, f)
    with open(labels_path, "w") as f:
        f.write("\n".join(labels))
    return root, anno_path, labels_path


# Maximally-separated colors (RGB-cube corners, pulled slightly inside so
# additive noise never clips a whole channel): classes must stay
# discriminable through JPEG encoding, short-side resize and random crops
# for the e2e learning floors to be about TRAINING, not the fixture.
_PALETTE = np.array(
    [(230, 40, 40), (40, 230, 40), (40, 40, 230), (230, 230, 40),
     (230, 40, 230), (40, 230, 230), (245, 245, 245), (15, 15, 15)],
    np.float32)


def _class_color(ci) -> np.ndarray:
    """Label-determined mean color (Charades class-coded fixture)."""
    ci = np.asarray(ci)
    hashed = np.stack([(ci * 97) % 256, (ci * 53 + 80) % 256,
                       (ci * 31 + 160) % 256], -1).astype(np.float32)
    return np.where((ci < len(_PALETTE))[..., None],
                    _PALETTE[np.minimum(ci, len(_PALETTE) - 1)], hashed)


def make_fake_charades(root: str, *, n_videos: int = 3, n_frames: int = 170,
                       frame_size=(64, 48), seed: int = 0,
                       class_coded: bool = False, n_classes: int = 157):
    """Miniature Charades layout: <root>/<vid>/<vid>-%06d.jpg + split JSON.

    ``class_coded=True`` gives video ``v`` two half-duration actions
    (``v % n_classes`` then ``(v + 3) % n_classes``) and paints each frame
    the active action's mean color (plus noise) — per-frame appearance
    matches the per-frame label matrix exactly (charades.py:91-97 label
    semantics), so both the video-level multi-label task and the
    per-frame localization task are trivially learnable.  Used by the
    end-to-end convergence floors."""
    from PIL import Image
    rng = np.random.RandomState(seed)
    data = {}
    os.makedirs(root, exist_ok=True)
    for v in range(n_videos):
        vid = f"CHAR{v:03d}"
        vdir = os.path.join(root, vid)
        os.makedirs(vdir, exist_ok=True)
        duration = n_frames / 24.0
        if class_coded:
            actions = [[v % n_classes, 0.0, duration * 0.5],
                       [(v + 3) % n_classes, duration * 0.5, duration]]
        else:
            actions = [[v % n_classes, 0.5, duration * 0.4],
                       [(v + 50) % n_classes, duration * 0.5,
                        duration * 0.9]]
        fps = n_frames / duration
        for f in range(1, n_frames + 1):
            noise = rng.randint(0, 60, frame_size[::-1] + (3,))
            if class_coded:
                # frame f (1-based) <-> label row f-1: t = (f-1)/fps with
                # the exclusive (start, end) bounds of label_matrix
                t = (f - 1) / fps
                active = [c for c, s, e in actions if s < t < e]
                base = (np.mean([_class_color(c) for c in active], axis=0)
                        if active else np.full(3, 128.0))
                arr = np.clip(base[None, None] * 0.8 + noise,
                              0, 255).astype(np.uint8)
            else:
                arr = rng.randint(0, 255, frame_size[::-1] + (3,),
                                  np.uint8)
            Image.fromarray(arr).save(
                os.path.join(vdir, f"{vid}-{str(f).zfill(6)}.jpg"),
                quality=90)
        data[vid] = {
            "subset": "training" if v % 3 != 2 else "testing",
            "duration": duration,
            "actions": actions,
        }
    split_path = os.path.join(root, "charades_split.json")
    with open(split_path, "w") as f:
        json.dump(data, f)
    return root, split_path


def synthetic_train_batch(batch_size: int, frames: int, crop: int,
                          n_classes: int = 400, seed: int = 0,
                          class_coded: bool = False,
                          signal_scale: float = 0.8, noise_hi: int = 60):
    """Random uint8 batch in the loader's output format.

    ``class_coded=True`` paints each clip a label-determined mean color
    plus noise (same scheme as make_fake_kinetics) so synthetic training
    runs have a learnable signal and the loss trajectory in the
    training-record artifact actually descends.  ``signal_scale`` /
    ``noise_hi`` set the signal-to-noise ratio: the defaults make the task
    near-trivially learnable (convergence tests); harder settings (e.g.
    0.35/200) keep accuracy strictly inside (chance, 1.0) so a metric has
    resolution in both directions (the multichip dryrun eval)."""
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, n_classes, (batch_size,)).astype(np.int32)
    if class_coded:
        base = np.stack([(labels * 97) % 256, (labels * 53 + 80) % 256,
                         (labels * 31 + 160) % 256], -1).astype(np.float32)
        noise = rng.randint(0, noise_hi, (batch_size, frames, crop, crop, 3))
        clip = np.clip(base[:, None, None, None] * signal_scale + noise,
                       0, 255).astype(np.uint8)
    else:
        clip = rng.randint(0, 255, (batch_size, frames, crop, crop, 3),
                           np.uint8)
    return {
        "clip": clip,
        "flip": rng.rand(batch_size) < 0.5,
        "label": labels,
    }


def synthetic_train_batch_device(key, batch_size: int, frames: int,
                                 crop: int, n_classes: int = 400,
                                 class_coded: bool = False):
    """On-device analog of :func:`synthetic_train_batch` (same color-coding
    scheme, ``jax.random`` instead of numpy).

    Exists for full-geometry training-record runs on remote-tunneled TPUs:
    host→device staging of a full multigrid batch through the relay is
    ~1 MB/s, so host-generated batches would spend hours in transfer.  The
    real staging path is exercised (and timed) by bench.py/--with-loader;
    here the record's subject is the optimization trajectory, so batches
    are generated on the chip and only the PRNG key crosses the wire."""
    import jax
    import jax.numpy as jnp
    return _device_batch(key, batch_size=batch_size, frames=frames,
                         crop=crop, n_classes=n_classes,
                         class_coded=class_coded)


def _device_batch_impl(key, *, batch_size, frames, crop, n_classes,
                       class_coded):
    import jax
    import jax.numpy as jnp
    kl, kf, kn = jax.random.split(key, 3)
    labels = jax.random.randint(kl, (batch_size,), 0, n_classes, jnp.int32)
    flip = jax.random.bernoulli(kf, 0.5, (batch_size,))
    shape = (batch_size, frames, crop, crop, 3)
    if class_coded:
        base = jnp.stack([(labels * 97) % 256, (labels * 53 + 80) % 256,
                          (labels * 31 + 160) % 256], -1).astype(jnp.float32)
        noise = jax.random.randint(kn, shape, 0, 60, jnp.int32)
        clip = jnp.clip(base[:, None, None, None] * 0.8 + noise,
                        0, 255).astype(jnp.uint8)
    else:
        clip = jax.random.randint(kn, shape, 0, 256, jnp.int32
                                  ).astype(jnp.uint8)
    return {"clip": clip, "flip": flip, "label": labels}


_DEVICE_BATCH_JIT = None


def _device_batch(key, **kw):
    global _DEVICE_BATCH_JIT
    if _DEVICE_BATCH_JIT is None:
        import jax
        _DEVICE_BATCH_JIT = jax.jit(
            _device_batch_impl,
            static_argnames=("batch_size", "frames", "crop", "n_classes",
                            "class_coded"))
    return _DEVICE_BATCH_JIT(key, **kw)
