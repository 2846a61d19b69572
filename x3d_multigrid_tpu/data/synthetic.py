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


def make_fake_charades(root: str, *, n_videos: int = 3, n_frames: int = 170,
                       frame_size=(64, 48), seed: int = 0):
    """Miniature Charades layout: <root>/<vid>/<vid>-%06d.jpg + split JSON."""
    from PIL import Image
    rng = np.random.RandomState(seed)
    data = {}
    os.makedirs(root, exist_ok=True)
    for v in range(n_videos):
        vid = f"CHAR{v:03d}"
        vdir = os.path.join(root, vid)
        os.makedirs(vdir, exist_ok=True)
        for f in range(1, n_frames + 1):
            arr = rng.randint(0, 255, frame_size[::-1] + (3,), np.uint8)
            Image.fromarray(arr).save(
                os.path.join(vdir, f"{vid}-{str(f).zfill(6)}.jpg"),
                quality=90)
        duration = n_frames / 24.0
        data[vid] = {
            "subset": "training" if v % 3 != 2 else "testing",
            "duration": duration,
            "actions": [[v % 157, 0.5, duration * 0.4],
                        [(v + 50) % 157, duration * 0.5, duration * 0.9]],
        }
    split_path = os.path.join(root, "charades_split.json")
    with open(split_path, "w") as f:
        json.dump(data, f)
    return root, split_path


def synthetic_train_batch(batch_size: int, frames: int, crop: int,
                          n_classes: int = 400, seed: int = 0):
    """Random uint8 batch in the loader's output format."""
    rng = np.random.RandomState(seed)
    return {
        "clip": rng.randint(0, 255, (batch_size, frames, crop, crop, 3),
                            np.uint8),
        "flip": rng.rand(batch_size) < 0.5,
        "label": rng.randint(0, n_classes, (batch_size,)).astype(np.int32),
    }
