"""Kinetics frame-folder dataset: annotation parsing + index scanning.

Directory layout and semantics preserved from the reference
(kinetics.py:98-158, kinetics_multigrid.py:101-162):
``<root>/<label>/<video>_<st>_<end>/frame_%05d.jpg`` (1-based frame files),
JSON annotations keyed by video id with ``subset`` and
``annotations.{segment,label}``, a labels.txt of class names, clips with
<= min_frames+1 frames dropped, and the scan memoized to a cache file in
the dataset root.
"""

import dataclasses
import json
import os
from typing import Dict, List, Tuple

import numpy as np


@dataclasses.dataclass
class VideoSample:
    video: str        # frame-folder path
    n_frames: int
    label: int        # -1 when unlabeled (test subset)
    video_id: str


def load_class_labels(path: str) -> Dict[str, int]:
    """labels.txt -> {class_name: index} (kinetics_multigrid.py:67-74)."""
    with open(path) as f:
        names = f.read().splitlines()
    return {name: i for i, name in enumerate(names)}


def _video_names(data: dict, subset: str) -> Tuple[List[str], List[dict]]:
    """Annotation -> relative folder names (kinetics_multigrid.py:77-98)."""
    names, annos = [], []
    for key, value in data.items():
        if value["subset"] != subset:
            continue
        if subset == "testing":
            names.append(f"test/{key}")
        elif subset == "train":
            st = int(value["annotations"]["segment"][0])
            end = int(value["annotations"]["segment"][1])
            label = value["annotations"]["label"].replace(" ", "_")
            names.append(
                f"{label}/{key}_{str(st).zfill(6)}_{str(end).zfill(6)}")
            annos.append(value["annotations"])
        else:
            label = value["annotations"]["label"].replace(" ", "_")
            names.append(f"{label}/{key}")
            annos.append(value["annotations"])
    return names, annos


def scan_kinetics(root: str, annotation_path: str, class_labels_path: str,
                  subset: str, min_frames: int = 80,
                  cache: bool = True) -> List[VideoSample]:
    """Build (or load) the clip index.  Clips need > min_frames+1 frames
    (kinetics_multigrid.py:128-129)."""
    cache_path = os.path.join(root, f"x3d_tpu_index_{subset}_{min_frames}.json")
    if cache and os.path.exists(cache_path):
        with open(cache_path) as f:
            return [VideoSample(**d) for d in json.load(f)]

    with open(annotation_path) as f:
        data = json.load(f)
    class_to_idx = load_class_labels(class_labels_path)
    names, annos = _video_names(data, subset)

    samples: List[VideoSample] = []
    for i, name in enumerate(names):
        path = os.path.join(root, name)
        if not os.path.exists(path):
            continue
        n_frames = len(os.listdir(path))
        if n_frames <= min_frames + 1:
            continue
        label = class_to_idx[annos[i]["label"]] if annos else -1
        samples.append(VideoSample(
            video=path, n_frames=n_frames, label=label,
            video_id=name.split("/")[1]))

    if cache:
        try:
            with open(cache_path, "w") as f:
                json.dump([dataclasses.asdict(s) for s in samples], f)
        except OSError:
            pass  # read-only dataset root: skip memoization
    return samples


def frame_path(video_dir: str, index: int) -> str:
    """1-based on-disk frame naming (kinetics_multigrid.py:49)."""
    return os.path.join(video_dir, f"frame_{index:05d}.jpg")
