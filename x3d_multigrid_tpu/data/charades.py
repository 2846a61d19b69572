"""Charades dataset: JSON annotations -> per-frame multi-label targets.

Semantics preserved from the reference (charades.py:68-164):
- frames live at ``<root>/<vid>/<vid>-%06d.jpg`` (1-based);
- videos with < 162 frames are dropped;
- the per-frame binary label matrix (157, n_frames) marks class c active at
  frame f when ``f/fps in (start, end)`` (exclusive bounds) at
  ``fps = n_frames / duration``;
- the effective clip length and temporal stride are the constructor args
  *doubled* (charades.py:114-115): frames=80, gamma_tau=5 -> 160 raw frames
  at stride 10 = 16 model frames;
- training picks a random start in [1, nf - frames - 1]; testing reads the
  whole video;
- task='class' collapses labels over time by max; task='loc' keeps the
  (T_label, C) per-frame matrix (we use time-major layout).

Unlike the reference we compute label matrices on demand instead of caching
a dense (157, n_frames) array per video to disk.
"""

import dataclasses
import json
import os
from typing import Dict, List, Tuple

import numpy as np

NUM_CLASSES = 157


@dataclasses.dataclass
class CharadesVideo:
    vid: str
    duration: float
    actions: List[Tuple[int, float, float]]  # (class, start_s, end_s)
    n_frames: int


def scan_charades(split_file: str, split: str, root: str,
                  min_frames: int = 2 * 80 + 2) -> List[CharadesVideo]:
    """Index videos of ``split`` ('training' | 'testing') present under
    ``root`` with >= min_frames frames (charades.py:80-99)."""
    with open(split_file) as f:
        data = json.load(f)
    out: List[CharadesVideo] = []
    for vid, meta in data.items():
        if meta["subset"] != split:
            continue
        vdir = os.path.join(root, vid)
        if not os.path.exists(vdir):
            continue
        n_frames = len(os.listdir(vdir))
        if n_frames < min_frames:
            continue
        actions = [(int(a[0]), float(a[1]), float(a[2]))
                   for a in meta["actions"]]
        out.append(CharadesVideo(vid=vid, duration=float(meta["duration"]),
                                 actions=actions, n_frames=n_frames))
    return out


def label_matrix(video: CharadesVideo,
                 num_classes: int = NUM_CLASSES) -> np.ndarray:
    """(n_frames, num_classes) binary per-frame labels (charades.py:91-97;
    note our time-major layout)."""
    lab = np.zeros((video.n_frames, num_classes), np.float32)
    fps = video.n_frames / video.duration
    t = np.arange(video.n_frames) / fps
    for cls, start, end in video.actions:
        lab[(t > start) & (t < end), cls] = 1.0
    return lab


def frame_path(root: str, vid: str, index: int) -> str:
    """1-based on-disk naming <root>/<vid>/<vid>-%06d.jpg (charades.py:47)."""
    return os.path.join(root, vid, f"{vid}-{str(index).zfill(6)}.jpg")


def train_window(video: CharadesVideo, frames: int, gamma_tau: int,
                 rng: np.random.RandomState,
                 num_classes: int = NUM_CLASSES
                 ) -> Tuple[List[int], np.ndarray]:
    """Random training window: ``frames`` raw frames at stride ``gamma_tau``
    from a random start; labels cover the *unsubsampled* window
    (charades.py:130-140).  Args are the already-doubled values."""
    start = int(rng.randint(1, video.n_frames - frames))  # randint(1, nf-(f+1))
    indices = list(range(start, start + frames, gamma_tau))
    lab = label_matrix(video, num_classes)[start - 1:start - 1 + frames]
    return indices, lab


def test_window(video: CharadesVideo, gamma_tau: int,
                num_classes: int = NUM_CLASSES
                ) -> Tuple[List[int], np.ndarray]:
    """Testing reads the whole video at stride gamma_tau; labels for every
    frame (charades.py:132-140)."""
    indices = list(range(1, 1 + video.n_frames, gamma_tau))
    return indices, label_matrix(video, num_classes)


def test_class_views(t_model: int, frames: int, gamma_tau: int,
                     crops: int) -> List[Tuple[int, int]]:
    """Sliding temporal windows over a length-``t_model`` clip for the
    classification test path (charades.py:150-157).  Returns (start, len)
    pairs in model-frame coordinates; len = frames // gamma_tau."""
    span = frames // gamma_tau
    step = int((t_model - 1 - span) // (crops - 1)) if crops > 1 else 0
    if step == 0:
        return [(0, span)] * crops
    return [(i, span) for i in range(0, step * crops, step)]


def pad_collate(clips: List[np.ndarray], labels: List[np.ndarray]
                ) -> Dict[str, np.ndarray]:
    """Zero-pad variable-length clips/labels to batch maxima and emit a
    validity mask (charades.py:167-189).  Clips are (T, H, W, C) time-major;
    labels (T_label, C)."""
    max_t = max(c.shape[0] for c in clips)
    max_tl = max(l.shape[0] for l in labels)
    b = len(clips)
    out_clips = np.zeros((b, max_t) + clips[0].shape[1:], clips[0].dtype)
    out_labels = np.zeros((b, max_tl, labels[0].shape[1]), np.float32)
    mask = np.zeros((b, max_tl), np.float32)
    for i, (c, l) in enumerate(zip(clips, labels)):
        out_clips[i, :c.shape[0]] = c
        out_labels[i, :l.shape[0]] = l
        mask[i, :l.shape[0]] = 1.0
    return {"clip": out_clips, "label": out_labels, "mask": mask}
