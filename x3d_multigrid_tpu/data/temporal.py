"""Host-side temporal sampling: frame-index math only (no pixels).

Replicates the reference's temporal transforms (temporal_transforms.py) and
multi-view eval windowing (kinetics.py:218-233) as pure functions of
``(n_frames, rng)`` so they are unit-testable against the golden semantics
and independent of the storage backend.
"""

from typing import List, Optional

import numpy as np


def loop_pad(indices: List[int], size: int) -> List[int]:
    """Loop indices until ``size`` (temporal_transforms.py:5-18)."""
    out = list(indices)
    for i in out:
        if len(out) >= size:
            break
        out.append(i)
    return out


def temporal_random_crop(frame_indices: List[int], size: int,
                         gamma_tau: int, t_stride: int,
                         trunc: Optional[int],
                         rng: np.random.RandomState) -> List[int]:
    """TemporalRandomCrop (temporal_transforms.py:80-117).

    Picks a random window of ``size`` raw frames, subsamples at
    ``t_stride * gamma_tau``, truncates/loop-pads to ``trunc // gamma_tau``
    model frames.  ``trunc`` defaults to ``size`` (the multigrid path passes
    the long-cycle ``sample_duration`` as trunc).
    """
    trunc = size if trunc is None else trunc
    rand_end = max(0, len(frame_indices) - size - 1)
    begin = int(rng.randint(0, rand_end + 1))
    end = min(begin + size, len(frame_indices))
    out = list(frame_indices[begin:end:t_stride * gamma_tau])
    out = out[: trunc // gamma_tau]
    return loop_pad(out, trunc // gamma_tau)


def sample_t_stride(sample_duration: int, cycle_duration: int,
                    rng: np.random.RandomState) -> int:
    """Multigrid's compensating random temporal stride
    (kinetics_multigrid.py:245): uniform in [1, T_full / T_cycle]."""
    hi = max(1, sample_duration // cycle_duration)
    return int(rng.randint(1, hi + 1))


def eval_temporal_views(n_frames: int, gamma_tau: int, frames: int,
                        crops: int) -> List[List[int]]:
    """Multi-view sparse-clip eval windows (kinetics.py:218-233).

    Subsample every ``gamma_tau``-th frame index, then slide ``crops``
    windows of ``frames`` model frames evenly across the clip.  Frame
    indices are 1-based like the reference's on-disk naming.
    """
    sub = list(range(1, n_frames + 1))[::gamma_tau]
    step = int((len(sub) - 1 - frames) // (crops - 1)) if crops > 1 else 0
    views = []
    if step <= 0:
        base = sub[:frames]
        base = loop_pad(base, frames)
        return [list(base) for _ in range(crops)]
    for start in range(0, step * crops, step):
        view = sub[start:start + frames]
        view = loop_pad(view, frames)
        views.append(view)
    return views
