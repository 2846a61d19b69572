"""Host-side spatial crop *parameter* sampling (pixels move on device).

Replicates MultiScaleRandomCropMultigrid's clip-consistent randomization
(spatial_transforms.py:472-501): per clip, one scale drawn from ``scales``,
one (tl_x, tl_y) in [0,1)^2, applied to every frame; plus the 0.5-probability
horizontal flip (spatial_transforms.py:331-349).  The crop is taken at
decode time in host coordinates; the resize-to-output and the flip run on
device (ops/preprocess.py).
"""

import dataclasses
from typing import Sequence, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class TrainCropParams:
    """Crop rectangle (in the decoded image's coordinates) + flip flag."""
    x1: int
    y1: int
    side: int
    flip: bool


def sample_train_crop_params(width: int, height: int,
                             scales: Sequence[float],
                             rng: np.random.RandomState) -> TrainCropParams:
    """One clip's crop params on a ``width x height`` decoded frame."""
    scale = scales[rng.randint(0, len(scales))]
    side = int(min(width, height) * scale)
    tl_x = rng.random_sample()
    tl_y = rng.random_sample()
    x1 = int(tl_x * (width - side))
    y1 = int(tl_y * (height - side))
    return TrainCropParams(x1=x1, y1=y1, side=side,
                           flip=bool(rng.random_sample() < 0.5))


def center_square_crop(width: int, height: int) -> Tuple[int, int, int]:
    """CenterCropScaled's crop rectangle (spatial_transforms.py:199-228):
    the largest centered square.  Returns (x1, y1, side)."""
    side = min(width, height)
    x1 = int(round((width - side) / 2.0))
    y1 = int(round((height - side) / 2.0))
    return x1, y1, side


def train_scales(crop_size: int, resize_size: Sequence[float]
                 ) -> Tuple[float, ...]:
    """The reference's scale set: crop_size / resize_size
    (train_x3d_kinetics_multigrid.py:70)."""
    return tuple(crop_size / r for r in resize_size)
