"""Complete transform catalog with the reference's semantics
(transforms/spatial_transforms.py, temporal_transforms.py,
target_transforms.py), in this framework's split idiom:

- *parameter sampling* happens host-side once per clip (the
  ``randomize_parameters`` contract, spatial_transforms.py:30-32), via
  small dataclasses with a ``sample(rng, ...)`` constructor;
- *pixel work* is expressed as crop rectangles applied at decode time
  (data/reader.py) plus fused on-device resize/flip/normalize
  (ops/preprocess.py).

The recipes use MultiScaleRandomCropMultigrid / CenterCropScaled /
RandomHorizontalFlip / ToTensor / Normalize; the rest of the catalog is
provided for API parity and ad-hoc pipelines.  Host-side appliers
(`apply_to_array`) operate on numpy uint8 HWC frames so every transform is
usable without a device.
"""

import dataclasses
import math
from typing import List, Optional, Sequence, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# Spatial transforms: each returns a crop rectangle (x1, y1, w, h) and/or a
# resize target; Compose-style chaining is just function composition.
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class CropRect:
    x1: int
    y1: int
    w: int
    h: int
    resize_to: Optional[Tuple[int, int]] = None  # (out_w, out_h)


def scale_short_side(width: int, height: int, size: int
                     ) -> Tuple[int, int]:
    """``Scale(int)``: resize so the short side == size, aspect preserved
    (spatial_transforms.py:122-161)."""
    if (width <= height and width == size) or \
            (height <= width and height == size):
        return width, height
    if width < height:
        return size, int(size * height / width)
    return int(size * width / height), size


def center_crop(width: int, height: int, size: int) -> CropRect:
    """``CenterCrop`` (spatial_transforms.py:167-195)."""
    x1 = int(round((width - size) / 2.0))
    y1 = int(round((height - size) / 2.0))
    return CropRect(x1, y1, size, size)


def center_crop_scaled(width: int, height: int, out_size: int) -> CropRect:
    """``CenterCropScaled``: largest centered square, resized to out_size
    (spatial_transforms.py:199-228)."""
    side = min(width, height)
    x1 = int(round((width - side) / 2.0))
    y1 = int(round((height - side) / 2.0))
    return CropRect(x1, y1, side, side, resize_to=(out_size, out_size))


_CORNERS = ("c", "tl", "tr", "bl", "br")


def corner_crop(width: int, height: int, size: int, position: str
                ) -> CropRect:
    """``CornerCrop`` (spatial_transforms.py:278-322)."""
    if position == "c":
        x1 = int(round((width - size) / 2.0))
        y1 = int(round((height - size) / 2.0))
    elif position == "tl":
        x1, y1 = 0, 0
    elif position == "tr":
        x1, y1 = width - size, 0
    elif position == "bl":
        x1, y1 = 0, height - size
    elif position == "br":
        x1, y1 = width - size, height - size
    else:
        raise ValueError(position)
    return CropRect(x1, y1, size, size)


def sample_corner_crop(width: int, height: int, size: int,
                       rng: np.random.RandomState) -> CropRect:
    """Randomized CornerCrop (spatial_transforms.py:324-328)."""
    return corner_crop(width, height, size,
                       _CORNERS[rng.randint(0, len(_CORNERS))])


def sample_multiscale_corner_crop(width: int, height: int,
                                  scales: Sequence[float], out_size: int,
                                  rng: np.random.RandomState) -> CropRect:
    """``MultiScaleCornerCrop``: random scale x random corner, resized to
    out_size (spatial_transforms.py:373-439)."""
    scale = scales[rng.randint(0, len(scales))]
    size = int(min(width, height) * scale)
    # NOTE the reference indexes crop positions with randint over
    # len(scales) (spatial_transforms.py:437-439) — an upstream quirk we do
    # not replicate; we sample uniformly over the 5 positions.
    rect = corner_crop(width, height, size,
                       _CORNERS[rng.randint(0, len(_CORNERS))])
    return dataclasses.replace(rect, resize_to=(out_size, out_size))


def sample_multiscale_random_crop(width: int, height: int,
                                  scales: Sequence[float], out_size: int,
                                  rng: np.random.RandomState) -> CropRect:
    """``MultiScaleRandomCrop`` / ``MultiScaleRandomCropMultigrid``: random
    scale, uniform random position, resized to ``out_size`` — the multigrid
    variant simply feeds the per-clip short-cycle size as ``out_size``
    (spatial_transforms.py:442-501)."""
    scale = scales[rng.randint(0, len(scales))]
    side = int(min(width, height) * scale)
    x1 = int(rng.random_sample() * (width - side))
    y1 = int(rng.random_sample() * (height - side))
    return CropRect(x1, y1, side, side, resize_to=(out_size, out_size))


def sample_flip(rng: np.random.RandomState, p: float = 0.5) -> bool:
    """RandomHorizontal/VerticalFlip decision (spatial_transforms.py:
    331-370): clip-consistent, probability 0.5."""
    return bool(rng.random_sample() < p)


def apply_to_array(frame: np.ndarray, rect: CropRect,
                   hflip: bool = False, vflip: bool = False) -> np.ndarray:
    """Host-side applier for a single HWC uint8 frame (resize via PIL)."""
    crop = frame[rect.y1:rect.y1 + rect.h, rect.x1:rect.x1 + rect.w]
    if rect.resize_to is not None and \
            (rect.w, rect.h) != rect.resize_to:
        from PIL import Image
        crop = np.asarray(
            Image.fromarray(crop).resize(rect.resize_to, Image.BILINEAR))
    if hflip:
        crop = crop[:, ::-1]
    if vflip:
        crop = crop[::-1]
    return crop


def to_tensor(frames_u8: np.ndarray, norm_value: float = 255.0
              ) -> np.ndarray:
    """``ToTensor`` semantics minus the layout transpose: uint8 [0,255] ->
    float32 [0,1].  (The reference's HWC->CHW transpose — 80% of its load
    CPU, spatial_transforms.py:80-81 — does not exist here: the device
    pipeline consumes channels-last directly.)"""
    return frames_u8.astype(np.float32) / norm_value


def normalize(frames: np.ndarray, mean, std) -> np.ndarray:
    """``Normalize`` (spatial_transforms.py:91-116); prefer the fused
    on-device version in ops/preprocess.py."""
    return (frames - np.asarray(mean, np.float32)) / \
        np.asarray(std, np.float32)


# ---------------------------------------------------------------------------
# Temporal transforms (frame-index lists) — random crop and loop padding
# live in data/temporal.py; begin/center crops complete the catalog.
# ---------------------------------------------------------------------------

def temporal_begin_crop(frame_indices: List[int], size: int) -> List[int]:
    """``TemporalBeginCrop`` (temporal_transforms.py:21-42)."""
    from x3d_multigrid_tpu.data.temporal import loop_pad
    return loop_pad(list(frame_indices[:size]), size)


def temporal_center_crop(frame_indices: List[int], size: int) -> List[int]:
    """``TemporalCenterCrop`` (temporal_transforms.py:45-77)."""
    from x3d_multigrid_tpu.data.temporal import loop_pad
    center = len(frame_indices) // 2
    begin = max(0, center - (size // 2))
    end = min(begin + size, len(frame_indices))
    return loop_pad(list(frame_indices[begin:end]), size)


# ---------------------------------------------------------------------------
# Target transforms (target_transforms.py): the reference wraps dataset
# annotation dicts; ours are plain selectors usable in custom pipelines.
# ---------------------------------------------------------------------------

def class_label(sample) -> int:
    """``ClassLabel`` (target_transforms.py:17-20)."""
    return sample.label


def video_id(sample) -> str:
    """``VideoID`` (target_transforms.py:23-26)."""
    return sample.video_id


def compose(*fns):
    """``Compose`` for target selectors (target_transforms.py:5-14):
    returns a tuple of each selector's output."""
    def apply(sample):
        return tuple(f(sample) for f in fns)
    return apply
