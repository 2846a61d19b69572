"""Frame decoding: JPEG -> uint8 crop arrays for the device pipeline.

Two backends with identical semantics:
- :class:`PILReader` — pure-Python fallback.
- :class:`NativeReader` — the C++ runtime (csrc/jpeg_decode.cc via ctypes):
  libjpeg decode with DCT scaling + fused bilinear resize/crop, the
  TPU-native replacement for the reference's accimage dependency
  (README.md:22,33).

Decode contract (both backends):
  1. decode the JPEG;
  2. resize so the short side == ``short_side`` (aspect preserved, bilinear);
  3. crop the requested square ``(x1, y1, side)``;
  4. if ``side != out_size``, bilinear-resize the crop to ``out_size``.

The random multi-scale crop params are sampled once per clip in resized
coordinates (clip-consistent augmentation, spatial_transforms.py:472-501).
"""

import os
from typing import List, Optional, Tuple

import numpy as np

from x3d_multigrid_tpu.data.spatial import (
    TrainCropParams, sample_train_crop_params, center_square_crop,
)


def _resized_dims(w: int, h: int, short_side: int) -> Tuple[int, int]:
    if min(w, h) == short_side:
        return w, h
    s = short_side / min(w, h)
    return max(short_side, int(round(w * s))), \
        max(short_side, int(round(h * s)))


class PILReader:
    """PIL-based decode (the reference's fallback loader,
    kinetics_multigrid.py:22-25)."""

    def _decode(self, path: str, short_side: int):
        from PIL import Image
        with open(path, "rb") as f:
            img = Image.open(f)
            img = img.convert("RGB")
        w, h = img.size
        nw, nh = _resized_dims(w, h, short_side)
        if (nw, nh) != (w, h):
            img = img.resize((nw, nh), Image.BILINEAR)
        return img

    def clip_train(self, paths: List[str], short_side: int, out_size: int,
                   scales, rng: np.random.RandomState,
                   out: Optional[np.ndarray] = None
                   ) -> Tuple[np.ndarray, TrainCropParams]:
        """Decode a clip with one shared random crop.  Returns
        ((T, out_size, out_size, 3) uint8, params).  ``out``, when given
        (same shape/dtype), receives the frames in place — the loader
        passes batch-buffer slices so decode writes straight into the
        staging array (the reference needs a pin-memory copy thread for
        this, dataloader.py:725-747)."""
        from PIL import Image
        if out is None:
            out = np.empty((len(paths), out_size, out_size, 3), np.uint8)
        params: Optional[TrainCropParams] = None
        for t, p in enumerate(paths):
            img = self._decode(p, short_side)
            if params is None:
                params = sample_train_crop_params(img.size[0], img.size[1],
                                                  scales, rng)
            img = img.crop((params.x1, params.y1, params.x1 + params.side,
                            params.y1 + params.side))
            if params.side != out_size:
                img = img.resize((out_size, out_size), Image.BILINEAR)
            out[t] = np.asarray(img, np.uint8)
        return out, params

    def clip_eval(self, paths: List[str], short_side: int,
                  out: Optional[np.ndarray] = None) -> np.ndarray:
        """Center square crops at decode size: (T, short_side, short_side, 3)."""
        if out is None:
            out = np.empty((len(paths), short_side, short_side, 3), np.uint8)
        for t, p in enumerate(paths):
            img = self._decode(p, short_side)
            x1, y1, side = center_square_crop(img.size[0], img.size[1])
            img = img.crop((x1, y1, x1 + side, y1 + side))
            out[t] = np.asarray(img, np.uint8)
        return out


def default_reader():
    """Native C++ reader when built, else PIL."""
    try:
        from x3d_multigrid_tpu.data.native import NativeReader
        return NativeReader()
    except Exception:
        return PILReader()
