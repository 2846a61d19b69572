"""ctypes bindings for the native C++ frame decoder (csrc/jpeg_decode.cc).

Builds itself on first use (``make -C csrc``, file-locked against racing
processes) when the .so is absent — containers are ephemeral, so a fresh
checkout must not require a manual build step.  :func:`default_reader` in
data/reader.py picks this up automatically and falls back to PIL when the
library cannot be built.  Decode contract matches PILReader exactly (short-side resize ->
square crop -> resize to canonical) so the two backends are interchangeable
and cross-validated in tests.
"""

import ctypes
import os
from typing import List, Tuple

import numpy as np

from x3d_multigrid_tpu.data.spatial import (
    TrainCropParams, sample_train_crop_params,
)

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "build",
                 "libx3djpeg.so"),
    os.path.join(os.path.dirname(__file__), "libx3djpeg.so"),
]


def _try_build() -> bool:
    """Best-effort self-bootstrap: compile csrc/ if the .so is missing.

    Containers are ephemeral — the repo persists via git but build
    artifacts do not, so first use after a fresh checkout would otherwise
    require a manual ``make -C csrc``.  A file lock serializes concurrent
    builders (e.g. process-executor workers starting together).
    """
    csrc = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "..", "csrc"))
    if not os.path.exists(os.path.join(csrc, "Makefile")):
        return False
    import fcntl
    import subprocess
    lock_path = os.path.join(csrc, ".build_lock")
    try:
        with open(lock_path, "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)  # waits for a racing builder
            if any(os.path.exists(os.path.abspath(p)) for p in _LIB_PATHS):
                return True  # someone else finished the build
            subprocess.run(["make", "-C", csrc], check=True,
                           capture_output=True, timeout=300)
        return True
    except Exception:
        return False


def _load_lib(_retry: bool = True):
    for p in _LIB_PATHS:
        p = os.path.abspath(p)
        if os.path.exists(p):
            lib = ctypes.CDLL(p)
            lib.x3d_probe.restype = ctypes.c_int
            lib.x3d_probe.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
            lib.x3d_decode_frame.restype = ctypes.c_int
            lib.x3d_decode_frame.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_void_p]
            if hasattr(lib, "x3d_decode_clip"):  # stale .so lacks it
                lib.x3d_decode_clip.restype = ctypes.c_int
                lib.x3d_decode_clip.argtypes = [
                    ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                    ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ctypes.c_void_p, ctypes.POINTER(ctypes.c_int)]
            return lib
    if _retry and _try_build():
        return _load_lib(_retry=False)
    raise FileNotFoundError(
        "libx3djpeg.so not built; run `make -C csrc` "
        f"(searched {_LIB_PATHS})")


class NativeReader:
    """Drop-in replacement for data.reader.PILReader backed by libjpeg.

    ``fast=True`` (default) enables libjpeg DCT-domain scaling: frames are
    decoded at the M/8 size just covering ``short_side`` (2-8x cheaper) at
    the cost of a slightly different lowpass than PIL's full decode +
    triangle resample.  Use ``fast=False`` for PIL-equivalent output.

    Whole clips are decoded through one ``x3d_decode_clip`` call (file IO,
    decode and crop all native; no Python in the per-frame loop).
    ``frame_threads`` sizes the C++ worker team *within* a clip: keep the
    default 1 when the loader already parallelizes over clips (its thread
    pool composes with this), raise it (or set ``X3D_FRAME_THREADS``) on
    pod-scale hosts where per-clip latency matters; 0 = all hardware
    threads.
    """

    def __init__(self, fast: bool = True, frame_threads: int = None):
        self._lib = _load_lib()
        self._fast = 1 if fast else 0
        if frame_threads is None:
            frame_threads = int(os.environ.get("X3D_FRAME_THREADS", "1"))
        self._frame_threads = frame_threads
        self._has_clip = hasattr(self._lib, "x3d_decode_clip")

    def _decode_clip(self, paths: List[str], short_side: int,
                     crop: Tuple[int, int, int], out_size: int,
                     out: np.ndarray = None) -> np.ndarray:
        """All frames of a clip in one native call (shared crop params).
        ``out`` (contiguous uint8 (T, out_size, out_size, 3)), when given,
        is written in place — e.g. a slice of the loader's batch buffer."""
        if out is None:
            out = np.empty((len(paths), out_size, out_size, 3), np.uint8)
        else:
            assert out.flags["C_CONTIGUOUS"] and out.dtype == np.uint8 \
                and out.shape == (len(paths), out_size, out_size, 3), (
                    out.shape, out.dtype)
        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths])
        err_frame = ctypes.c_int(-1)
        rc = self._lib.x3d_decode_clip(
            arr, len(paths), short_side, self._fast, crop[0], crop[1],
            crop[2], out_size, self._frame_threads,
            out.ctypes.data_as(ctypes.c_void_p), ctypes.byref(err_frame))
        if rc != 0:
            bad = paths[err_frame.value] if 0 <= err_frame.value < len(paths) \
                else "?"
            raise IOError(f"native clip decode failed ({rc}) at frame "
                          f"{err_frame.value}: {bad}")
        return out

    def _decode(self, path: str, short_side: int, crop: Tuple[int, int, int],
                out_size: int) -> np.ndarray:
        with open(path, "rb") as f:
            data = f.read()
        out = np.empty((out_size, out_size, 3), np.uint8)
        rc = self._lib.x3d_decode_frame(
            data, len(data), short_side, self._fast, crop[0], crop[1],
            crop[2], out_size, out.ctypes.data_as(ctypes.c_void_p))
        if rc != 0:
            raise IOError(f"native decode failed ({rc}) for {path}")
        return out

    def _probe(self, path: str, short_side: int) -> Tuple[int, int]:
        with open(path, "rb") as f:
            data = f.read()
        w = ctypes.c_int()
        h = ctypes.c_int()
        rc = self._lib.x3d_probe(data, len(data), short_side,
                                 ctypes.byref(w), ctypes.byref(h))
        if rc != 0:
            raise IOError(f"native probe failed for {path}")
        return w.value, h.value

    def clip_train(self, paths: List[str], short_side: int, out_size: int,
                   scales, rng: np.random.RandomState,
                   out: np.ndarray = None
                   ) -> Tuple[np.ndarray, TrainCropParams]:
        w, h = self._probe(paths[0], short_side)
        params = sample_train_crop_params(w, h, scales, rng)
        crop = (params.x1, params.y1, params.side)
        if self._has_clip:
            return self._decode_clip(paths, short_side, crop, out_size,
                                     out=out), params
        if out is None:
            out = np.empty((len(paths), out_size, out_size, 3), np.uint8)
        for t, p in enumerate(paths):
            out[t] = self._decode(p, short_side, crop, out_size)
        return out, params

    def clip_eval(self, paths: List[str], short_side: int,
                  out: np.ndarray = None) -> np.ndarray:
        if self._has_clip:
            return self._decode_clip(paths, short_side, (-1, -1, -1),
                                     short_side, out=out)
        if out is None:
            out = np.empty((len(paths), short_side, short_side, 3),
                           np.uint8)
        for t, p in enumerate(paths):
            out[t] = self._decode(p, short_side, (-1, -1, -1), short_side)
        return out
