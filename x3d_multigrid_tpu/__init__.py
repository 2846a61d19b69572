"""x3d_multigrid_tpu — a TPU-native (JAX/XLA/Pallas/pjit) video-recognition
framework with the capabilities of KiyoshiKAWASAKI/X3D-Multigrid.

Layout convention: activations are channels-last ``(N, T, H, W, C)`` (NDHWC),
the TPU-friendly layout (C rides the 128-lane minor dimension).  The reference
repo uses NCTHW; converters in :mod:`x3d_multigrid_tpu.train.checkpoint`
translate weights between the two.

Subpackages
-----------
- ``models``     X3D model family (S/M/XL) as functional param/state pytrees.
- ``ops``        Compute ops: depthwise-separable conv3d, split batch-norm,
                 swish (custom VJP), SE, pooling, on-device preprocessing,
                 Pallas kernels.
- ``multigrid``  The long/short-cycle shape schedule and static shape buckets.
- ``parallel``   Device mesh + shard_map data-parallel train/eval steps.
- ``train``      Optimizer, LR control, checkpointing, training recipes.
- ``data``       Dataset indexing (Kinetics/Charades), host-side samplers and
                 the prefetching clip loader (C++ JPEG decode).
- ``evaluate``   Top-1 / average-precision metrics and multi-view eval.
"""

__version__ = "0.1.0"
