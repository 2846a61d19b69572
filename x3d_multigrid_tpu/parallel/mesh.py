"""Device mesh helpers.

The reference's only parallelism is single-process data parallelism over
GPUs (nn.DataParallel — SURVEY §2.3); the TPU-native equivalent is a 1-D
``jax.sharding.Mesh`` over the ICI with the batch sharded on a ``data``
axis, gradients reduced with ``psum`` inside ``shard_map``.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"


def data_mesh(num_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over (a prefix of) the available devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"requested {num_devices} devices, have {len(devices)}")
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def pad_to_multiple(x, multiple: int, axis: int = 0):
    """Pad ``x`` along ``axis`` (repeating the leading rows) up to the next
    multiple — used to keep eval batches shardable when the last batch of a
    dataset is ragged.  Returns (padded, original_size)."""
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    reps = np.concatenate([np.arange(n), np.arange(rem) % n])
    return x.take(reps, axis=axis), n
