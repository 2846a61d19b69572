"""Static shape buckets: the finite set of (batch, frames, crop) combos a
multigrid run visits.

The reference recompiles nothing (eager torch); on TPU every distinct input
shape is one XLA compilation, so the trainer pre-compiles one train step per
bucket and dispatches by ``IterationPlan.shape_key``.  For the X3D-M short
schedule this is 10 buckets (4 long cycles x 2-3 short cycles; the final
no-cycle phase reuses the long-3 buckets).
"""

import dataclasses
from typing import Dict, List, Tuple

from x3d_multigrid_tpu.multigrid.schedule import (
    MultigridConfig, long_cycle_shapes, short_cycle_crop,
    _short_batch_multiplier,
)


@dataclasses.dataclass(frozen=True)
class ShapeBucket:
    batch_size: int      # global batch (clips)
    frames: int          # model-time frames
    crop: int
    bn_splits: int       # per-replica SubBN splits
    long_cycle_index: int
    short_state: int

    @property
    def bucket_key(self) -> Tuple[int, int, int, int]:
        return (self.batch_size, self.frames, self.crop, self.bn_splits)


def enumerate_buckets(cfg: MultigridConfig) -> List[ShapeBucket]:
    """All buckets the schedule can emit, deduplicated by bucket_key.

    Note long index -1 (final phase) produces the same shapes/batches and
    bn_splits as index 3 (``long_cycle[-1]`` aliasing,
    kinetics_multigrid.py:225), so it adds no extra buckets.
    """
    shapes = long_cycle_shapes(cfg.sample_duration, cfg.crop_size)
    seen: Dict[Tuple[int, int, int, int], ShapeBucket] = {}
    for li in range(len(cfg.long_cycle)):
        raw_frames, base_crop = shapes[li]
        n_short = 2 if li in (0, 1) else 3
        for s in range(n_short):
            _, crop = short_cycle_crop(li, s, base_crop)
            mult = _short_batch_multiplier(li, s)
            b = ShapeBucket(
                batch_size=cfg.base_batch_size * cfg.long_cycle[li] * mult,
                frames=raw_frames // cfg.gamma_tau,
                crop=crop,
                bn_splits=cfg.base_bn_splits * cfg.long_cycle[li],
                long_cycle_index=li,
                short_state=s,
            )
            seen.setdefault(b.bucket_key, b)
    return list(seen.values())
