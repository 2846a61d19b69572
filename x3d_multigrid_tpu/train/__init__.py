from x3d_multigrid_tpu.train.sgd import (
    init_momentum, sgd_update, LRController, PlateauLRController,
)

__all__ = [
    "init_momentum",
    "sgd_update",
    "LRController",
    "PlateauLRController",
]
