"""Standalone multi-view evaluation path on the CPU mesh."""

import numpy as np
import jax

from x3d_multigrid_tpu.models import x3d_config, init_params, init_bn_state
from x3d_multigrid_tpu.train.recipes.evaluate_kinetics import evaluate
from x3d_multigrid_tpu.parallel import data_mesh

TINY = dict(version="M", n_classes=7, dropout=0.0,
            blocks_override=(1, 1, 1, 1),
            inplanes_override=((12, 8), (16, 8), (24, 16), (32, 16)),
            fc1_dim=32)


def test_evaluate_multiview():
    cfg = x3d_config(**TINY)
    params = init_params(jax.random.PRNGKey(0), cfg)
    bn = init_bn_state(cfg, 1)
    rng = np.random.RandomState(0)
    loader = [
        {"clip": rng.randint(0, 255, (8, 3, 2, 40, 40, 3), np.uint8),
         "label": rng.randint(0, 7, (8,)).astype(np.int32)}
        for _ in range(2)
    ]
    acc = evaluate(params, bn, cfg, loader, crop_size=32,
                   mesh=data_mesh(8))
    assert 0.0 <= acc <= 1.0
