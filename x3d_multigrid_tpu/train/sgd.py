"""SGD + momentum + weight decay, and the reference's LR control logic.

The update matches torch.optim.SGD (momentum 0.9, dampening 0, no nesterov):

    buf   <- mu * buf + (grad + wd * param)
    param <- param - lr * buf

Weight decay applies to *every* parameter (the reference passes all params
in one group — train_x3d_kinetics_multigrid.py:183 — so BN scale/bias decay
too; preserved deliberately).

LR control reproduces the reference's three interacting mechanisms
(train_x3d_kinetics_multigrid.py:183-187,227-234,274,300-305):
  1. long-cycle transition scaling (x8 on entry/restart, x0.5 per step down,
     x1 entering the final phase),
  2. linear warmup that *overwrites* the lr during the first
     ``warmup_steps`` steps,
  3. MultiStepLR x0.1 at milestone steps (applied after the step, affecting
     the next one).
"""

from typing import Optional, Sequence, Set

import jax
import jax.numpy as jnp


def init_momentum(params):
    return jax.tree.map(jnp.zeros_like, params)


def sgd_update(params, grads, momentum_buf, *, lr, momentum=0.9,
               weight_decay=5e-5):
    """One SGD step; returns (new_params, new_momentum)."""
    new_mom = jax.tree.map(
        lambda p, g, m: momentum * m + g + weight_decay * p,
        params, grads, momentum_buf)
    new_params = jax.tree.map(lambda p, m: p - lr * m, params, new_mom)
    return new_params, new_mom


class LRController:
    """Stateful LR computation for the multigrid Kinetics recipe.

    Call :meth:`on_long_cycle` when a plan carries ``lr_scale``; call
    :meth:`step_lr(global_step)`` (0-based) to get the LR for that step.
    """

    def __init__(self, init_lr: float, *, warmup_steps: int = 8000,
                 start_steps: int = 0, milestones: Sequence[int] = (),
                 gamma: float = 0.1):
        self.lr = init_lr          # the live param-group lr
        self.base = init_lr        # warmup reference value (`lr` var in ref)
        self.warmup_steps = warmup_steps
        self.start_steps = start_steps
        self.milestones: Set[int] = set(int(m) for m in milestones)
        self.gamma = gamma

    def on_long_cycle(self, scale: float) -> float:
        self.lr *= scale
        self.base = self.lr
        return self.lr

    def step_lr(self, global_step: int) -> float:
        cur = global_step - self.start_steps
        # reference lr_warmup: active for cur_steps in (1, warmup_steps)
        if 1 < cur < self.warmup_steps:
            self.lr = min(1.0, (cur + 1) / self.warmup_steps) * self.base
        lr_used = self.lr
        # MultiStepLR: after this step the counter becomes global_step+1;
        # milestone hit scales the *next* step's lr.
        if (global_step + 1) in self.milestones:
            self.lr *= self.gamma
        return lr_used

    def state_dict(self):
        return {"lr": self.lr, "base": self.base}

    def load_state_dict(self, st):
        self.lr = st["lr"]
        self.base = st["base"]


class PlateauLRController:
    """ReduceLROnPlateau(mode='min', patience=2, factor=0.1) equivalent for
    the Charades recipes (train_x3d_charades.py:117)."""

    def __init__(self, init_lr: float, *, patience: int = 2,
                 factor: float = 0.1, threshold: float = 1e-4,
                 min_lr: float = 0.0):
        self.lr = init_lr
        self.patience = patience
        self.factor = factor
        self.threshold = threshold
        self.min_lr = min_lr
        self.best: Optional[float] = None
        self.num_bad = 0

    def step(self, metric: float) -> float:
        """Feed the epoch's val loss; returns the (possibly reduced) lr."""
        if self.best is None or metric < self.best * (1 - self.threshold):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad = 0
        return self.lr

    def state_dict(self):
        return {"lr": self.lr, "best": self.best, "num_bad": self.num_bad}

    def load_state_dict(self, st):
        self.lr, self.best, self.num_bad = st["lr"], st["best"], st["num_bad"]
