from x3d_multigrid_tpu.utils.logging import MetricLogger, StepTimer
from x3d_multigrid_tpu.utils.config import (
    make_recipe, save_recipe, load_recipe_dict, recipe_to_dict,
)

__all__ = ["MetricLogger", "StepTimer", "make_recipe", "save_recipe",
           "load_recipe_dict", "recipe_to_dict"]
