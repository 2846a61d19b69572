from x3d_multigrid_tpu.utils.logging import MetricLogger, StepTimer

__all__ = ["MetricLogger", "StepTimer"]
