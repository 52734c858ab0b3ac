from .logging import MetricLogger, StepTimer, save_image_grid, trace

__all__ = ["MetricLogger", "StepTimer", "save_image_grid", "trace"]
