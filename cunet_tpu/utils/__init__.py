from cunet_tpu.utils.checkpoint import Checkpoint, strip_resume_prefix
from cunet_tpu.utils.history import AverageMeter, TrainHistory
from cunet_tpu.utils.logger import ConsoleFileLogger, TsvLogger
from cunet_tpu.utils.visualizer import (
    HtmlReport,
    Visualizer,
    colorize_heatmap,
    draw_landmarks,
    save_image_grid,
)

__all__ = [
    "AverageMeter",
    "Checkpoint",
    "ConsoleFileLogger",
    "HtmlReport",
    "TrainHistory",
    "TsvLogger",
    "Visualizer",
    "colorize_heatmap",
    "draw_landmarks",
    "save_image_grid",
    "strip_resume_prefix",
]
