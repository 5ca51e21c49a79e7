from cunet_tpu.utils.checkpoint import Checkpoint, strip_resume_prefix
from cunet_tpu.utils.guards import (
    assert_finite,
    check_finite,
    find_nonfinite,
    guard_update,
)
from cunet_tpu.utils.params import count_conv_params, count_params, param_summary
from cunet_tpu.utils.profiling import StepTimer, compiled_cost, roofline_fraction, trace
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
    "StepTimer",
    "assert_finite",
    "check_finite",
    "compiled_cost",
    "count_conv_params",
    "count_params",
    "param_summary",
    "find_nonfinite",
    "guard_update",
    "roofline_fraction",
    "trace",
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
