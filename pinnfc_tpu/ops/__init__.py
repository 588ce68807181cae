from pinnfc_tpu.ops.smoothing import centered_moving_average, smooth_by_segments
from pinnfc_tpu.ops.recurrences import (
    linear_recurrence_scan,
    linear_recurrence_assoc,
    leaky_integral,
    ema,
)
from pinnfc_tpu.ops.pallas_residuals import all_residuals_pallas, fused_residuals_pallas
from pinnfc_tpu.ops.pallas_mc_dropout import mc_dropout_pallas

__all__ = [
    "centered_moving_average",
    "smooth_by_segments",
    "linear_recurrence_scan",
    "linear_recurrence_assoc",
    "leaky_integral",
    "ema",
    "all_residuals_pallas",
    "fused_residuals_pallas",
    "mc_dropout_pallas",
]
