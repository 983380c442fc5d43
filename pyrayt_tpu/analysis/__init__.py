"""Analysis: on-device differentiable metrics, aberration curves, gradient
validation, and gradient-based lens optimization.

The reference ships its analysis as notebook cells over the results frame
(examples/lens_design.ipynb); this package provides them as library
functions plus the differentiable layer the reference never had.
"""

from pyrayt_tpu.analysis.aberrations import (
    chromatic_aberration,
    coma,
    spherical_aberration,
)
from pyrayt_tpu.analysis.checkpoint import (
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)
from pyrayt_tpu.analysis.gradcheck import check_gradients, finite_difference_grad
from pyrayt_tpu.analysis.metrics import (
    COL,
    FocusError,
    RmsSpotRadius,
    SoftFocusError,
    axis_intercepts,
    detector_weights,
    focus_error,
    last_generation_mask,
    masked_mean,
    rms_spot_radius,
    smoothstep,
    soft_focus_error,
    soft_rms_spot_radius,
    spot_diagram_points,
    surface_mask,
    weighted_mean,
    window_weights,
)
from pyrayt_tpu.analysis.optimize import build_objective, optimize

__all__ = [
    "chromatic_aberration",
    "coma",
    "spherical_aberration",
    "latest_step",
    "restore_checkpoint",
    "save_checkpoint",
    "check_gradients",
    "finite_difference_grad",
    "COL",
    "FocusError",
    "RmsSpotRadius",
    "SoftFocusError",
    "axis_intercepts",
    "detector_weights",
    "focus_error",
    "last_generation_mask",
    "masked_mean",
    "rms_spot_radius",
    "smoothstep",
    "soft_focus_error",
    "soft_rms_spot_radius",
    "spot_diagram_points",
    "surface_mask",
    "weighted_mean",
    "window_weights",
    "build_objective",
    "optimize",
]
