"""Calibration algorithms beyond max: SmoothQuant, AWQ (lite/clip/full),
MSE, GPTQ, SVDQuant. Each registers itself with the calibrate() dispatch.
"""

from . import (  # noqa: F401
    awq,
    gptq,
    histogram,
    local_hessian,
    mse,
    nvfp4_headroom,
    smoothquant,
    svdquant,
)
from .capture import capture_inputs, fused_groups, quant_linears  # noqa: F401
