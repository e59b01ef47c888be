"""Calibration algorithms beyond max: SmoothQuant, AWQ (lite/clip/full),
MSE, GPTQ, SVDQuant. Each registers itself with the calibrate() dispatch.
"""

from . import awq, gptq, histogram, mse, nvfp4_headroom, smoothquant, svdquant  # noqa: F401
from .capture import capture_inputs, fused_groups, quant_linears  # noqa: F401
