"""NVFP4 activation global-scale calibration with outlier headroom
(reference: modelopt/torch/quantization/calib/nvfp4_act_headroom.py
NVFP4ActHeadroomCalibrator — same formula, recast over captured activations).

NVFP4's per-tensor global scale fixes where the e4m3 block-scale range sits.
Plain max calibration anchors it to the largest block seen, so any unseen
larger activation saturates. This calibrator sets

    amax = max(rho * anchor, upper)

with ``anchor``/``upper`` low/high percentiles of the per-block amax
distribution: the anchor*rho term parks calibrated blocks low in the FP8
scale range (leaving upward headroom), while ``upper_percentile < 100``
refuses to let one freak block push everyone else's block scale subnormal.
Blocks below ``upper / 1e6`` are ignored when locating the anchor so a tail
of near-zero blocks cannot drag the scale down.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...core.tree import get_in, set_in
from ..api import max_calibrate, register_calib_algorithm
from .capture import capture_inputs, quant_linears

_ANCHOR_FLOOR_RATIO = 1e6


def headroom_amax(
    x: np.ndarray, block: int, anchor_percentile: float, upper_percentile: float,
    rho: float,
) -> float:
    n = (x.shape[-1] // block) * block
    blocks = np.abs(x[..., :n]).reshape(-1, block)
    bamax = blocks.max(-1)
    upper = float(np.percentile(bamax, upper_percentile))
    kept = bamax[bamax >= upper / _ANCHOR_FLOOR_RATIO]
    if kept.size == 0:
        return max(upper, 1e-12)
    anchor = float(np.percentile(kept, anchor_percentile))
    return max(rho * anchor, upper, 1e-12)


@register_calib_algorithm("nvfp4_act_headroom")
def nvfp4_act_headroom(
    bundle, forward_loop=None, anchor_percentile: float = 1.0,
    upper_percentile: float = 99.99, rho: float = 64.0, max_tokens: int = 4096,
):
    bundle = max_calibrate(bundle, forward_loop)  # weights + baseline amax
    captured = capture_inputs(bundle, forward_loop, max_tokens=max_tokens)
    variables = bundle.variables
    for info in quant_linears(bundle, captured):
        aspec = info.aspec
        if (
            aspec is None or not aspec.enable or aspec.block is None
            or not aspec.block.two_level
        ):
            continue
        qpath = tuple(info.dense_path.split("/")) + ("input_quantizer", "amax")
        if get_in(variables.get("quant", {}), qpath) is None:
            continue
        bsz = dict(aspec.block.sizes).get(-1, 16)
        amax = headroom_amax(
            np.asarray(info.x), bsz, anchor_percentile, upper_percentile, rho
        )
        variables = {
            **variables,
            "quant": set_in(variables["quant"], qpath, jnp.float32(amax)),
        }
    return bundle.replace(variables=variables)
