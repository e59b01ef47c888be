"""MSE calibration: grid-search the amax shrink ratio minimizing
fake-quantization MSE, for weights and (captured) activations
(reference: model_calib.py:733 mse_calibrate, calib/mse.py:31 MseCalibrator,
calib/histogram.py percentile variant)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...core.bundle import PHASE_CALIB
from ...core.tree import get_in, set_in
from ..api import max_calibrate, register_calib_algorithm
from ..fake_quant import reduce_amax
from .capture import active_config, capture_inputs, fq_with_amax, quant_linears


def _search_amax(x, spec, base_amax, ratios):
    """Return best amax = r*base minimizing ||q(x)-x||^2 (per-element grid)."""

    @jax.jit
    def loss(r):
        amax = jnp.broadcast_to(base_amax * r, x.shape)
        return jnp.mean((fq_with_amax(x, amax, spec) - x) ** 2)

    losses = [float(loss(jnp.float32(r))) for r in ratios]
    return base_amax * float(ratios[int(np.argmin(losses))])


@register_calib_algorithm("mse")
def mse_calibrate(
    bundle, forward_loop=None, num_ratios: int = 11, min_ratio: float = 0.5,
    max_tokens: int = 2048,
):
    # start from max calibration so every static amax exists, then refine
    bundle = max_calibrate(bundle, forward_loop)
    ratios = np.linspace(min_ratio, 1.0, num_ratios)
    cfg = active_config(bundle)
    captured = capture_inputs(bundle, forward_loop, max_tokens=max_tokens)
    variables = bundle.variables

    # --- activations: refine per-tensor amax of static input quantizers ----
    for info in quant_linears(bundle, captured):
        aspec = info.aspec
        if aspec is None or not aspec.enable:
            continue
        if aspec.block is not None or aspec.axis is not None or aspec.dynamic:
            continue  # only static per-tensor activation amax refined here
        qpath = tuple(info.dense_path.split("/")) + ("input_quantizer", "amax")
        cur = get_in(variables.get("quant", {}), qpath)
        if cur is None:
            continue
        best = _search_amax(info.x, aspec, jnp.max(jnp.abs(info.x)), ratios)
        variables = {
            **variables,
            "quant": set_in(variables["quant"], qpath, jnp.asarray(best, jnp.float32)),
        }

    # --- weights: refine static weight amax where present ------------------
    for info in quant_linears(bundle, captured):
        wspec = info.wspec
        if wspec.block is not None and wspec.block.dynamic:
            continue  # dynamic scales: nothing stored
        qpath = tuple(info.dense_path.split("/")) + ("weight_quantizer", "amax")
        cur = get_in(variables.get("quant", {}), qpath)
        if cur is None:
            continue
        w = info.kernel

        @jax.jit
        def loss(r, cur=cur, w=w, wspec=wspec):
            from ..fake_quant import fake_quantize

            if wspec.block is not None:
                return jnp.mean((fake_quantize(w, wspec, amax=cur * r) - w) ** 2)
            amax = cur * r
            if amax.ndim < w.ndim:
                amax = amax.reshape((1,) * (w.ndim - amax.ndim) + amax.shape)
            return jnp.mean((fq_with_amax(w, jnp.broadcast_to(amax, w.shape), wspec) - w) ** 2)

        losses = [float(loss(jnp.float32(r))) for r in ratios]
        best_r = float(ratios[int(np.argmin(losses))])
        variables = {
            **variables,
            "quant": set_in(variables["quant"], qpath, cur * best_r),
        }

    return bundle.replace(variables=variables)
