"""SmoothQuant: migrate activation outliers into weights via per-channel
scales s = act_amax^a / w_amax^(1-a); runtime applies pre_quant_scale = 1/s
and the kernel is folded with s (reference: model_calib.py:1274 smoothquant,
resmoothing of fused siblings :1171-1273)."""

from __future__ import annotations

import jax.numpy as jnp

from ...core.tree import get_in, set_in
from ..api import max_calibrate, register_calib_algorithm
from .capture import kernel_for_write, capture_inputs, fused_groups, quant_linears

_EPS = 1e-8


def compute_smooth_scale(act_amax, w_amax, alpha: float):
    act_amax = jnp.maximum(act_amax, _EPS)
    w_amax = jnp.maximum(w_amax, _EPS)
    s = act_amax**alpha / w_amax ** (1.0 - alpha)
    return jnp.clip(s, 1e-4, 1e4)


def apply_group_scale(bundle, group, s):
    """Fold s into every member kernel; set shared pre_quant_scale = 1/s."""
    variables = bundle.variables
    for info in group:
        orig = get_in(variables["params"], info.kernel_path)
        new_kernel = (info.kernel * s[:, None]).astype(orig.dtype)
        params = set_in(variables["params"], info.kernel_path,
                        kernel_for_write(info, new_kernel))
        variables = {**variables, "params": params}
        qpath = tuple(info.dense_path.split("/")) + ("input_quantizer", "pre_quant_scale")
        quant = set_in(variables.get("quant", {}), qpath, (1.0 / s).astype(jnp.float32))
        variables = {**variables, "quant": quant}
    return bundle.replace(variables=variables)


@register_calib_algorithm("smoothquant")
def smoothquant(bundle, forward_loop=None, alpha: float = 0.5, max_tokens: int = 2048):
    captured = capture_inputs(bundle, forward_loop, max_tokens=max_tokens)
    infos = quant_linears(bundle, captured)
    # smoothing only helps where activations are quantized
    infos = [i for i in infos if i.aspec is not None and i.aspec.enable]
    for group in fused_groups(infos):
        act_amax = jnp.max(jnp.abs(group[0].x), axis=0)  # shared input
        w_amax = jnp.max(
            jnp.stack([jnp.max(jnp.abs(i.kernel), axis=1) for i in group]), axis=0
        )
        s = compute_smooth_scale(act_amax, w_amax, alpha)
        bundle = apply_group_scale(bundle, group, s)
    return max_calibrate(bundle, forward_loop)
