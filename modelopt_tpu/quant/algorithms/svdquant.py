"""SVDQuant: absorb weight outliers into a 16-bit low-rank branch, quantize
the residual (reference: model_calib.py:1980 svdquant + SVDQuantLinear lora
buffers in nn/modules/quant_linear.py).

Per layer: smooth W' = diag(s) W (SmoothQuant scale), take the top-r SVD
L1 L2 of W', keep residual R = W' - L1 L2 as the (quantized) kernel, and
store la = diag(1/s) L1, lb = L2 so the runtime branch x @ la @ lb uses the
raw 16-bit input (QuantDense picks the vars up automatically)."""

from __future__ import annotations

import jax.numpy as jnp

from ...core.tree import get_in, set_in
from ..api import max_calibrate, register_calib_algorithm
from .capture import capture_inputs, fused_groups, quant_linears
from .smoothquant import compute_smooth_scale

_EPS = 1e-8


@register_calib_algorithm("svdquant")
def svdquant(
    bundle, forward_loop=None, rank: int = 32, alpha: float = 0.5,
    max_tokens: int = 1024,
):
    captured = capture_inputs(bundle, forward_loop, max_tokens=max_tokens)
    infos = quant_linears(bundle, captured)
    variables = bundle.variables

    # the low-rank residual branch lives on QuantDense only — folded MoE
    # expert kernels don't participate in svdquant
    infos = [i for i in infos if i.moe_shape is None]
    for group in fused_groups(infos):
        act_amax = jnp.max(jnp.abs(group[0].x), axis=0)
        w_amax = jnp.max(
            jnp.stack([jnp.max(jnp.abs(i.kernel), axis=1) for i in group]), axis=0
        )
        s = compute_smooth_scale(act_amax, w_amax, alpha)
        for info in group:
            w_s = info.kernel * s[:, None]
            r = min(rank, min(w_s.shape) // 2)
            if r < 1:
                continue
            U, S, Vh = jnp.linalg.svd(w_s, full_matrices=False)
            L1 = U[:, :r] * S[:r][None, :]  # [in, r]
            L2 = Vh[:r, :]  # [r, out]
            R = w_s - L1 @ L2
            orig = get_in(variables["params"], info.kernel_path)
            variables = {
                **variables,
                "params": set_in(variables["params"], info.kernel_path, R.astype(orig.dtype)),
            }
            dense = tuple(info.dense_path.split("/"))
            quant = variables.get("quant", {})
            quant = set_in(quant, dense + ("input_quantizer", "pre_quant_scale"),
                           (1.0 / s).astype(jnp.float32))
            quant = set_in(quant, dense + ("svd_lora_a",),
                           (L1 / s[:, None]).astype(jnp.float32))
            quant = set_in(quant, dense + ("svd_lora_b",), L2.astype(jnp.float32))
            variables = {**variables, "quant": quant}
    bundle = bundle.replace(variables=variables)
    return max_calibrate(bundle, forward_loop)
