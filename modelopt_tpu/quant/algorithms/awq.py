"""AWQ: activation-aware weight quantization.

awq_lite — per-fused-group grid search over the smoothing exponent a,
minimizing the layer output MSE on captured activations
(reference: model_calib.py:1395 awq_lite).
awq_clip — per-(block, out-channel) search over amax shrink ratios; applied
by hard-clipping weights, which is exactly equivalent under dynamic block
scales (clip(w, r*amax) has block-amax r*amax)
(reference: model_calib.py:1725 awq_clip).
awq_full = awq_lite followed by awq_clip (reference: awq_full mode).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...core.tree import get_in, set_in
from ..api import max_calibrate, register_calib_algorithm
from ..fake_quant import _blocked, fake_quantize
from .capture import (
    capture_inputs,
    kernel_for_write,
    fq_with_amax,
    fused_groups,
    quant_linears,
    weight_amax_map,
)

_EPS = 1e-8


def _group_loss(x, kernels, specs, aspecs, s):
    """Output MSE of a fused group under smoothing scale s (shared input x)."""
    loss = 0.0
    xs = x / s[None, :]
    for kernel, wspec, aspec in zip(kernels, specs, aspecs):
        w_s = kernel * s[:, None]
        amax = weight_amax_map(w_s, wspec)
        wq = fq_with_amax(w_s, amax, wspec)
        xin = xs
        if aspec is not None and aspec.enable:
            xin = fake_quantize(xs, aspec)
        y_ref = x @ kernel
        y_q = xin @ wq
        loss = loss + jnp.mean((y_ref - y_q) ** 2)
    return loss


@register_calib_algorithm("awq_lite")
def awq_lite(
    bundle, forward_loop=None, alpha_step: float = 0.1, max_tokens: int = 1024
):
    captured = capture_inputs(bundle, forward_loop, max_tokens=max_tokens)
    infos = quant_linears(bundle, captured)
    alphas = np.arange(0.0, 1.0 + 1e-6, alpha_step)

    for group in fused_groups(infos):
        x = group[0].x
        kernels = [i.kernel for i in group]
        specs = [i.wspec for i in group]
        aspecs = [i.aspec for i in group]
        act_amax = jnp.maximum(jnp.max(jnp.abs(x), axis=0), _EPS)
        w_amax = jnp.maximum(
            jnp.max(jnp.stack([jnp.max(jnp.abs(k), axis=1) for k in kernels]), 0), _EPS
        )

        @jax.jit
        def loss_of_alpha(alpha):
            s = jnp.clip(act_amax**alpha / w_amax ** (1.0 - alpha), 1e-4, 1e4)
            return _group_loss(x, kernels, specs, aspecs, s)

        losses = [float(loss_of_alpha(jnp.float32(a))) for a in alphas]
        best = float(alphas[int(np.argmin(losses))])
        s = jnp.clip(act_amax**best / w_amax ** (1.0 - best), 1e-4, 1e4)

        variables = bundle.variables
        for info in group:
            orig = get_in(variables["params"], info.kernel_path)
            params = set_in(
                variables["params"], info.kernel_path,
                kernel_for_write(info, info.kernel * s[:, None]).astype(orig.dtype),
            )
            variables = {**variables, "params": params}
            qpath = tuple(info.dense_path.split("/")) + (
                "input_quantizer", "pre_quant_scale",
            )
            quant = set_in(
                variables.get("quant", {}), qpath, (1.0 / s).astype(jnp.float32)
            )
            variables = {**variables, "quant": quant}
        bundle = bundle.replace(variables=variables)
    return max_calibrate(bundle, forward_loop)


@register_calib_algorithm("awq_clip")
def awq_clip(
    bundle, forward_loop=None, max_tokens: int = 1024,
    shrink=(1.0, 0.95, 0.9, 0.85, 0.8, 0.75, 0.7, 0.65, 0.6, 0.55, 0.5),
):
    captured = capture_inputs(bundle, forward_loop, max_tokens=max_tokens)
    infos = quant_linears(bundle, captured)
    shrink = jnp.asarray(shrink, jnp.float32)

    for info in infos:
        wspec = info.wspec
        if wspec.block is None:
            continue  # clip search targets block-quantized weights
        w = info.kernel
        bsizes = dict(wspec.block.sizes)
        if set(ax % w.ndim for ax in bsizes) != {0}:
            continue  # only in-dim weight blocks supported by the search
        wb, unblock, _ = _blocked(w, wspec.block)  # [nb, B, out]
        if wb.ndim != 3:
            continue
        bamax = jnp.max(jnp.abs(wb), axis=1, keepdims=True)  # [nb, 1, out]
        # group x along the in-dim to match the weight blocks: [K, nb, B]
        x = info.x
        K, IN = x.shape
        nb, B = wb.shape[0], wb.shape[1]
        pad = nb * B - IN
        xp = jnp.pad(x, ((0, 0), (0, pad))) if pad else x
        xg = xp.reshape(K, nb, B)
        y_ref = jnp.einsum("knb,nbo->kno", xg, wb)

        @jax.jit
        def loss_of_ratio(r):
            clipped = jnp.clip(wb, -r * bamax, r * bamax)
            # quantize each block with its clipped amax
            wq = fq_with_amax(clipped, jnp.broadcast_to(r * bamax, wb.shape), wspec)
            y = jnp.einsum("knb,nbo->kno", xg, wq)
            return jnp.sum((y - y_ref) ** 2, axis=0)  # [nb, out]

        losses = jnp.stack([loss_of_ratio(r) for r in shrink])  # [R, nb, out]
        best = jnp.argmin(losses, axis=0)  # [nb, out]
        r_best = shrink[best][:, None, :]  # [nb, 1, out]
        w_clipped = unblock(jnp.clip(wb, -r_best * bamax, r_best * bamax))

        orig = get_in(bundle.variables["params"], info.kernel_path)
        params = set_in(
            bundle.variables["params"], info.kernel_path,
            kernel_for_write(info, w_clipped).astype(orig.dtype),
        )
        bundle = bundle.replace(variables={**bundle.variables, "params": params})
    return max_calibrate(bundle, forward_loop)


@register_calib_algorithm("awq_full")
def awq_full(bundle, forward_loop=None, max_tokens: int = 1024, **kw):
    bundle = awq_lite(bundle, forward_loop, max_tokens=max_tokens)
    return awq_clip(bundle, forward_loop, max_tokens=max_tokens)
