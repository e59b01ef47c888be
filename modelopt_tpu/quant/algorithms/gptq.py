"""GPTQ: second-order (Hessian-aware) weight quantization with error
compensation, as a pure JAX scan (reference: model_calib.py:2192 gptq,
blockwise inverse-Hessian update :2215-2273).

Per layer: H = X^T X from captured activations; process kernel rows (input
dims) in order — quantize row i on its grid, then push the residual onto the
not-yet-quantized rows via the inverse Hessian.

Grid pinning: the quantization grid is fixed from the ORIGINAL weights and
stored as *static* amax state (the per-layer config rule is flipped to
static block scales), because a dynamic runtime grid recomputed from the
compensated weights would no longer contain them. Rows are quantized with a
symmetric range so no value exceeds its amax and later max-calibration can
never enlarge the stored grid. Supported specs: int/fp per-tensor, per-axis,
and plain block scales (two-level/e8m0 scale formats are excluded — the
reference's GPTQ targets INT4 blocks too).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ...core.tree import get_in, set_in
from ..api import _update_rules, max_calibrate, register_calib_algorithm
from ..fake_quant import _blocked, reduce_amax
from .capture import kernel_for_write, capture_inputs, fq_with_amax, quant_linears, weight_amax_map


def _supported(wspec) -> bool:
    if wspec.block is not None and wspec.block.scale_format is not None:
        return False
    return True


def gptq_update_kernel(w, u, amax_map, wspec):
    """Scan rows of w [in, out]; returns compensated quantized kernel.

    ``u`` is the UPPER Cholesky factor of H^-1 (H^-1 = u^T u) — its row i is
    the conditional inverse over the not-yet-quantized suffix, which is what
    the GPTQ update needs (reference: calib_utils.py update_weights; masking
    rows of the full inverse is NOT equivalent)."""
    n = w.shape[0]
    qspec = (
        dataclasses.replace(wspec, narrow_range=True)
        if not wspec.is_fp
        else wspec
    )

    def body(carry, i):
        W = carry
        w_i = W[i]
        q_i = fq_with_amax(w_i, amax_map[i], qspec)
        err = (w_i - q_i) / jnp.maximum(u[i, i], 1e-12)
        later = (jnp.arange(n) > i).astype(w.dtype)  # only untouched rows
        W = W - (u[i, :] * later)[:, None] * err[None, :]
        W = W.at[i].set(q_i)
        return W, None

    W, _ = jax.lax.scan(body, w, jnp.arange(n))
    return W


@register_calib_algorithm("gptq")
def gptq(bundle, forward_loop=None, damp: float = 0.01, max_tokens: int = 4096,
         layerwise: bool = False):
    """``layerwise=True`` replays capture once per decoder layer so peak
    activation memory is one layer's worth — required for large models
    (reference: layerwise_calibrate, model_calib.py:2051)."""
    if layerwise:
        cfg = getattr(bundle.module, "cfg", None)
        n_layers = getattr(cfg, "num_layers", 0)
        for i in range(n_layers):
            bundle = _gptq_pass(
                bundle, forward_loop, damp, max_tokens,
                path_filter=f"layers_{i}/*",
            )
        return max_calibrate(bundle, forward_loop)
    return _gptq_pass(bundle, forward_loop, damp, max_tokens, finalize=True)


def _gptq_pass(bundle, forward_loop, damp, max_tokens, path_filter=None,
               finalize=False):
    captured = capture_inputs(
        bundle, forward_loop, max_tokens=max_tokens, path_filter=path_filter
    )
    infos = [i for i in quant_linears(bundle, captured) if _supported(i.wspec)]

    def one_layer(x, w, amax_map, *, wspec):
        xf = x.astype(jnp.float32)
        H = xf.T @ xf
        n = H.shape[0]
        H = H + damp * (jnp.trace(H) / n + 1e-6) * jnp.eye(n, dtype=H.dtype)
        L = jnp.linalg.cholesky(H)
        hinv = jax.scipy.linalg.cho_solve((L, True), jnp.eye(n, dtype=H.dtype))
        # symmetrize against cho_solve round-off before the second factorization
        hinv = 0.5 * (hinv + hinv.T)
        u = jnp.linalg.cholesky(hinv).T  # upper: H^-1 = u^T u
        return gptq_update_kernel(w, u, amax_map, wspec)

    variables = bundle.variables
    static_rules = {}
    for info in infos:
        # grid from the ORIGINAL weights (scales fixed before compensation)
        amax_map = weight_amax_map(info.kernel, info.wspec)
        new_w = jax.jit(one_layer, static_argnames=("wspec",))(
            info.x, info.kernel, amax_map, wspec=info.wspec
        )
        orig = get_in(variables["params"], info.kernel_path)
        variables = {
            **variables,
            "params": set_in(
                variables["params"], info.kernel_path,
                kernel_for_write(info, new_w).astype(orig.dtype)
            ),
        }
        # pin the grid: store static amax for the weight quantizer,
        # computed in the KERNEL'S STORED SHAPE (MoE infos fold [E,in,out]
        # to [in,E*out] for the pass; the runtime quantizer reduces the 3-D
        # layout — in-dim blocks map 1:1 between the views)
        wq_path = tuple(info.dense_path.split("/")) + ("weight_quantizer", "amax")
        wspec = info.wspec
        kern_store = kernel_for_write(info, info.kernel)
        if wspec.block is not None:
            xb, _, baxes = _blocked(kern_store, wspec.block)
            amax = jnp.max(jnp.abs(xb), axis=baxes, keepdims=True)
            bs = dict(wspec.block.sizes)
            static_rules[info.dense_path + "/weight_quantizer"] = {
                "block_sizes": {**bs, "type": "static"},
                "narrow_range": not wspec.is_fp,
            }
        elif wspec.axis is not None:
            keep = tuple(a % kern_store.ndim for a in wspec.axis)
            red = tuple(i for i in range(kern_store.ndim) if i not in keep)
            amax = jnp.max(jnp.abs(kern_store), axis=red)
            static_rules[info.dense_path + "/weight_quantizer"] = {
                "narrow_range": not wspec.is_fp
            }
        else:
            amax = jnp.max(jnp.abs(kern_store))
            static_rules[info.dense_path + "/weight_quantizer"] = {
                "narrow_range": not wspec.is_fp
            }
        variables = {
            **variables,
            "quant": set_in(
                variables.get("quant", {}), wq_path, amax.astype(jnp.float32)
            ),
        }
    bundle = bundle.replace(variables=variables)
    if static_rules:
        bundle = _update_rules(bundle, static_rules)
    return max_calibrate(bundle, forward_loop) if finalize else bundle
