"""Local-Hessian calibration: amax search minimizing the Hessian-weighted
weight error (W-Q(W))ᵀH(W-Q(W)) with per-input-block H = ΣXᵀX — the proxy
for the true output error ||WX - Q(W)X||² that plain MSE ignores
(reference: model_calib.py:1005 local_hessian_calibrate,
_LocalHessianAccumulator :829).

TPU shape of the algorithm: no forward hooks — activations come from ONE
capture-phase pass (algorithms/capture.py), and the whole multiplier sweep
for a layer runs inside a single jitted ``lax.map`` over the ratio grid, so
there is one device sync per layer instead of one per (ratio, element).
The best ratio is chosen PER AMAX ELEMENT (per (input-block, out-channel)
for blockwise specs): the Hessian error decomposes exactly across those
elements, so this matches the reference's per-element search granularity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...core.tree import get_in, set_in
from ..api import max_calibrate, register_calib_algorithm
from ..fake_quant import fake_quantize
from .capture import capture_inputs, quant_linears

# per-tensor Hessians above this cin are prohibitive (cin² f32); such
# layers fall back to plain MSE ratio search, like the reference's
# non-block fallback (model_calib.py _warn_local_hessian_fallback)
_MAX_DENSE_HESSIAN = 1024


def _block_hessian(x, bs: int):
    """x [T, cin] -> H [cin/bs, bs, bs] = per-block ΣXᵀX / T."""
    T, cin = x.shape
    xb = x.astype(jnp.float32).reshape(T, cin // bs, bs)
    return jnp.einsum("tni,tnj->nij", xb, xb) / jnp.float32(T)


@register_calib_algorithm("local_hessian")
def local_hessian_calibrate(
    bundle, forward_loop=None, step_size: float = 0.1,
    start_multiplier: float = 0.25, stop_multiplier: float = 4.0,
    max_tokens: int = 4096,
):
    if forward_loop is None:
        raise ValueError("local_hessian requires a forward_loop")
    # phase 1: max calibration bootstraps every static amax
    bundle = max_calibrate(bundle, forward_loop)
    ratios = jnp.asarray(
        np.arange(start_multiplier, stop_multiplier + 1e-9, step_size),
        jnp.float32,
    )
    captured = capture_inputs(bundle, forward_loop, max_tokens=max_tokens)
    variables = bundle.variables

    for info in quant_linears(bundle, captured):
        wspec = info.wspec
        if wspec is None or not wspec.enable:
            continue
        qpath = tuple(info.dense_path.split("/")) + ("weight_quantizer", "amax")
        cur = get_in(variables.get("quant", {}), qpath)
        if cur is None or info.x is None:
            continue
        w = info.kernel.astype(jnp.float32)  # [cin, cout]
        cin, cout = w.shape
        bs = None
        if wspec.block is not None:
            sizes = dict(wspec.block.sizes)
            bs = sizes.get(0, sizes.get(-2))
        if bs is None:
            bs = cin  # one block = the classic dense Hessian
        if cin % bs != 0 or (bs == cin and cin > _MAX_DENSE_HESSIAN):
            continue  # keep the max/MSE amax (documented fallback)
        H = _block_hessian(info.x, bs)  # [nb, bs, bs]
        nb = cin // bs

        @jax.jit
        def sweep(cur, w=w, H=H, nb=nb, bs=bs, cout=cout, wspec=wspec):
            def err_for(r):
                q = fake_quantize(w, wspec, amax=cur * r)
                e = (q.astype(jnp.float32) - w).reshape(nb, bs, cout)
                # exact decomposition: err[n, o] = e[n,:,o]^T H[n] e[n,:,o]
                return jnp.einsum("nio,nij,njo->no", e, H, e)

            errs = jax.lax.map(err_for, ratios)  # [R, nb, cout]
            # reduce to the amax granularity (matched by SIZE — amax may
            # carry keepdims singleton axes), then argmin over the grid
            if cur.size == nb * cout:
                per = errs
            elif cur.size == cout:
                per = errs.sum(axis=1)
            elif cur.size == nb:
                per = errs.sum(axis=2)
            else:  # per-tensor (size 1) or unrecognized: one global ratio
                per = errs.reshape(errs.shape[0], -1).sum(axis=1)
            best = jnp.take(ratios, jnp.argmin(per, axis=0))
            return cur * best.reshape(cur.shape)

        variables = {
            **variables,
            "quant": set_in(variables["quant"], qpath, sweep(cur)),
        }

    return bundle.replace(variables=variables)
