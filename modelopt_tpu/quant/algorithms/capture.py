"""Shared infrastructure for layer-wise calibration algorithms:
input capture, fused-group discovery, and per-linear metadata.

(reference: the activation-caching forward hooks + fused-sibling grouping in
modelopt/torch/quantization/model_calib.py:1395,1171 and
algorithms.py:641-657)
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ...core.bundle import PHASE_CAPTURE, ModelBundle
from ...core.tree import flatten_with_paths, get_in
from ..config import QuantizeConfig, get_config
from ..qspec import QuantizerSpec

# Sibling projections that deployment fuses into one GEMM must share
# pre-quant scales (reference: algorithms.py:641, quant_utils.py:1339).
FUSION_GROUPS = (("q_proj", "k_proj", "v_proj"), ("gate_proj", "up_proj"))


def active_config(bundle: ModelBundle) -> QuantizeConfig:
    for rec in reversed(bundle.records):
        if rec.mode == "quantize":
            return get_config(rec.config)
    raise ValueError("bundle has no quantize mode applied")


def capture_inputs(
    bundle: ModelBundle, forward_loop=None, max_tokens: int = 2048,
    path_filter: Optional[str] = None,
) -> dict:
    """Run forward passes in CAPTURE phase; return
    {dense_path: x [K, in_features] fp32} with K <= max_tokens.

    ``path_filter`` (fnmatch on quantizer paths) restricts capture to a
    subset of layers — the memory-bounded layerwise replay: call once per
    decoder layer instead of holding every layer's activations at once
    (reference: layerwise_calibrate, model_calib.py:2051)."""
    import contextlib

    from ...nn.quantizer import _CAPTURE_FILTER

    step = jax.jit(bundle.make_fn(phase=PHASE_CAPTURE, mutable=["quant_capture"]))
    acc: dict[str, list] = {}

    @contextlib.contextmanager
    def _filter_ctx():
        tok = _CAPTURE_FILTER.set(path_filter)
        try:
            yield
        finally:
            _CAPTURE_FILTER.reset(tok)

    def model_fn(*args, **kwargs):
        with _filter_ctx():
            out, muts = step(bundle.variables, *args, **kwargs)
        for path, val in flatten_with_paths(muts.get("quant_capture", {})):
            # path: .../<dense>/input_quantizer/x ; sow values arrive as tuples
            vals = val if isinstance(val, tuple) else (val,)
            dense_path = path.rsplit("/input_quantizer/", 1)[0]
            acc.setdefault(dense_path, []).extend(vals)
        return out

    if forward_loop is not None:
        forward_loop(model_fn)
    else:
        if not bundle.example_inputs:
            raise ValueError("capture needs a forward_loop or example_inputs")
        model_fn(*bundle.example_inputs)

    out = {}
    for path, chunks in acc.items():
        x = jnp.concatenate(chunks, axis=0).astype(jnp.float32)
        n = x.shape[0]
        if n > max_tokens:
            stride = n // max_tokens
            x = x[::stride][:max_tokens]
        out[path] = x
    return out


@dataclasses.dataclass
class LinearInfo:
    dense_path: str
    kernel_path: tuple  # path inside variables['params']
    kernel: jnp.ndarray  # [in, out] (MoE experts: the 2-D folded view)
    wspec: Optional[QuantizerSpec]  # first weight-quantizer spec (or None)
    aspec: Optional[QuantizerSpec]  # input-quantizer spec (or None)
    x: Optional[jnp.ndarray] = None  # captured input [K, in]
    # MoE expert einsums [E, in, out] participate through a FOLDED 2-D view
    # [in, E*out]: the pre-quant/smoothing scale lives on the (shared)
    # input, so one in-dim scale serving all experts is exactly the
    # deployable semantics; write-backs unfold via kernel_for_write.
    moe_shape: Optional[tuple] = None  # (E, in, out) when folded


def kernel_for_write(info: "LinearInfo", new_w: jnp.ndarray) -> jnp.ndarray:
    """Unfold a (possibly MoE-folded) kernel back to its stored shape."""
    if info.moe_shape is None:
        return new_w
    E, fin, fout = info.moe_shape
    return new_w.reshape(fin, E, fout).transpose(1, 0, 2)


def quant_linears(bundle: ModelBundle, captured: dict) -> list[LinearInfo]:
    """Assemble per-linear metadata for every captured kernel whose weight
    quantizer is enabled. 3-D MoE expert kernels participate through a
    folded 2-D view (see LinearInfo.moe_shape)."""
    cfg = active_config(bundle)
    infos = []
    for dense_path, x in captured.items():
        kpath = tuple(dense_path.split("/")) + ("kernel",)
        kernel = get_in(bundle.variables.get("params", {}), kpath)
        if kernel is None or kernel.ndim not in (2, 3):
            continue
        wspecs = cfg.resolve(dense_path + "/weight_quantizer")
        aspecs = cfg.resolve(dense_path + "/input_quantizer")
        wspec = wspecs[0] if wspecs else None
        aspec = aspecs[0] if aspecs else None
        if wspec is None or not wspec.enable:
            continue
        moe_shape = None
        if kernel.ndim == 3:
            # MoE expert kernel [E, in, out] -> folded [in, E*out]. Only
            # negative-axis specs carry over unchanged (in = -2, out = -1
            # in both views); positive axes (explicit per-expert dims)
            # don't fold — skip those.
            def _axes(spec):
                axes = tuple(spec.axis or ())
                blk = spec.block
                if blk is not None:
                    sizes = blk.sizes if hasattr(blk, "sizes") else blk
                    pairs = sizes.items() if hasattr(sizes, "items") else sizes
                    axes = axes + tuple(int(a) for a, _ in pairs)
                return axes

            if any(a >= 0 for a in _axes(wspec)):
                continue
            E, fin, fout = kernel.shape
            moe_shape = (E, fin, fout)
            kernel = kernel.transpose(1, 0, 2).reshape(fin, E * fout)
            if x is not None and x.shape[-1] != fin:
                continue  # captured input doesn't feed this kernel shape
        infos.append(
            LinearInfo(
                dense_path=dense_path, kernel_path=kpath,
                kernel=kernel.astype(jnp.float32), wspec=wspec, aspec=aspec,
                x=x, moe_shape=moe_shape,
            )
        )
    return infos


def fused_groups(infos: list[LinearInfo]) -> list[list[LinearInfo]]:
    """Group linears whose inputs are shared and fused at deployment."""
    groups: dict = {}
    for info in infos:
        parent, _, leaf = info.dense_path.rpartition("/")
        key = (parent, leaf)
        for g in FUSION_GROUPS:
            if leaf in g:
                key = (parent, g)
                break
        groups.setdefault(key, []).append(info)
    return list(groups.values())


def weight_amax_map(w: jnp.ndarray, spec: QuantizerSpec) -> jnp.ndarray:
    """Elementwise amax (broadcast to w's shape) implied by ``spec`` —
    the static quantization grid every element of w falls into."""
    from ..fake_quant import _blocked, reduce_amax

    if spec.block is not None:
        xb, unblock, baxes = _blocked(w, spec.block)
        amax = jnp.max(jnp.abs(xb), axis=baxes, keepdims=True)
        return unblock(jnp.broadcast_to(amax, xb.shape))
    if spec.axis is None:
        return jnp.broadcast_to(jnp.max(jnp.abs(w)), w.shape)
    return jnp.broadcast_to(reduce_amax(w, spec.axis, keepdims=True), w.shape)


def fq_with_amax(w, amax, spec: QuantizerSpec):
    """Fake-quantize with an explicit elementwise amax grid (used by search
    algorithms that perturb scales)."""
    from ..fake_quant import fake_quant_fp, fake_quant_int

    if spec.is_fp:
        return fake_quant_fp(w, amax, spec.fp_format)
    return fake_quant_int(w, amax, spec.num_bits, spec.unsigned, spec.narrow_range)
