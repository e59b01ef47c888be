"""Compressed-GEMM dispatch: Pallas fused dequant-GEMM for the weight-bound
decode regime, XLA dequant+matmul otherwise.

The registry role of the reference's GEMMRegistry
(reference: modelopt/torch/quantization/backends/gemm_registry.py:31,
enable_real_quant_gemm :104). Dispatch is static at trace time (shapes and
backend are trace constants), so each jitted program contains exactly one
path — no runtime branching."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..kernels.quant_gemm import _nvfp4_chunk
from .qspec import QuantizerSpec
from .qtensor import block_of, compressible_format, dequantize_qtensor

# decode-size threshold: above this M the whole-x-in-VMEM kernel layouts
# stop applying. int4 formats have an M-tiled prefill variant instead
# (kernels/quant_gemm.py k_axis=2 grids): the int8-MXU w4a8 path is 2x the
# bf16 FLOP rate AND the XLA dequant fallback materializes the unpacked
# weight (s32) + broadcast scales (f32) in HBM — ~0.7 GB of temps per
# Llama-8B gate_up weight, an OOM hazard at serving shapes.
PALLAS_MAX_M = 256


def _pallas_ok(fmt: str, x, kn, block: int = 128) -> bool:
    if jax.default_backend() != "tpu":
        return False
    K, N = kn
    if N % 128 != 0:
        return False
    if x.shape[0] > PALLAS_MAX_M:
        # large-M (prefill) grids exist for the int4 kernels only, and
        # need a (TM, TN) tiling that fits VMEM with the whole K resident
        from ..kernels.quant_gemm import _pick_prefill_tiles

        if fmt != "int4" or _pick_prefill_tiles(
                K // 2, N, block, x_bytes=2) is None:
            return False
    if K * N < 2**22:
        return False  # per-call overhead beats the BW win on small GEMMs
    if fmt in ("int4", "nvfp4"):
        K2 = K // 2
        # the w4a16 body handles a scale block straddling the split-half
        # boundary; all row slices must stay 8-sublane aligned
        if (K % 2 != 0 or K % block != 0 or block % 8 != 0
                or (K2 % block) % 8 != 0):
            return False
        if fmt == "nvfp4" and (K2 % block != 0 or _nvfp4_chunk(K2, block) is None):
            return False  # chunked-dequant kernel needs a clean chunking
    if K % 128 != 0:
        return False
    return True


def act_backend_quantizes(aspecs) -> bool:
    """True when the input-quantizer spec is exactly the per-token dynamic
    int8 quantization the act_int8 GEMM backends perform on-device — the
    layer can then skip its fake-quant pass entirely (one rounding instead
    of two, and no extra elementwise sweep over the activations)."""
    if not aspecs or len(aspecs) != 1:
        return False
    sp = aspecs[0]
    return bool(
        sp.enable and not sp.is_fp and sp.num_bits == 8 and not sp.rotate
        and sp.block is not None and sp.block.dynamic
        and tuple(sp.block.sizes) == ((-1, 0),)
    )


def _fq_int8_per_token(x2d):
    """Per-token dynamic int8 fake-quant (the act_int8 contract) for
    fallback paths that run the GEMM in bf16."""
    xf = x2d.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=1, keepdims=True), 1e-12) / 127.0
    return (jnp.clip(jnp.round(xf / s), -127, 127) * s).astype(x2d.dtype)


def int8_dynamic_gemm(x2d, data, scale, out_dtype):
    """W8A8 with dynamic per-token int8 activations on the int8 MXU:
    quantize x per row, int8 x int8 -> int32 dot, rescale. 2x the bf16 MXU
    rate on v5e — the compute-bound prefill path for INT8_SQ deployments
    (reference counterpart: torch._scaled_mm fp8/int8 GEMMs,
    backends/fp8_per_tensor_gemm.py)."""
    xf = x2d.astype(jnp.float32)
    xamax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    xscale = jnp.maximum(xamax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / xscale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, data, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return (acc.astype(jnp.float32) * xscale * scale).astype(out_dtype)


def qgemm(x2d, qt: dict, spec: QuantizerSpec, kn, out_dtype=None,
          act_int8: bool = False, act_raw: bool = False):
    """x2d [M, K] @ packed weight -> [M, N]. ``act_int8`` selects the
    int8-MXU paths: dynamic W8A8 for int8 weights (compute-bound shapes),
    the fused W4A8 kernel for int4 weights at decode shapes.

    ``act_raw``: the layer skipped its input fake-quant (the backend owns
    the one-and-only per-token int8 quantization); any path that runs the
    GEMM in bf16 must fake-quant x first to preserve the A8 semantics."""
    fmt = compressible_format(spec, kn)
    out_dtype = out_dtype or x2d.dtype
    if fmt is None:
        raise ValueError(f"no compressed format for spec {spec}")
    if fmt == "int8" and act_int8 and x2d.shape[0] > 256:
        return int8_dynamic_gemm(x2d, qt["data"], qt["scale"], out_dtype)
    if act_int8 and act_raw and fmt != "int4":
        x2d = _fq_int8_per_token(x2d)
        act_raw = False
    if _pallas_ok(fmt, x2d, kn, block_of(spec, 16 if fmt == "nvfp4" else 128)):
        from ..kernels import quant_gemm as kq

        if fmt == "int4" and act_int8:
            # W4A8: per-token dynamic int8 activations ride the int8 MXU —
            # this is THE quantization when the layer passed act_raw
            # (single rounding), or a ~lossless re-quantization of an
            # already-fake-quantized x otherwise.
            # Straddle-block shapes (K2 % block != 0, e.g. K=1408/2880)
            # are handled inside the kernel (_pallas_ok already pins the
            # 8-sublane alignment of the straddle remainder).
            xf = x2d.astype(jnp.float32)
            xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=1, keepdims=True),
                             1e-12) / 127.0
            xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
            # prefill (large M): the kernel emits out_dtype directly so
            # the f32 result tensor never lands in HBM (an OOM hazard at
            # serving shapes); the per-token scale multiply then runs in
            # out_dtype too. Decode keeps the f32 contract.
            acc_dtype = out_dtype if xq.shape[0] > PALLAS_MAX_M \
                else jnp.float32
            out = kq.w4a8_gemm(xq, qt["data"], qt["scale"],
                               block=block_of(spec), out_dtype=acc_dtype)
            return (out * xs.astype(acc_dtype)).astype(out_dtype)
        if fmt == "int4":
            return kq.w4a16_gemm(x2d, qt["data"], qt["scale"],
                                 block=block_of(spec), out_dtype=out_dtype)
        if fmt == "int8":
            return kq.w8a16_gemm(x2d, qt["data"], qt["scale"], out_dtype=out_dtype)
        if fmt == "fp8":
            return kq.wfp8_gemm(x2d, qt["data"], qt["scale"], out_dtype=out_dtype)
        if fmt == "nvfp4":
            return kq.nvfp4_gemm(x2d, qt["data"], qt["scale"], qt["scale2"],
                                 block=block_of(spec, 16), out_dtype=out_dtype)
    if act_int8 and act_raw:
        x2d = _fq_int8_per_token(x2d)  # bf16 fallback still serves A8
    w = dequantize_qtensor(qt, spec, kn).astype(out_dtype)
    return jnp.dot(x2d.astype(out_dtype), w)


def grouped_qgemm(x3, qt: dict, spec: QuantizerSpec, efn, out_dtype=None,
                  act_int8: bool = False, act_raw: bool = False):
    """Per-expert GEMMs for MoE down-projections: x3 [M, E, K] (token-major)
    against a FOLDED packed weight [K, E*N] (quant/compress.py layout where
    expert e's matrix is columns e*N:(e+1)*N). Returns [M, E, N].

    int4 at decode shapes rides the grouped Pallas kernels — one call for
    the whole expert set, packed weights streamed at 4 bits. ``act_int8``
    selects the int8-MXU grouped W4A8 kernel (per-(token, expert) dynamic
    int8 rows, zero-convert nibble unpack — the bf16 grouped kernel is
    VPU-unpack-bound at MoE decode shapes). Everything else falls back to
    dequantize + einsum."""
    E, K, N = efn
    M = x3.shape[0]
    out_dtype = out_dtype or x3.dtype
    fmt = compressible_format(spec, (K, E * N))
    K2 = K // 2
    blk = block_of(spec, 16 if fmt == "nvfp4" else 128)
    grouped_ok = (
        jax.default_backend() == "tpu"
        and M <= PALLAS_MAX_M
        and K % 2 == 0
        and K % blk == 0   # whole scale blocks
        and blk % 8 == 0   # 8-sublane-aligned packed-row slices
        and (K2 % blk) % 8 == 0  # straddle block stays sublane-aligned
        and N % 128 == 0
        and E * K * N >= 2**22  # amortized across the whole expert set
    )
    if fmt == "int4" and grouped_ok and act_int8:
        from ..kernels import quant_gemm as kq

        xe = x3.transpose(1, 0, 2)  # [E, M, K]
        xf = xe.astype(jnp.float32)
        xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=2, keepdims=True),
                         1e-12) / 127.0
        xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
        y = kq.grouped_w4a8_gemm(xq, qt["data"], qt["scale"], N,
                                 block=block_of(spec))
        return (y * xs).astype(out_dtype).transpose(1, 0, 2)
    if fmt == "int4" and grouped_ok:
        from ..kernels import quant_gemm as kq

        if act_int8 and act_raw:
            x3 = _fq_int8_per_token(x3.reshape(M * E, K)).reshape(M, E, K)
        xe = x3.astype(out_dtype).transpose(1, 0, 2)  # [E, M, K]
        y = kq.grouped_w4a16_gemm(xe, qt["data"], qt["scale"], N,
                                  block=block_of(spec), out_dtype=out_dtype)
        return y.transpose(1, 0, 2)
    if (fmt == "nvfp4" and grouped_ok and K2 % blk == 0
            and _nvfp4_chunk(K2, blk) is not None):
        from ..kernels import quant_gemm as kq

        xe = x3.astype(out_dtype).transpose(1, 0, 2)
        y = kq.grouped_nvfp4_gemm(xe, qt["data"], qt["scale"], qt["scale2"],
                                  N, block=block_of(spec, 16),
                                  out_dtype=out_dtype)
        return y.transpose(1, 0, 2)
    if act_int8 and act_raw:
        # bf16 fallback still serves A8: one per-(token, expert) rounding
        x3 = _fq_int8_per_token(x3.reshape(M * E, K)).reshape(M, E, K)
    w = dequantize_qtensor(qt, spec, (K, E * N)).astype(out_dtype)
    w3 = w.reshape(K, E, N)
    return jnp.einsum("meo,oed->med", x3.astype(out_dtype), w3)


def moe_down_qgemm(x3, qt: dict, spec: QuantizerSpec, efn, gates,
                   out_dtype=None, act_int8: bool = False,
                   act_raw: bool = False):
    """MoE down-projection + routed combine in one step:
    ``out[m] = sum_e gates[m, e] * (x3[m, e] @ W[e])`` -> [M, N].

    On the int8-MXU path this is ONE fused kernel
    (grouped_w4a8_combine_gemm): the routing gate folds into the per-row
    activation scale and experts accumulate into a revisited f32 output —
    the [M, E, N] per-expert intermediate never exists. Other formats run
    grouped_qgemm then combine."""
    E, K, N = efn
    M = x3.shape[0]
    out_dtype = out_dtype or x3.dtype
    fmt = compressible_format(spec, (K, E * N))
    K2 = K // 2
    blk = block_of(spec, 16 if fmt == "nvfp4" else 128)
    fused_ok = (
        jax.default_backend() == "tpu"
        and act_int8
        and fmt == "int4"
        and M <= PALLAS_MAX_M
        and K % 2 == 0 and K % blk == 0 and blk % 8 == 0
        and (K2 % blk) % 8 == 0
        and N % 128 == 0
        and E * K * N >= 2**22
    )
    if fused_ok:
        from ..kernels import quant_gemm as kq

        xe = x3.transpose(1, 0, 2)  # [E, M, K]
        xf = xe.astype(jnp.float32)
        xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=2), 1e-12) / 127.0
        xq = jnp.clip(jnp.round(xf / xs[..., None]), -127, 127).astype(jnp.int8)
        gsc = xs * gates.astype(jnp.float32).T  # [E, M]
        y = kq.grouped_w4a8_combine_gemm(xq, gsc, qt["data"], qt["scale"], N,
                                         block=block_of(spec))
        return y.astype(out_dtype)
    y3 = grouped_qgemm(x3, qt, spec, efn, out_dtype=out_dtype,
                       act_int8=act_int8, act_raw=act_raw)
    return jnp.einsum("men,me->mn", y3, gates.astype(out_dtype))
