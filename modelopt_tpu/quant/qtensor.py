"""Packed (real-quant) weight storage and (de)quantization.

The functional counterpart of the reference's QTensor classes
(reference: modelopt/torch/quantization/qtensor/{base_qtensor,int4_tensor,
fp8_tensor,nvfp4_tensor}.py). A packed weight is a plain dict-of-arrays
pytree — the format is implied by the (static) QuantizerSpec, so no runtime
metadata is needed.

Layout choices are Pallas-friendly (see kernels/quant_gemm.py):
  * INT4: split-half nibble packing — uint8 [K/2, N] where the low nibble
    holds rows [0, K/2) and the high nibble rows [K/2, K). Avoids the
    row-interleave reshape Mosaic can't do; the GEMM just runs two halves.
    Hybrid codes: low nibble offset-binary (q + 8), high nibble
    two's-complement — see pack_int4 for why the w4a8 kernel needs this.
  * NVFP4: same split-half packing of e2m1 sign-magnitude codes; e4m3 block
    scales (per 16 input rows) * one fp32 per-tensor scale
    (reference: nvfp4_tensor.py:88-205).
  * INT8 / FP8: native int8 / float8_e4m3fn arrays + scales.

Scales always carry the *multiplier used to dequantize* (w ≈ code * scale).
"""

from __future__ import annotations

import jax  # noqa: F401 (device_put in callers)
import jax.numpy as jnp
import numpy as np

from .qspec import QuantizerSpec

E2M1_VALUES = np.asarray([0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0], np.float32)


# ---------------------------------------------------------------------------
# INT4 (blockwise along input dim)
# ---------------------------------------------------------------------------
def pack_int4(q: jnp.ndarray) -> jnp.ndarray:
    """q int in [-8, 7], shape [K, N], K even -> uint8 [K/2, N] split-half.

    Hybrid nibble encoding: LOW nibble holds rows [0, K/2) offset-binary
    (q+8); HIGH nibble holds rows [K/2, K) two's-complement (q & 0xF). The
    asymmetry is for the int8-MXU w4a8 kernel: Mosaic's int8 vectors have
    no shifts, but ``bitcast(byte & 0xF0, int8)`` == 16*q exactly when the
    high nibble is two's-complement — so the hi half unpacks with ONE
    bitwise AND and a ``>> 4`` on the i32 accumulator
    (kernels/quant_gemm.py w4a8_gemm)."""
    K = q.shape[0]
    assert K % 2 == 0
    lo = (q[: K // 2] + 8).astype(jnp.uint8)
    hi = (q[K // 2 :] & 0xF).astype(jnp.uint8)
    return lo | (hi << 4)


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    lo = (packed & 0xF).astype(jnp.int32) - 8
    hi = (((packed >> 4).astype(jnp.int32)) ^ 8) - 8  # two's-complement nibble
    return jnp.concatenate([lo, hi], axis=0)


def quantize_int4(w: jnp.ndarray, block: int = 128):
    """w [K, N] -> {'data': uint8 [K/2, N], 'scale': f32 [K/block, N]}.
    Per-(input-block, out-channel) scales; symmetric [-7, 7] grid so the
    packed code -8 is never produced by quantization (headroom for GPTQ)."""
    K, N = w.shape
    # whole scale blocks + even rows for the split-half pack; blocks may
    # straddle the half boundary (the GEMM kernels handle the straddle)
    assert K % 2 == 0 and K % block == 0, (K, block)
    wf = w.astype(jnp.float32)
    wb = wf.reshape(K // block, block, N)
    amax = jnp.max(jnp.abs(wb), axis=1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 7.0
    q = jnp.clip(jnp.round(wb / scale), -8, 7).astype(jnp.int32).reshape(K, N)
    return {"data": pack_int4(q), "scale": scale[:, 0, :]}


def dequantize_int4(qt: dict, block: int = 128) -> jnp.ndarray:
    q = unpack_int4(qt["data"]).astype(jnp.float32)
    K, N = q.shape
    scale = qt["scale"]  # [K/block, N]
    qb = q.reshape(K // block, block, N)
    return (qb * scale[:, None, :]).reshape(K, N)


# ---------------------------------------------------------------------------
# INT8 (per-out-channel or blockwise)
# ---------------------------------------------------------------------------
def quantize_int8(w: jnp.ndarray):
    """w [K, N] -> {'data': int8, 'scale': f32 [1, N]} per-out-channel."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"data": q, "scale": scale}


def dequantize_int8(qt: dict) -> jnp.ndarray:
    return qt["data"].astype(jnp.float32) * qt["scale"]


# ---------------------------------------------------------------------------
# FP8 (per-tensor scale, e4m3 storage)
# ---------------------------------------------------------------------------
def quantize_fp8(w: jnp.ndarray):
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf))
    scale = jnp.maximum(amax, 1e-12) / 448.0
    data = jnp.clip(wf / scale, -448.0, 448.0).astype(jnp.float8_e4m3fn)
    return {"data": data, "scale": scale.reshape(1, 1)}


def dequantize_fp8(qt: dict) -> jnp.ndarray:
    return qt["data"].astype(jnp.float32) * qt["scale"]


# ---------------------------------------------------------------------------
# NVFP4 (e2m1 codes, e4m3 block-16 scales, fp32 per-tensor scale)
# ---------------------------------------------------------------------------
def _encode_e2m1(x: jnp.ndarray) -> jnp.ndarray:
    """x (already scaled into [-6, 6]) -> codes 0..15 (bit3 = sign)."""
    mag = jnp.abs(x)
    table = jnp.asarray(E2M1_VALUES)
    # nearest value in the table, ties to even index (round-half-even on the
    # e2m1 grid) — implemented by midpoint thresholds
    mids = (table[:-1] + table[1:]) / 2.0  # 7 midpoints; > mid rounds up, so
    # exact midpoints round down (toward the smaller magnitude)
    idx = jnp.sum(mag[..., None] > mids, axis=-1)  # 0..7
    sign = (x < 0).astype(jnp.int32)
    return (idx + sign * 8).astype(jnp.uint8)


def _decode_e2m1(codes: jnp.ndarray) -> jnp.ndarray:
    mag = jnp.take(jnp.asarray(E2M1_VALUES), (codes & 7).astype(jnp.int32))
    sign = jnp.where((codes & 8) > 0, -1.0, 1.0)
    return mag * sign


def quantize_nvfp4(w: jnp.ndarray, block: int = 16):
    """w [K, N] -> {'data': uint8 [K/2, N] split-half e2m1 codes,
    'scale': e4m3 [K/block, N], 'scale2': f32 [1, 1]}."""
    K, N = w.shape
    wf = w.astype(jnp.float32)
    wb = wf.reshape(K // block, block, N)
    bamax = jnp.max(jnp.abs(wb), axis=1, keepdims=True)  # [K/b, 1, N]
    tensor_amax = jnp.max(jnp.abs(wf))
    scale2 = jnp.maximum(tensor_amax, 1e-12) / (6.0 * 448.0)
    s1_f = jnp.maximum(bamax, 1e-12) / 6.0 / scale2
    s1 = jnp.clip(s1_f, -448.0, 448.0).astype(jnp.float8_e4m3fn)
    s1_f32 = s1.astype(jnp.float32)
    eff = jnp.maximum(s1_f32 * scale2, 1e-20)  # effective block scale
    scaled = jnp.clip(wb / eff, -6.0, 6.0)
    codes = _encode_e2m1(scaled).reshape(K, N)
    lo = codes[: K // 2]
    hi = codes[K // 2 :]
    return {
        "data": lo | (hi << 4),
        "scale": s1[:, 0, :],
        "scale2": scale2.reshape(1, 1),
    }


def dequantize_nvfp4(qt: dict, block: int = 16) -> jnp.ndarray:
    packed = qt["data"]
    lo = _decode_e2m1(packed & 0xF)
    hi = _decode_e2m1(packed >> 4)
    vals = jnp.concatenate([lo, hi], axis=0)  # [K, N]
    K, N = vals.shape
    scale = qt["scale"].astype(jnp.float32) * qt["scale2"]  # [K/block, N]
    vb = vals.reshape(K // block, block, N)
    return (vb * scale[:, None, :]).reshape(K, N)


# ---------------------------------------------------------------------------
# MXFP4 / MXFP8: OCP MX formats — e8m0 (power-of-two) scales per 32 rows
# (reference: qtensor/mxfp4_tensor.py:38 quantize, :83 dequantize;
# mxfp8_tensor.py. Blocks run along the INPUT dim here — the same layout
# every other packed format in this file uses — vs. the reference's
# flattened last-dim view.)
# ---------------------------------------------------------------------------
def _ceil_log2(x: jnp.ndarray) -> jnp.ndarray:
    """ceil(log2(x)) for positive f32 via exponent-bit extraction — exact
    (jnp.frexp hangs under jit on this platform; exp2/log are approximate)."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    e = ((bits >> 23) & 0xFF) - 127  # floor(log2) for normals
    mantissa = bits & 0x7FFFFF
    return jnp.where(mantissa != 0, e + 1, e)


def _exp2_int(e: jnp.ndarray) -> jnp.ndarray:
    """Exact 2^e for integer e in [-127, 127] (bit assembly; 2^-127 is the
    one subnormal the e8m0 clamp can produce)."""
    normal = jax.lax.bitcast_convert_type(
        jnp.clip(e + 127, 1, 254).astype(jnp.int32) << 23, jnp.float32
    )
    sub = jax.lax.bitcast_convert_type(jnp.int32(0x00400000), jnp.float32)
    return jnp.where(e <= -127, sub, normal)


def _mx_scale(amax: jnp.ndarray, elem_max: float):
    """e8m0 exponent (biased u8) + exact f32 multiplier, per OCP MX:
    e = ceil(log2(amax / elem_max)) clamped to >= -127."""
    descale = jnp.maximum(amax, 1e-38) / elem_max
    e = jnp.maximum(_ceil_log2(descale), -127)
    return (e + 127).astype(jnp.uint8), _exp2_int(e)


def quantize_mxfp4(w: jnp.ndarray, block: int = 32):
    """w [K, N] -> {'data': uint8 [K/2, N] split-half e2m1 codes,
    'scale': uint8 e8m0-biased [K/block, N]}."""
    K, N = w.shape
    wf = w.astype(jnp.float32)
    wb = wf.reshape(K // block, block, N)
    amax = jnp.max(jnp.abs(wb), axis=1, keepdims=True)
    e8m0, mult = _mx_scale(amax, 6.0)
    scaled = jnp.clip(wb / mult, -6.0, 6.0)
    codes = _encode_e2m1(scaled).reshape(K, N)
    return {"data": codes[: K // 2] | (codes[K // 2:] << 4),
            "scale": e8m0[:, 0, :]}


def dequantize_mxfp4(qt: dict, block: int = 32) -> jnp.ndarray:
    packed = qt["data"]
    lo = _decode_e2m1(packed & 0xF)
    hi = _decode_e2m1(packed >> 4)
    vals = jnp.concatenate([lo, hi], axis=0)
    K, N = vals.shape
    mult = _exp2_int(qt["scale"].astype(jnp.int32) - 127)  # [K/block, N]
    return (vals.reshape(K // block, block, N) * mult[:, None, :]).reshape(K, N)


def quantize_mxfp8(w: jnp.ndarray, block: int = 32):
    """w [K, N] -> {'data': e4m3 [K, N], 'scale': uint8 e8m0 [K/block, N]}."""
    K, N = w.shape
    wf = w.astype(jnp.float32)
    wb = wf.reshape(K // block, block, N)
    amax = jnp.max(jnp.abs(wb), axis=1, keepdims=True)
    e8m0, mult = _mx_scale(amax, 448.0)
    data = jnp.clip(wb / mult, -448.0, 448.0).reshape(K, N)
    return {"data": data.astype(jnp.float8_e4m3fn), "scale": e8m0[:, 0, :]}


def dequantize_mxfp8(qt: dict, block: int = 32) -> jnp.ndarray:
    vals = qt["data"].astype(jnp.float32)
    K, N = vals.shape
    mult = _exp2_int(qt["scale"].astype(jnp.int32) - 127)
    return (vals.reshape(K // block, block, N) * mult[:, None, :]).reshape(K, N)


# ---------------------------------------------------------------------------
# NF4: 16-entry normal-float table + double-quantized absmax block scales
# (reference: qtensor/nf4_tensor.py:25 table, :76 quantize,
# :~120 double quantization of scalers)
# ---------------------------------------------------------------------------
NF4_TABLE = np.asarray(
    [-1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
     -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
     0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
     0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
     0.7229568362236023, 1.0], np.float32,
)


def quantize_nf4(w: jnp.ndarray, block: int = 64, scale_block: int = 16):
    """w [K, N] -> {'data': uint8 [K/2, N] split-half nf4 codes,
    'scale': int8 [K/block, N] double-quantized absmax,
    'scale_zeros' f32 [K/(block*scale_block), N], 'double_scale' f32 same} —
    scales are themselves int8-quantized per ``scale_block`` groups with a
    mean offset, the reference's double quantization."""
    K, N = w.shape
    wf = w.astype(jnp.float32)
    wb = wf.reshape(K // block, block, N)
    absmax = jnp.max(jnp.abs(wb), axis=1)  # [K/block, N]
    # double quantization of the scales
    nb = absmax.shape[0]
    sb = absmax.reshape(nb // scale_block, scale_block, N)
    zeros = jnp.mean(sb, axis=1, keepdims=True)
    centered = sb - zeros
    ds = jnp.maximum(jnp.max(jnp.abs(centered), axis=1, keepdims=True), 1e-12) / 127.0
    sq = jnp.clip(jnp.round(centered / ds), -127, 127).astype(jnp.int8)
    # effective dequantized scale used for encoding (so codes match decode)
    eff = jnp.maximum(sq.astype(jnp.float32) * ds + zeros, 1e-12).reshape(nb, 1, N)
    scaled = jnp.clip(wb / eff, -1.0, 1.0)
    table = jnp.asarray(NF4_TABLE)
    mids = (table[:-1] + table[1:]) / 2.0
    codes = jnp.sum(scaled[..., None] > mids, axis=-1).astype(jnp.uint8).reshape(K, N)
    return {
        "data": codes[: K // 2] | (codes[K // 2:] << 4),
        "scale": sq.reshape(nb, N),
        "scale_zeros": zeros[:, 0, :],
        "double_scale": ds[:, 0, :],
    }


def dequantize_nf4(qt: dict, block: int = 64, scale_block: int = 16) -> jnp.ndarray:
    packed = qt["data"]
    table = jnp.asarray(NF4_TABLE)
    lo = jnp.take(table, (packed & 0xF).astype(jnp.int32))
    hi = jnp.take(table, (packed >> 4).astype(jnp.int32))
    vals = jnp.concatenate([lo, hi], axis=0)
    K, N = vals.shape
    nb = K // block
    sq = qt["scale"].astype(jnp.float32).reshape(nb // scale_block, scale_block, N)
    scales = (sq * qt["double_scale"][:, None, :] + qt["scale_zeros"][:, None, :])
    scales = scales.reshape(nb, N)
    return (vals.reshape(nb, block, N) * scales[:, None, :]).reshape(K, N)


# ---------------------------------------------------------------------------
# Spec-driven dispatch
# ---------------------------------------------------------------------------
def compressible_format(spec: QuantizerSpec, shape) -> str | None:
    """Which packed format (if any) this spec + weight shape maps to."""
    if len(shape) != 2:
        return None
    K, N = shape

    def blk_ok(need_half=True):
        bs = dict(spec.block.sizes)
        b = bs.get(0, bs.get(-2), ) or bs.get(-1)
        if not b or K % b != 0:
            return None
        if need_half and (K % 2 != 0 or (K // 2) % b != 0):
            return None
        return b

    if spec.is_fp:
        fmt = spec.fp_format
        if (fmt.exp_bits, fmt.man_bits) == (4, 3):
            if spec.block is None:
                return "fp8"
            if spec.block.scale_format == "e8m0" and blk_ok(need_half=False):
                return "mxfp8"
            return None
        if (fmt.exp_bits, fmt.man_bits) == (2, 1) and spec.block is not None:
            if not blk_ok():
                return None
            if spec.block.scale_format == "e8m0":
                return "mxfp4"
            return "nvfp4"
        return None
    if spec.num_bits == 4 and spec.variant == "nf4" and spec.block is not None:
        b = blk_ok()
        return "nf4" if b and (K // b) % 16 == 0 else None
    if spec.num_bits == 8 and spec.axis is not None:
        return "int8"
    if spec.num_bits == 4 and spec.block is not None:
        # int4 storage only needs even rows + whole scale blocks; blocks
        # straddling the split-half boundary are handled by the kernels
        b = blk_ok(need_half=False)
        return "int4" if b and K % 2 == 0 else None
    return None


def block_of(spec: QuantizerSpec, default=128) -> int:
    bs = dict(spec.block.sizes) if spec.block else {}
    return bs.get(0, bs.get(-2, default))


def quantize_qtensor(w, spec: QuantizerSpec):
    fmt = compressible_format(spec, w.shape)
    if fmt == "int4":
        return quantize_int4(w, block_of(spec)), fmt
    if fmt == "int8":
        return quantize_int8(w), fmt
    if fmt == "fp8":
        return quantize_fp8(w), fmt
    if fmt == "nvfp4":
        return quantize_nvfp4(w, block_of(spec, 16)), fmt
    if fmt == "mxfp4":
        return quantize_mxfp4(w, block_of(spec, 32)), fmt
    if fmt == "mxfp8":
        return quantize_mxfp8(w, block_of(spec, 32)), fmt
    if fmt == "nf4":
        return quantize_nf4(w, block_of(spec, 64)), fmt
    raise ValueError(f"spec {spec} not compressible for shape {w.shape}")


def dequantize_qtensor(qt: dict, spec: QuantizerSpec, shape):
    fmt = compressible_format(spec, shape)
    if fmt == "int4":
        return dequantize_int4(qt, block_of(spec))
    if fmt == "int8":
        return dequantize_int8(qt)
    if fmt == "fp8":
        return dequantize_fp8(qt)
    if fmt == "nvfp4":
        return dequantize_nvfp4(qt, block_of(spec, 16))
    if fmt == "mxfp4":
        return dequantize_mxfp4(qt, block_of(spec, 32))
    if fmt == "mxfp8":
        return dequantize_mxfp8(qt, block_of(spec, 32))
    if fmt == "nf4":
        return dequantize_nf4(qt, block_of(spec, 64))
    raise ValueError(f"spec {spec} not compressible")
