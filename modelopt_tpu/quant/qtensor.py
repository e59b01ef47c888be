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
    Codes are offset-binary (q + 8).
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
    """q int in [-8, 7], shape [K, N], K even -> uint8 [K/2, N] split-half."""
    K = q.shape[0]
    assert K % 2 == 0
    lo = (q[: K // 2] + 8).astype(jnp.uint8)
    hi = (q[K // 2 :] + 8).astype(jnp.uint8)
    return lo | (hi << 4)


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    lo = (packed & 0xF).astype(jnp.int32) - 8
    hi = (packed >> 4).astype(jnp.int32) - 8
    return jnp.concatenate([lo, hi], axis=0)


def quantize_int4(w: jnp.ndarray, block: int = 128):
    """w [K, N] -> {'data': uint8 [K/2, N], 'scale': f32 [K/block, N]}.
    Per-(input-block, out-channel) scales; symmetric [-7, 7] grid so the
    packed code -8 is never produced by quantization (headroom for GPTQ)."""
    K, N = w.shape
    assert K % 2 == 0 and (K // 2) % block == 0, (K, block)
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
# Spec-driven dispatch
# ---------------------------------------------------------------------------
def compressible_format(spec: QuantizerSpec, shape) -> str | None:
    """Which packed format (if any) this spec + weight shape maps to."""
    if len(shape) != 2:
        return None
    K, N = shape
    if spec.is_fp:
        fmt = spec.fp_format
        if (fmt.exp_bits, fmt.man_bits) == (4, 3) and spec.block is None:
            return "fp8"
        if (fmt.exp_bits, fmt.man_bits) == (2, 1) and spec.block is not None:
            bs = dict(spec.block.sizes)
            b = bs.get(0, bs.get(-2))
            if b and K % b == 0 and K % 2 == 0 and (K // 2) % b == 0:
                return "nvfp4"
        return None
    if spec.num_bits == 8 and spec.axis is not None:
        return "int8"
    if spec.num_bits == 4 and spec.block is not None:
        bs = dict(spec.block.sizes)
        b = bs.get(0, bs.get(-2))
        if b and K % b == 0 and K % 2 == 0 and (K // 2) % b == 0:
            return "int4"
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
    raise ValueError(f"spec {spec} not compressible")
