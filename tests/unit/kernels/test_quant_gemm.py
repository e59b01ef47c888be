"""Pallas dequant-GEMM kernel parity vs the XLA dequant path, run in
interpreter mode on CPU (hardware runs are covered by bench/verify drives).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from modelopt_tpu.kernels import quant_gemm as kq
from modelopt_tpu.quant import qtensor as qt


@pytest.fixture
def interp():
    with pltpu.force_tpu_interpret_mode():
        yield


def test_w4a16_parity(rng, interp):
    K, N, M = 512, 256, 8
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    packed = qt.quantize_int4(w, block=128)
    y = kq.w4a16_gemm(x, packed["data"], packed["scale"], block=128,
                      out_dtype=jnp.float32)
    ref = x.astype(jnp.bfloat16) @ qt.dequantize_int4(packed, 128).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(ref, dtype=np.float32), rtol=2e-2, atol=2e-1
    )


def test_w4a16_odd_m(rng, interp):
    K, N = 256, 128
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((3, K)), jnp.bfloat16)
    packed = qt.quantize_int4(w, block=128)
    y = kq.w4a16_gemm(x, packed["data"], packed["scale"], block=128)
    assert y.shape == (3, N)


def test_w4a8_parity(rng, interp):
    """Int8-MXU W4A8 kernel: exact vs integer reference (the kernel's
    bitcast unpack + rank-1 correction must reproduce dot(x, q) exactly)."""
    K, N, M = 512, 256, 8
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
    xq = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    packed = qt.quantize_int4(w, block=128)
    y = kq.w4a8_gemm(xq, packed["data"], packed["scale"], block=128)
    q = qt.unpack_int4(packed["data"]).astype(jnp.float32)  # [K, N] ints
    scale = jnp.repeat(packed["scale"], 128, axis=0)  # [K, N] per-row scale
    ref = xq.astype(jnp.float32) @ (q * scale)
    # integer dots are exact; the f32 scale-accumulation order differs
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-4, atol=1e-2)


def test_w4a8_straddle_parity(rng, interp):
    """Int8-MXU W4A8 on straddle shapes (K2 % block = block/2): the scale
    block spanning the split-half boundary accumulates a lo-nibble tail and
    hi-nibble head under one scale row, all in int8-MXU math."""
    K, N, M = 704, 128, 8  # block 64: K2=352 -> rem 32 (straddle)
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
    xq = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    packed = qt.quantize_int4(w, block=64)
    y = kq.w4a8_gemm(xq, packed["data"], packed["scale"], block=64)
    q = qt.unpack_int4(packed["data"]).astype(jnp.float32)
    scale = jnp.repeat(packed["scale"], 64, axis=0)
    ref = xq.astype(jnp.float32) @ (q * scale)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-4, atol=1e-2)


def test_w4a8_prefill_mtiled_parity(rng, interp):
    """M > 256 takes the M-tiled (M, N, K) grid — the prefill path that
    keeps serving's 2048-token chunks off the OOM-prone XLA dequant
    fallback. Exact integer math, multiple m-tiles exercised."""
    K, N, M = 512, 256, 600  # pads to 2 m-tiles of 512
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
    xq = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    packed = qt.quantize_int4(w, block=128)
    y = kq.w4a8_gemm(xq, packed["data"], packed["scale"], block=128)
    assert y.shape == (M, N)
    q = qt.unpack_int4(packed["data"]).astype(jnp.float32)
    scale = jnp.repeat(packed["scale"], 128, axis=0)
    ref = xq.astype(jnp.float32) @ (q * scale)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-4,
                               atol=1e-2)


def test_w4a16_prefill_mtiled_parity(rng, interp):
    K, N, M = 512, 256, 300
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    packed = qt.quantize_int4(w, block=128)
    y = kq.w4a16_gemm(x, packed["data"], packed["scale"], block=128,
                      out_dtype=jnp.float32)
    assert y.shape == (M, N)
    ref = x @ qt.dequantize_int4(packed, 128).astype(jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-1)


def test_w8a16_parity(rng, interp):
    K, N, M = 256, 128, 8
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    packed = qt.quantize_int8(w)
    y = kq.w8a16_gemm(x, packed["data"], packed["scale"], out_dtype=jnp.float32)
    ref = x @ qt.dequantize_int8(packed).astype(jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref, np.float32), rtol=2e-2, atol=2e-1)


def test_wfp8_parity(rng, interp):
    K, N, M = 256, 128, 8
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    packed = qt.quantize_fp8(w)
    y = kq.wfp8_gemm(x, packed["data"], packed["scale"], out_dtype=jnp.float32)
    ref = x @ qt.dequantize_fp8(packed).astype(jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref, np.float32), rtol=2e-2, atol=2e-1)


def test_nvfp4_parity(rng, interp):
    K, N, M = 512, 128, 8
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    packed = qt.quantize_nvfp4(w, block=16)
    y = kq.nvfp4_gemm(x, packed["data"], packed["scale"], packed["scale2"],
                      block=16, out_dtype=jnp.float32)
    ref = x @ qt.dequantize_nvfp4(packed, 16).astype(jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref, np.float32), rtol=2e-2, atol=3e-1)


def test_grouped_w4a16_parity(rng, interp):
    """Grouped per-expert kernel matches E independent dequant GEMMs on the
    folded [K, E*N] packed layout."""
    E, K, N, M = 4, 512, 256, 8
    w = jnp.asarray(rng.standard_normal((K, E * N)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((E, M, K)), jnp.bfloat16)
    packed = qt.quantize_int4(w, block=128)
    y = kq.grouped_w4a16_gemm(x, packed["data"], packed["scale"], N,
                              block=128, out_dtype=jnp.float32)
    wd = qt.dequantize_int4(packed, 128).astype(jnp.bfloat16)
    for e in range(E):
        ref = x[e] @ wd[:, e * N:(e + 1) * N]
        np.testing.assert_allclose(
            np.asarray(y[e]), np.asarray(ref, np.float32), rtol=2e-2, atol=2e-1
        )


def test_grouped_w4a16_odd_m(rng, interp):
    E, K, N = 2, 256, 128
    w = jnp.asarray(rng.standard_normal((K, E * N)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((E, 3, K)), jnp.bfloat16)
    packed = qt.quantize_int4(w, block=128)
    y = kq.grouped_w4a16_gemm(x, packed["data"], packed["scale"], N, block=128)
    assert y.shape == (E, 3, N)


def test_grouped_nvfp4_parity(rng, interp):
    E, K, N, M = 2, 512, 128, 8
    w = jnp.asarray(rng.standard_normal((K, E * N)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((E, M, K)), jnp.bfloat16)
    packed = qt.quantize_nvfp4(w, block=16)
    y = kq.grouped_nvfp4_gemm(x, packed["data"], packed["scale"],
                              packed["scale2"], N, block=16,
                              out_dtype=jnp.float32)
    wd = qt.dequantize_nvfp4(packed, 16).astype(jnp.bfloat16)
    for e in range(E):
        ref = x[e] @ wd[:, e * N:(e + 1) * N]
        np.testing.assert_allclose(
            np.asarray(y[e]), np.asarray(ref, np.float32), rtol=2e-2, atol=3e-1
        )


def test_w4a16_straddle_block_parity(rng, interp):
    """K2 % block != 0 (K=1408-class shapes at the default block 128): the
    scale block straddling the split-half boundary accumulates from a
    lo-nibble tail + hi-nibble head."""
    K, N, M = 704, 128, 8  # K2=352, block 128 -> rem 96
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    packed = qt.quantize_int4(w, block=64)
    # block 64: K2=352 -> rem 32 (straddle), still 8-aligned
    y = kq.w4a16_gemm(x, packed["data"], packed["scale"], block=64,
                      out_dtype=jnp.float32)
    ref = x @ qt.dequantize_int4(packed, 64).astype(jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-1)


def test_grouped_w4a16_straddle_parity(rng, interp):
    E, K, N, M = 2, 704, 128, 8
    w = jnp.asarray(rng.standard_normal((K, E * N)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((E, M, K)), jnp.bfloat16)
    packed = qt.quantize_int4(w, block=64)
    y = kq.grouped_w4a16_gemm(x, packed["data"], packed["scale"], N,
                              block=64, out_dtype=jnp.float32)
    wd = qt.dequantize_int4(packed, 64).astype(jnp.bfloat16)
    for e in range(E):
        ref = x[e] @ wd[:, e * N:(e + 1) * N]
        np.testing.assert_allclose(np.asarray(y[e]), np.asarray(ref, np.float32),
                                   rtol=2e-2, atol=2e-1)


def test_nvfp4_adaptive_chunk_parity(rng, interp):
    """K2 not a multiple of 256 (e.g. K=1408 -> K2=704): the kernel picks
    the largest clean chunk (176) instead of refusing."""
    from modelopt_tpu.kernels.quant_gemm import _nvfp4_chunk

    assert _nvfp4_chunk(704, 16) == 176
    K, N, M = 1408, 128, 8
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    packed = qt.quantize_nvfp4(w, block=16)
    y = kq.nvfp4_gemm(x, packed["data"], packed["scale"], packed["scale2"],
                      block=16, out_dtype=jnp.float32)
    ref = x @ qt.dequantize_nvfp4(packed, 16).astype(jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref, np.float32),
                               rtol=2e-2, atol=3e-1)


def test_grouped_w4a8_parity(rng, interp):
    """Grouped int8-MXU W4A8 (all expert down-projections in one kernel)
    against the per-expert dequantized reference — exact int32 math."""
    E, K, N, M = 4, 256, 128, 8
    w = jnp.asarray(rng.standard_normal((K, E * N)), jnp.float32)
    xq = jnp.asarray(rng.integers(-127, 128, (E, M, K)), jnp.int8)
    packed = qt.quantize_int4(w, block=128)
    y = kq.grouped_w4a8_gemm(xq, packed["data"], packed["scale"], N,
                             block=128)
    wd = qt.dequantize_int4(packed, 128)
    for e in range(E):
        ref = xq[e].astype(jnp.float32) @ wd[:, e * N:(e + 1) * N]
        np.testing.assert_allclose(np.asarray(y[e]), np.asarray(ref),
                                   rtol=1e-4, atol=1e-2)


def test_grouped_w4a8_straddle_parity(rng, interp):
    E, K, N, M = 2, 704, 128, 8  # block 64: K2=352 -> rem 32 (straddle)
    w = jnp.asarray(rng.standard_normal((K, E * N)), jnp.float32)
    xq = jnp.asarray(rng.integers(-127, 128, (E, M, K)), jnp.int8)
    packed = qt.quantize_int4(w, block=64)
    y = kq.grouped_w4a8_gemm(xq, packed["data"], packed["scale"], N,
                             block=64)
    wd = qt.dequantize_int4(packed, 64)
    for e in range(E):
        ref = xq[e].astype(jnp.float32) @ wd[:, e * N:(e + 1) * N]
        np.testing.assert_allclose(np.asarray(y[e]), np.asarray(ref),
                                   rtol=1e-4, atol=1e-2)


def test_grouped_w4a8_combine_parity(rng, interp):
    """Fused down-projection + routed combine: one kernel equals the
    per-expert GEMMs followed by the gate-weighted sum."""
    E, K, N, M = 4, 256, 128, 8
    w = jnp.asarray(rng.standard_normal((K, E * N)), jnp.float32)
    xq = jnp.asarray(rng.integers(-127, 128, (E, M, K)), jnp.int8)
    gs = jnp.asarray(rng.standard_normal((E, M)), jnp.float32)
    packed = qt.quantize_int4(w, block=128)
    y = kq.grouped_w4a8_combine_gemm(xq, gs, packed["data"], packed["scale"],
                                     N, block=128)
    wd = qt.dequantize_int4(packed, 128)
    ref = sum(
        gs[e][:, None] * (xq[e].astype(jnp.float32) @ wd[:, e * N:(e + 1) * N])
        for e in range(E)
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-4, atol=1e-2)


def test_w4a8_explicit_out_dtype_kwarg(rng, interp):
    """out_dtype must be jit-STATIC: an explicitly passed dtype kwarg once
    TypeError'd every backend call on chip (CPU tests used the default and
    missed it)."""
    K, N = 512, 256
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
    packed = qt.quantize_int4(w, block=128)
    xq = jnp.asarray(rng.integers(-127, 128, (300, K)), jnp.int8)
    y = kq.w4a8_gemm(xq, packed["data"], packed["scale"], block=128,
                     out_dtype=jnp.bfloat16)
    assert y.dtype == jnp.bfloat16 and y.shape == (300, N)
    y2 = kq.w4a8_gemm(xq[:8], packed["data"], packed["scale"], block=128,
                      out_dtype=jnp.float32)
    assert y2.dtype == jnp.float32
