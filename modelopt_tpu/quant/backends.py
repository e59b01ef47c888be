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

from .qspec import QuantizerSpec
from .qtensor import block_of, compressible_format, dequantize_qtensor

# decode-size threshold: above this M the GEMM is compute-bound and the XLA
# bf16 path (dequant once, big matmul) wins
PALLAS_MAX_M = 256


def _pallas_ok(fmt: str, x, kn) -> bool:
    if jax.default_backend() != "tpu":
        return False
    K, N = kn
    if x.shape[0] > PALLAS_MAX_M or N % 128 != 0:
        return False
    if K * N < 2**22:
        return False  # per-call overhead beats the BW win on small GEMMs
    if fmt in ("int4", "nvfp4"):
        K2 = K // 2
        if K % 2 != 0 or K2 % 128 != 0:
            return False
        if fmt == "nvfp4" and K2 % 256 != 0 and K2 != 128:
            return False  # chunked-dequant kernel layout
    if K % 128 != 0:
        return False
    return True


def qgemm(x2d, qt: dict, spec: QuantizerSpec, kn, out_dtype=None):
    """x2d [M, K] @ packed weight -> [M, N]."""
    fmt = compressible_format(spec, kn)
    out_dtype = out_dtype or x2d.dtype
    if fmt is None:
        raise ValueError(f"no compressed format for spec {spec}")
    if _pallas_ok(fmt, x2d, kn):
        from ..kernels import quant_gemm as kq

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
    w = dequantize_qtensor(qt, spec, kn).astype(out_dtype)
    return jnp.dot(x2d.astype(out_dtype), w)
