"""Low-precision floating-point format math, pure JAX.

Replaces the reference's CUDA kernels for generic (E,M) casts
(reference: modelopt/torch/quantization/src in kernels/, tensor_quant_gpu_fp8.cu,
tensor_quant_mx.cu) with vectorized jnp ops that XLA fuses onto the TPU VPU.

All casts use round-to-nearest-even (the hardware convention), support
subnormals, and saturate to the format's max finite value ("fn"-style — no
inf/nan encodings, matching OCP MX and NVFP4 semantics).
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class FPFormat:
    """A miniature floating-point format with E exponent and M mantissa bits.

    ``maxval`` is the largest finite magnitude. For standard "fn" formats
    (all-ones exponent usable, top mantissa code reserved only by e4m3fn)
    this is derived from (E, M); known formats carry their spec values.
    """

    exp_bits: int
    man_bits: int
    maxval: float

    @property
    def bias(self) -> int:
        return 2 ** (self.exp_bits - 1) - 1

    @property
    def emax(self) -> int:
        # Largest usable exponent (unbiased). fn-style: all-ones exponent is
        # a normal value, except e4m3fn whose max is capped at 448 by spec.
        return (2**self.exp_bits - 1) - self.bias

    @property
    def min_normal_exp(self) -> int:
        return 1 - self.bias


# OCP / NVIDIA format table. maxval values follow the OCP MX spec and the
# NVFP4 / FP8 conventions used by the reference
# (reference: modelopt/torch/quantization/qtensor/nvfp4_tensor.py:49,
#  modelopt/torch/quantization/tensor_quant.py:402).
_FORMATS: dict[tuple[int, int], FPFormat] = {
    (2, 1): FPFormat(2, 1, 6.0),        # e2m1  (FP4)
    (3, 2): FPFormat(3, 2, 28.0),       # e3m2  (FP6)
    (2, 3): FPFormat(2, 3, 7.5),        # e2m3  (FP6)
    (4, 3): FPFormat(4, 3, 448.0),      # e4m3fn (FP8)
    (5, 2): FPFormat(5, 2, 57344.0),    # e5m2  (FP8)
    (8, 0): FPFormat(8, 0, 2.0**127),   # e8m0  (MX block scale, power of two)
    (3, 4): FPFormat(3, 4, 30.0),       # e3m4
    (1, 2): FPFormat(1, 2, 3.5),        # e1m2
}


@lru_cache(maxsize=None)
def get_format(exp_bits: int, man_bits: int) -> FPFormat:
    fmt = _FORMATS.get((exp_bits, man_bits))
    if fmt is None:
        # Derive generically: max mantissa (2 - 2^-M), all-ones exponent usable.
        bias = 2 ** (exp_bits - 1) - 1
        emax = (2**exp_bits - 1) - bias
        maxval = float(2.0**emax * (2.0 - 2.0**-man_bits))
        fmt = FPFormat(exp_bits, man_bits, maxval)
    return fmt


def parse_format(name_or_tuple) -> FPFormat:
    """Parse ``"e2m1"`` / ``(2, 1)`` / ``FPFormat`` into an FPFormat.

    Mirrors the reference's num_bits spelling where a tuple (E, M) or a
    string like "e4m3" selects an FP format
    (reference: modelopt/torch/quantization/config.py:329).
    """
    if isinstance(name_or_tuple, FPFormat):
        return name_or_tuple
    if isinstance(name_or_tuple, str):
        s = name_or_tuple.lower()
        if not (s.startswith("e") and "m" in s):
            raise ValueError(f"Unrecognized FP format string: {name_or_tuple!r}")
        e, m = s[1:].split("m")
        return get_format(int(e), int(m))
    if isinstance(name_or_tuple, (tuple, list)) and len(name_or_tuple) == 2:
        return get_format(int(name_or_tuple[0]), int(name_or_tuple[1]))
    raise ValueError(f"Unrecognized FP format spec: {name_or_tuple!r}")


def exp2_int(e: jnp.ndarray) -> jnp.ndarray:
    """Exact 2^e for integer-valued e in [-126, 127], by assembling the
    float32 exponent field. (XLA's exp2 is a polynomial approximation —
    exp2(13.0) != 8192 exactly on some backends, which corrupts quantization
    grids; bit assembly is both exact and cheaper.)"""
    e = jnp.clip(e.astype(jnp.int32), -126, 127)
    return jax.lax.bitcast_convert_type((e + 127) << 23, jnp.float32)


def floor_log2(x: jnp.ndarray) -> jnp.ndarray:
    """Exact floor(log2(|x|)) for normal float32 x, via the exponent field."""
    bits = jax.lax.bitcast_convert_type(jnp.abs(x).astype(jnp.float32), jnp.int32)
    return ((bits >> 23) & 0xFF) - 127


def cast_to_fp(x: jnp.ndarray, fmt: FPFormat) -> jnp.ndarray:
    """Round ``x`` to the nearest representable value of ``fmt`` (RNE), saturating.

    Vectorized exponent-extraction + grid rounding; XLA fuses this into a
    handful of VPU ops. Equivalent in semantics to the reference's
    ``fake_e4m3fy`` / MX-format CUDA kernels
    (reference: modelopt/torch/kernels/quantization/gemm/tensor_quant_gpu_fp8.cu:1,
     gemm/tensor_quant_mx.cu:1).
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    if fmt.man_bits == 0 and fmt.exp_bits == 8:
        # e8m0: strictly powers of two; round log2 to nearest int.
        mag = jnp.abs(xf)
        e = jnp.round(jnp.log2(jnp.maximum(mag, 2.0**-127)))
        e = jnp.clip(e, -127.0, 127.0)
        return jnp.where(mag == 0, 0.0, jnp.sign(xf) * jnp.exp2(e)).astype(orig_dtype)

    # NOTE: we deliberately do NOT use the native float8 round-trip
    # (x.astype(float8_e4m3fn).astype(f32)): under jit on TPU, XLA folds the
    # lossy convert pair into an identity, silently skipping the rounding
    # (observed on jax 0.9.0 / v5e). The arithmetic grid-rounding below is
    # bit-exact vs. the native cast (verified in tests) and fuses into a few
    # VPU ops. Real-quant storage still uses the native dtypes (qtensor.py).
    mag = jnp.abs(xf)
    # IEEE-754 exponent via bit extraction ((bits >> 23) & 0xFF) - 127.
    # (jnp.frexp hangs under jit on the axon TPU platform; bit math is also
    # cheaper — a shift and a mask on the VPU.) Subnormal f32 inputs get
    # e = -127, which after the clip below still rounds them to zero.
    bits = jax.lax.bitcast_convert_type(mag, jnp.int32)
    fe = ((bits >> 23) & 0xFF) - 127
    e = jnp.clip(fe, fmt.min_normal_exp, fmt.emax)
    # Quantization step for this exponent bucket: 2^(e - M), exact.
    step = exp2_int(e - fmt.man_bits)
    q = jnp.round(xf / step) * step  # jnp.round is round-half-to-even
    q = jnp.clip(q, -fmt.maxval, fmt.maxval)
    return jnp.where(mag == 0, 0.0, q).astype(orig_dtype)


def cast_to_fp_numpy(x: np.ndarray, fmt: FPFormat) -> np.ndarray:
    """Pure-numpy reference implementation for parity tests
    (analogous to the reference's pure-PyTorch fallbacks used in
    tests/_test_utils/torch/quantization/tensor_quant_common.py)."""
    xf = np.asarray(x, dtype=np.float32)
    if fmt.man_bits == 0 and fmt.exp_bits == 8:
        mag = np.abs(xf)
        e = np.clip(np.round(np.log2(np.maximum(mag, 2.0**-127))), -127, 127)
        return np.where(mag == 0, 0.0, np.sign(xf) * np.exp2(e)).astype(np.float32)
    mag = np.abs(xf)
    _, fe = np.frexp(np.where(mag == 0, 1.0, mag))
    e = np.clip(fe - 1, fmt.min_normal_exp, fmt.emax)
    step = np.exp2((e - fmt.man_bits).astype(np.float32))
    # numpy round is round-half-to-even, same as jnp
    q = np.round(xf / step) * step
    q = np.clip(q, -fmt.maxval, fmt.maxval)
    return np.where(mag == 0, 0.0, q).astype(np.float32)
