"""On-demand build + ctypes bindings for the native packing extension
(reference: modelopt/torch/utils/cpp_extension.py:33 load_cpp_extension /
the cppimport ext in onnx/quantization/src). pybind11 is unavailable here,
so bindings go through ctypes on contiguous numpy arrays.

All entry points have pure-numpy fallbacks; ``available()`` reports whether
the native path compiled.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_LIB = None
_TRIED = False


def _build() -> str | None:
    src = os.path.join(os.path.dirname(__file__), "pack_ext.cpp")
    with open(src, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:12]
    out = os.path.join(tempfile.gettempdir(), f"modelopt_pack_{tag}.so")
    if os.path.exists(out):
        return out
    for cc in ("g++", "c++", "clang++"):
        try:
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", out],
                check=True, capture_output=True, timeout=120,
            )
            return out
        except Exception:
            continue
    return None


def _lib():
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        _TRIED = True
        path = _build()
        if path:
            lib = ctypes.CDLL(path)
            i64, f32p = ctypes.c_int64, ctypes.POINTER(ctypes.c_float)
            u8p, i8p = ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int8)
            lib.round_and_pack_int4.argtypes = [f32p, i64, i64, i64, u8p, f32p]
            lib.pack_int4_nibbles.argtypes = [i8p, i64, u8p]
            lib.unpack_int4_nibbles.argtypes = [u8p, i64, i8p]
            lib.quantize_int8_rows.argtypes = [f32p, i64, i64, i8p, f32p]
            _LIB = lib
    return _LIB


def available() -> bool:
    return _lib() is not None


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def round_and_pack_int4(w: np.ndarray, group: int):
    """w [O, I] f32 -> (packed uint8 [O/2, I], scales f32 [O, I/group]).

    Reference layout (quant_utils.py:790 pack_int4_in_uint8): two's-complement
    nibbles over OUTPUT-channel pairs — byte[j, i] holds out-channel 2j in the
    low nibble and 2j+1 in the high nibble."""
    w = np.ascontiguousarray(w, np.float32)
    O, I = w.shape
    assert O % 2 == 0 and I % group == 0
    lib = _lib()
    if lib is not None:
        packed = np.empty((O // 2, I), np.uint8)
        scales = np.empty((O, I // group), np.float32)
        lib.round_and_pack_int4(
            _ptr(w, ctypes.c_float), O, I, group,
            _ptr(packed, ctypes.c_uint8), _ptr(scales, ctypes.c_float),
        )
        return packed, scales
    # numpy fallback
    wb = w.reshape(O, I // group, group)
    scales = (np.maximum(np.abs(wb).max(-1), 1e-12) / 7.0).astype(np.float32)
    q = np.clip(np.rint(wb / scales[..., None]), -8, 7).astype(np.int8).reshape(O, I)
    packed = ((q[0::2] & 0xF) | ((q[1::2] & 0xF) << 4)).astype(np.uint8)
    return packed, scales


def unpack_int4(packed: np.ndarray) -> np.ndarray:
    packed = np.ascontiguousarray(packed, np.uint8)
    n = packed.size
    lib = _lib()
    if lib is not None:
        out = np.empty(n * 2, np.int8)
        lib.unpack_int4_nibbles(_ptr(packed.reshape(-1), ctypes.c_uint8), n, _ptr(out, ctypes.c_int8))
        return out.reshape(*packed.shape[:-1], packed.shape[-1] * 2)
    lo = (packed & 0xF).astype(np.int8) - 8
    hi = (packed >> 4).astype(np.int8) - 8
    out = np.empty((*packed.shape[:-1], packed.shape[-1] * 2), np.int8)
    out[..., 0::2] = lo
    out[..., 1::2] = hi
    return out


def quantize_int8_rows(w: np.ndarray):
    w = np.ascontiguousarray(w, np.float32)
    O, I = w.shape
    lib = _lib()
    if lib is not None:
        out = np.empty((O, I), np.int8)
        scales = np.empty((O,), np.float32)
        lib.quantize_int8_rows(
            _ptr(w, ctypes.c_float), O, I, _ptr(out, ctypes.c_int8),
            _ptr(scales, ctypes.c_float),
        )
        return out, scales
    s = np.maximum(np.abs(w).max(1), 1e-12) / 127.0
    q = np.clip(np.rint(w / s[:, None]), -127, 127).astype(np.int8)
    return q, s.astype(np.float32)
