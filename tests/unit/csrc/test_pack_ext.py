"""Native packing extension: builds, matches the numpy fallback bit-exactly
(reference analogue: the cppimport round_and_pack ext tests)."""

import numpy as np
import pytest

from modelopt_tpu import csrc


def test_extension_builds():
    assert csrc.available(), "native pack extension failed to compile"


def test_round_and_pack_matches_numpy(rng):
    w = rng.standard_normal((32, 256)).astype(np.float32)
    packed, scales = csrc.round_and_pack_int4(w, 128)
    # force the numpy fallback for comparison
    lib = csrc._LIB
    try:
        csrc._LIB = None
        csrc._TRIED = True
        packed_np, scales_np = csrc.round_and_pack_int4(w, 128)
    finally:
        csrc._LIB = lib
    np.testing.assert_array_equal(scales, scales_np)
    np.testing.assert_array_equal(packed, packed_np)


def test_unpack_roundtrip(rng):
    q = rng.integers(-8, 8, (16, 64)).astype(np.int8)
    packed = ((q[:, 0::2] + 8) | ((q[:, 1::2] + 8) << 4)).astype(np.uint8)
    out = csrc.unpack_int4(packed)
    np.testing.assert_array_equal(out, q)


def test_int8_rows(rng):
    w = rng.standard_normal((16, 64)).astype(np.float32)
    q, s = csrc.quantize_int8_rows(w)
    deq = q.astype(np.float32) * s[:, None]
    assert np.abs(deq - w).max() <= (np.abs(w).max(1) / 127 * 0.51).max() + 1e-7


def test_dequant_error_bound(rng):
    w = rng.standard_normal((8, 256)).astype(np.float32)
    packed, scales = csrc.round_and_pack_int4(w, 128)
    assert packed.shape == (4, 256)  # [O/2, I] reference pack_int4_in_uint8
    lo = (packed & 0xF).astype(np.int8)
    hi = (packed >> 4).astype(np.int8)
    lo = np.where(lo >= 8, lo - 16, lo)  # two's-complement nibbles
    hi = np.where(hi >= 8, hi - 16, hi)
    q = np.zeros((8, 256), np.float32)
    q[0::2] = lo
    q[1::2] = hi
    deq = (q.reshape(8, 2, 128) * scales[..., None]).reshape(8, 256)
    step = np.repeat(scales, 128, axis=1)
    assert np.all(np.abs(deq - w) <= step * 0.51 + 1e-7)
