import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modelopt_tpu.quant.fake_quant import (
    fake_quant_int,
    fake_quantize,
    reduce_amax,
)
from modelopt_tpu.quant.qspec import BlockSpec, QuantizerSpec


def ref_int_fq(x, amax, num_bits=8, unsigned=False, narrow_range=False):
    bound = 2 ** (num_bits - (0 if unsigned else 1)) - 1
    min_bound = 0 if unsigned else (-bound if narrow_range else -bound - 1)
    scale = bound / np.maximum(np.abs(amax), 1e-24)
    return np.clip(np.round(x * scale), min_bound, bound) / scale


class TestIntFakeQuant:
    def test_per_tensor_parity(self, rng):
        x = rng.standard_normal((64, 32)).astype(np.float32) * 3
        amax = np.float32(np.abs(x).max())
        for bits in (8, 4, 3):
            out = np.asarray(fake_quant_int(jnp.asarray(x), amax, bits))
            np.testing.assert_allclose(out, ref_int_fq(x, amax, bits), rtol=1e-6)

    def test_per_channel(self, rng):
        x = rng.standard_normal((16, 8)).astype(np.float32)
        spec = QuantizerSpec(num_bits=8, axis=(0,))
        amax = np.abs(x).max(axis=1, keepdims=True)
        out = np.asarray(fake_quantize(jnp.asarray(x), spec))
        np.testing.assert_allclose(out, ref_int_fq(x, amax), rtol=1e-6)

    def test_unsigned_narrow(self, rng):
        x = np.abs(rng.standard_normal(128)).astype(np.float32)
        amax = np.float32(x.max())
        out = np.asarray(
            fake_quantize(jnp.asarray(x), QuantizerSpec(num_bits=8, unsigned=True), amax)
        )
        np.testing.assert_allclose(out, ref_int_fq(x, amax, 8, unsigned=True), rtol=1e-6)

    def test_levels_count(self, rng):
        x = rng.standard_normal(10000).astype(np.float32)
        out = np.asarray(fake_quantize(jnp.asarray(x), QuantizerSpec(num_bits=4)))
        assert len(np.unique(out)) <= 16

    def test_ste_gradient(self):
        x = jnp.asarray([-3.0, -0.4, 0.2, 0.9, 2.5])
        amax = jnp.float32(1.0)
        g = jax.grad(lambda x: fake_quant_int(x, amax, 8).sum())(x)
        # gradient 1 inside [-amax*(128/127), amax], 0 outside
        np.testing.assert_allclose(np.asarray(g), [0, 1, 1, 1, 0])

    def test_disabled_identity(self, rng):
        x = jnp.asarray(rng.standard_normal(32).astype(np.float32))
        out = fake_quantize(x, QuantizerSpec(enable=False))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


class TestFPFakeQuant:
    def test_e4m3_per_tensor(self, rng):
        x = rng.standard_normal(4096).astype(np.float32)
        amax = np.float32(np.abs(x).max())
        spec = QuantizerSpec(num_bits=(4, 3))
        out = np.asarray(fake_quantize(jnp.asarray(x), spec, amax))
        scale = 448.0 / amax
        ref = (np.clip(x * scale, -448, 448).astype(jnp.float8_e4m3fn).astype(np.float32)) / scale
        np.testing.assert_allclose(out, ref, rtol=1e-6)

    def test_fp_ste_gradient(self):
        x = jnp.asarray([-600.0, -0.4, 0.2, 0.9, 500.0])
        spec = QuantizerSpec(num_bits=(4, 3))
        g = jax.grad(lambda x: fake_quantize(x, spec, jnp.float32(448.0)).sum())(x)
        np.testing.assert_allclose(np.asarray(g), [0, 1, 1, 1, 0])


class TestBlockQuant:
    def test_nvfp4_dynamic(self, rng):
        # NVFP4: block-16 e2m1 with e4m3 block scales over fp32 tensor scale
        x = rng.standard_normal((8, 64)).astype(np.float32)
        spec = QuantizerSpec(
            num_bits=(2, 1),
            block=BlockSpec(sizes=((-1, 16),), dynamic=True, scale_format="e4m3", two_level=True),
        )
        out = np.asarray(fake_quantize(jnp.asarray(x), spec))
        assert out.shape == x.shape
        # error bounded by half max relative step of e2m1 at block scale
        blocks = x.reshape(8, 4, 16)
        ob = out.reshape(8, 4, 16)
        bmax = np.abs(blocks).max(-1, keepdims=True)
        assert np.all(np.abs(ob - blocks) <= bmax / 6 * 1.01 + 1e-6)
        # each block has at most 15 distinct quantized magnitudes... e2m1 has 8
        for b in ob.reshape(-1, 16):
            assert len(np.unique(np.abs(b))) <= 8

    def test_mxfp8_block32(self, rng):
        x = rng.standard_normal((4, 64)).astype(np.float32) * 10
        spec = QuantizerSpec(
            num_bits=(4, 3),
            block=BlockSpec(sizes=((-1, 32),), dynamic=True, scale_format="e8m0"),
        )
        out = np.asarray(fake_quantize(jnp.asarray(x), spec))
        # power-of-two scales: out/in ratio errors stay within e4m3 relative step
        mask = np.abs(x) > 1e-3
        rel = np.abs(out[mask] - x[mask]) / np.abs(x[mask])
        assert rel.max() < 2 ** -3.0  # half ulp of m3 is 2^-4 per-element; scale round-down doubles

    def test_int4_block128(self, rng):
        x = rng.standard_normal((2, 256)).astype(np.float32)
        spec = QuantizerSpec(num_bits=4, block=BlockSpec(sizes=((-1, 128),), dynamic=True))
        out = np.asarray(fake_quantize(jnp.asarray(x), spec))
        xb = x.reshape(2, 2, 128)
        bmax = np.abs(xb).max(-1, keepdims=True)
        ref = (np.clip(np.round(xb / (bmax / 7)), -8, 7) * (bmax / 7)).reshape(2, 256)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)

    def test_static_block_amax(self, rng):
        x = rng.standard_normal((4, 32)).astype(np.float32)
        spec = QuantizerSpec(
            num_bits=8, block=BlockSpec(sizes=((-1, 16),), dynamic=False)
        )
        amax = np.abs(x.reshape(4, 2, 16)).max(-1, keepdims=True) * 2.0
        out = np.asarray(fake_quantize(jnp.asarray(x), spec, amax=jnp.asarray(amax)))
        xb = x.reshape(4, 2, 16)
        step = amax / 127
        ob = out.reshape(4, 2, 16)
        # outputs sit exactly on the static grid, within half a step of input
        # (exact-tie rounding may differ between XLA's reciprocal-multiply and
        # numpy's divide, so we assert invariants, not bitwise equality)
        codes = ob / step
        np.testing.assert_allclose(codes, np.round(codes), atol=1e-4)
        assert np.all(np.abs(ob - xb) <= 0.5 * step * (1 + 1e-3))


def test_reduce_amax(rng):
    x = rng.standard_normal((4, 8, 16)).astype(np.float32)
    assert reduce_amax(jnp.asarray(x), None, keepdims=False) == np.abs(x).max()
    pc = np.asarray(reduce_amax(jnp.asarray(x), (1,)))
    np.testing.assert_allclose(pc[0, :, 0], np.abs(x).max((0, 2)), rtol=1e-6)


def test_jit_hashable_spec():
    spec = QuantizerSpec(num_bits=(2, 1), block=BlockSpec(sizes=((-1, 16),)))
    f = jax.jit(lambda x: fake_quantize(x, spec))
    x = jnp.ones((4, 32))
    assert f(x).shape == (4, 32)
