"""Packed-weight (real-quant) tests: pack/unpack round trips, dequant parity
with fake-quant, and compressed-model equivalence.

(reference analogue: tests/unit/torch/quantization/test_qtensor.py + gpu
real-quant tests)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import modelopt_tpu.quant as mtq
from modelopt_tpu.quant import qtensor as qt
from modelopt_tpu.quant.backends import qgemm
from modelopt_tpu.quant.fake_quant import fake_quantize
from modelopt_tpu.quant.qspec import BlockSpec, QuantizerSpec

from tests._test_utils.models import simple_mlp_bundle


class TestPacking:
    def test_int4_roundtrip(self, rng):
        q = jnp.asarray(rng.integers(-8, 8, (256, 64)), jnp.int32)
        packed = qt.pack_int4(q)
        assert packed.shape == (128, 64) and packed.dtype == jnp.uint8
        np.testing.assert_array_equal(np.asarray(qt.unpack_int4(packed)), np.asarray(q))

    def test_int4_quant_dequant_matches_fake(self, rng):
        w = jnp.asarray(rng.standard_normal((256, 64)), jnp.float32)
        packed = qt.quantize_int4(w, block=128)
        deq = qt.dequantize_int4(packed, block=128)
        spec = QuantizerSpec(num_bits=4, block=BlockSpec(sizes=((0, 128),)))
        fq = fake_quantize(w, spec)
        # both on the amax/7 grid; fake grid clips at [-8,7] too. values match
        # except tie-rounding; bound the disagreement
        mism = np.mean(np.asarray(deq) != np.asarray(fq))
        assert mism < 0.02
        step = np.abs(np.asarray(w)).reshape(2, 128, 64).max(1) / 7
        assert np.abs(np.asarray(deq) - np.asarray(w)).max() <= step.max() * 0.51

    def test_int8_roundtrip(self, rng):
        w = jnp.asarray(rng.standard_normal((64, 32)), jnp.float32)
        deq = qt.dequantize_int8(qt.quantize_int8(w))
        amax = np.abs(np.asarray(w)).max(0)
        assert np.abs(np.asarray(deq) - np.asarray(w)).max() <= (amax / 127 * 0.51).max()

    def test_fp8_roundtrip(self, rng):
        w = jnp.asarray(rng.standard_normal((64, 32)), jnp.float32)
        deq = qt.dequantize_fp8(qt.quantize_fp8(w))
        rel = np.abs(np.asarray(deq) - np.asarray(w)) / np.maximum(np.abs(np.asarray(w)), 1e-6)
        assert np.percentile(rel, 99) < 2**-3

    def test_e2m1_codec(self):
        vals = jnp.asarray([0, 0.5, 1, 1.5, 2, 3, 4, 6, -0.5, -6, -3], jnp.float32)
        codes = qt._encode_e2m1(vals)
        out = qt._decode_e2m1(codes)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(vals))

    def test_nvfp4_quant_dequant(self, rng):
        w = jnp.asarray(rng.standard_normal((256, 64)), jnp.float32)
        packed = qt.quantize_nvfp4(w, block=16)
        assert packed["data"].shape == (128, 64)
        assert packed["scale"].dtype == jnp.float8_e4m3fn
        deq = qt.dequantize_nvfp4(packed, block=16)
        # error bounded by half an e2m1 step at the (quantized) block scale
        eff = packed["scale"].astype(jnp.float32) * packed["scale2"]
        bound = np.repeat(np.asarray(eff), 16, axis=0)  # per-row scale
        err = np.abs(np.asarray(deq) - np.asarray(w))
        assert np.all(err <= bound * 1.01 + 1e-6)


class TestQGemmXLA:
    """Backend dispatch on CPU always takes the XLA path; parity vs dequant."""

    @pytest.mark.parametrize("fmt_spec", [
        ("int4", QuantizerSpec(num_bits=4, block=BlockSpec(sizes=((0, 128),)))),
        ("int8", QuantizerSpec(num_bits=8, axis=(-1,))),
        ("fp8", QuantizerSpec(num_bits=(4, 3))),
        ("nvfp4", QuantizerSpec(num_bits=(2, 1), block=BlockSpec(
            sizes=((0, 16),), dynamic=True, scale_format="e4m3", two_level=True))),
    ])
    def test_qgemm_matches_dequant_matmul(self, fmt_spec, rng):
        fmt, spec = fmt_spec
        K, N, M = 256, 128, 8
        w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
        x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
        packed, fmt2 = qt.quantize_qtensor(w, spec)
        assert fmt2 == fmt
        y = qgemm(x, packed, spec, (K, N), out_dtype=jnp.float32)
        ref = x @ qt.dequantize_qtensor(packed, spec, (K, N))
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=2e-5, atol=2e-4)


class TestCompress:
    def test_compress_mlp(self, rng):
        bundle = simple_mlp_bundle(in_dim=256, hidden=256, out=64)
        x = bundle.example_inputs[0]
        q = mtq.quantize(bundle, mtq.INT4_BLOCKWISE_WEIGHT_ONLY_CFG, lambda f: f(x))
        fq_out = q.apply(x)
        c = mtq.compress(q)
        assert "kernel" not in c.variables["params"]["fc1"]
        assert "qweight" in c.variables["quant"]["fc1"]
        # lm_head excluded -> kernel stays
        assert "kernel" in c.variables["params"]["lm_head"]
        out = c.apply(x)
        rel = float(jnp.linalg.norm(out - fq_out) / jnp.linalg.norm(fq_out))
        assert rel < 5e-3  # fake vs real differ only in tie rounding

    def test_compress_save_restore(self, rng, tmp_path):
        from modelopt_tpu.core import restore, save

        bundle = simple_mlp_bundle(in_dim=256, hidden=256, out=64)
        x = bundle.example_inputs[0]
        q = mtq.quantize(bundle, mtq.INT8_DEFAULT_CFG, lambda f: f(x))
        c = mtq.compress(q)
        out = c.apply(x)
        save(c, str(tmp_path / "ck"))
        r = restore(simple_mlp_bundle(in_dim=256, hidden=256, out=64, seed=5),
                    str(tmp_path / "ck"))
        np.testing.assert_allclose(np.asarray(r.apply(x)), np.asarray(out), rtol=1e-5)

    def test_memory_shrinks(self, rng):
        bundle = simple_mlp_bundle(in_dim=256, hidden=256, out=64)
        x = bundle.example_inputs[0]
        q = mtq.quantize(bundle, mtq.INT4_BLOCKWISE_WEIGHT_ONLY_CFG, lambda f: f(x))
        c = mtq.compress(q)

        def nbytes(tree):
            return sum(v.size * v.dtype.itemsize for v in jax.tree.leaves(tree))

        # fc1+fc2 kernels: fp32 -> uint8 nibbles + f32 block scales (~8x)
        before = nbytes(q.variables["params"]["fc1"]) + nbytes(q.variables["params"]["fc2"])
        after = (
            nbytes(c.variables["params"].get("fc1", {}))
            + nbytes(c.variables["params"].get("fc2", {}))
            + nbytes(c.variables["quant"]["fc1"]["qweight"])
            + nbytes(c.variables["quant"]["fc2"]["qweight"])
        )
        assert after < before / 4
