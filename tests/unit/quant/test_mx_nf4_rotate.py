"""MX/NF4 real storage, Hadamard rotation, and NVFP4 4/6
(reference analogues: qtensor/mxfp4_tensor.py, nf4_tensor.py,
config.py RotateConfig + NVFP4_FOUR_OVER_SIX_CFG)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import modelopt_tpu.quant as mtq
from modelopt_tpu.quant.fake_quant import fake_quantize
from modelopt_tpu.quant.qspec import BlockSpec, QuantizerSpec
from modelopt_tpu.quant.qtensor import (
    NF4_TABLE,
    compressible_format,
    dequantize_qtensor,
    quantize_qtensor,
)
from modelopt_tpu.quant.rotation import hadamard_rotate

from tests._test_utils.models import simple_mlp_bundle


def _w(rng, K=128, N=64, scale=0.5):
    return jnp.asarray(rng.standard_normal((K, N)) * scale, jnp.float32)


MX4_SPEC = QuantizerSpec(
    num_bits=(2, 1),
    block=BlockSpec(sizes=((0, 32),), dynamic=True, scale_format="e8m0"),
)
MX8_SPEC = QuantizerSpec(
    num_bits=(4, 3),
    block=BlockSpec(sizes=((0, 32),), dynamic=True, scale_format="e8m0"),
)
NF4_SPEC = QuantizerSpec(
    num_bits=4, variant="nf4", block=BlockSpec(sizes=((0, 8),), dynamic=True),
)


class TestMXStorage:
    def test_format_detection(self, rng):
        assert compressible_format(MX4_SPEC, (128, 64)) == "mxfp4"
        assert compressible_format(MX8_SPEC, (128, 64)) == "mxfp8"
        assert compressible_format(NF4_SPEC, (128, 64)) == "nf4"

    def test_mxfp4_real_matches_fake(self, rng):
        w = _w(rng)
        qt, fmt = quantize_qtensor(w, MX4_SPEC)
        assert fmt == "mxfp4"
        assert qt["data"].dtype == jnp.uint8
        assert qt["data"].shape == (64, 64)  # half rows, packed
        assert qt["scale"].dtype == jnp.uint8  # biased e8m0 exponent
        deq = dequantize_qtensor(qt, MX4_SPEC, w.shape)
        fake = fake_quantize(w, MX4_SPEC)
        np.testing.assert_allclose(np.asarray(deq), np.asarray(fake),
                                   rtol=1e-6, atol=1e-6)

    def test_mxfp8_real_matches_fake(self, rng):
        w = _w(rng)
        qt, fmt = quantize_qtensor(w, MX8_SPEC)
        assert fmt == "mxfp8"
        assert qt["data"].dtype == jnp.float8_e4m3fn
        deq = dequantize_qtensor(qt, MX8_SPEC, w.shape)
        fake = fake_quantize(w, MX8_SPEC)
        np.testing.assert_allclose(np.asarray(deq), np.asarray(fake),
                                   rtol=1e-6, atol=1e-6)

    def test_mx_scales_are_powers_of_two(self, rng):
        w = _w(rng)
        qt, _ = quantize_qtensor(w, MX4_SPEC)
        # decode a biased exponent and check the implied multiplier is 2^e
        e = np.asarray(qt["scale"], np.int32) - 127
        assert e.min() >= -127 and e.max() <= 127

    def test_nf4_roundtrip_error_bounded(self, rng):
        w = _w(rng, K=128, N=32)
        qt, fmt = quantize_qtensor(w, NF4_SPEC)
        assert fmt == "nf4"
        assert set(qt) == {"data", "scale", "scale_zeros", "double_scale"}
        assert qt["scale"].dtype == jnp.int8  # double-quantized absmax
        deq = np.asarray(dequantize_qtensor(qt, NF4_SPEC, w.shape))
        rel = np.linalg.norm(deq - np.asarray(w)) / np.linalg.norm(np.asarray(w))
        assert rel < 0.15  # ~4-bit normal-float error on gaussian data
        # codes hit the table exactly after unscaling
        assert np.asarray(qt["data"]).max() <= 0xFF

    def test_nf4_beats_int4_on_gaussian(self, rng):
        """The normal-float grid is optimal for gaussian weights — at a
        realistic block size (64) its round-trip error must beat uniform
        int4 even though its scales are themselves int8-double-quantized."""
        w = _w(rng, K=1024, N=64)
        nf4 = QuantizerSpec(num_bits=4, variant="nf4",
                            block=BlockSpec(sizes=((0, 64),)))
        int4 = QuantizerSpec(num_bits=4, block=BlockSpec(sizes=((0, 64),)))
        nf4_deq = np.asarray(dequantize_qtensor(
            quantize_qtensor(w, nf4)[0], nf4, w.shape))
        int4_deq = np.asarray(fake_quantize(w, int4))
        werr_nf4 = np.linalg.norm(nf4_deq - np.asarray(w))
        werr_int4 = np.linalg.norm(int4_deq - np.asarray(w))
        assert werr_nf4 < werr_int4


class TestRotation:
    def test_involution(self, rng):
        x = jnp.asarray(rng.standard_normal((4, 128)), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(hadamard_rotate(hadamard_rotate(x))), np.asarray(x),
            rtol=1e-5, atol=1e-5,
        )

    def test_norm_preserved(self, rng):
        x = jnp.asarray(rng.standard_normal((4, 64)), jnp.float32)
        r = hadamard_rotate(x)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(r), axis=-1),
            np.linalg.norm(np.asarray(x), axis=-1), rtol=1e-5,
        )

    def test_rotation_shrinks_outlier_quant_error(self, rng):
        """A single huge outlier wrecks a per-tensor int grid; rotating
        spreads it across the vector first."""
        x = np.asarray(rng.standard_normal((8, 128)), np.float32)
        x[:, 7] = 100.0  # outlier channel
        x = jnp.asarray(x)
        spec = QuantizerSpec(num_bits=4, axis=None, dynamic=True)

        plain = fake_quantize(x, spec)
        rot = hadamard_rotate(fake_quantize(hadamard_rotate(x), spec))
        err_plain = float(jnp.linalg.norm(plain - x))
        err_rot = float(jnp.linalg.norm(rot - x))
        assert err_rot < err_plain * 0.7

    def test_kv_rotate_preset_end_to_end(self, rng):
        """NVFP4_KV_ROTATE quantizes KV/Q in the rotated basis and the
        decoder still runs; output stays close to the unquantized one."""
        from modelopt_tpu.models import Decoder, make_cache, tiny_test_config

        cfg = tiny_test_config()
        module = Decoder(cfg)
        ids = jnp.zeros((2, 8), jnp.int32)
        variables = module.init(jax.random.PRNGKey(0), ids)
        from modelopt_tpu.core import ModelBundle

        bundle = ModelBundle(module=module, variables=dict(variables),
                             example_inputs=(ids,))
        q = mtq.quantize(bundle, mtq.NVFP4_KV_ROTATE_CFG, lambda f: f(ids))
        out_q = q.apply(ids)
        out_b = bundle.apply(ids)
        lq = out_q[0] if isinstance(out_q, tuple) else out_q
        lb = out_b[0] if isinstance(out_b, tuple) else out_b
        rel = float(jnp.linalg.norm(lq - lb) / jnp.linalg.norm(lb))
        assert np.isfinite(rel) and rel < 0.5


class TestFourOverSix:
    def test_46_never_worse_than_plain_nvfp4(self, rng):
        w = jnp.asarray(rng.standard_normal((64, 64)), jnp.float32)
        plain = QuantizerSpec(
            num_bits=(2, 1),
            block=BlockSpec(sizes=((0, 16),), scale_format="e4m3", two_level=True),
        )
        fos = QuantizerSpec(
            num_bits=(2, 1),
            block=BlockSpec(sizes=((0, 16),), scale_format="e4m3",
                            two_level=True, four_over_six=True),
        )
        err_plain = float(jnp.linalg.norm(fake_quantize(w, plain) - w))
        err_fos = float(jnp.linalg.norm(fake_quantize(w, fos) - w))
        # per-block argmin over {6, 4} can only reduce blockwise MSE
        # (modulo the different e4m3 normalization bound) — allow 2% slack
        assert err_fos <= err_plain * 1.02

    def test_46_preset_resolves(self):
        from modelopt_tpu.quant.config import get_config

        cfg = get_config("NVFP4_FOUR_OVER_SIX_CFG")
        specs = cfg.resolve("layers_0/mlp/down_proj/weight_quantizer")
        assert specs and specs[0].block.four_over_six

    def test_preset_count_at_reference_scale(self):
        from modelopt_tpu.quant.config import choices

        assert len(choices) >= 33
