"""Calibration-algorithm tests: each advanced algorithm must (a) run end to
end through mtq.quantize, (b) preserve/improve quantized output MSE vs plain
max calibration, and (c) keep exact-reparametrization invariants where they
exist (weight-only AWQ smoothing is lossless pre-quantization).

(reference analogue: tests/unit/torch/quantization/test_model_calib.py)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import modelopt_tpu.quant as mtq
from modelopt_tpu.core import ModelBundle
from modelopt_tpu.quant.algorithms.capture import capture_inputs

from tests._test_utils.models import simple_mlp_bundle


def heavy_tailed_bundle(in_dim=32, hidden=64, batch=16, seed=0):
    """MLP fed with outlier-channel activations — the regime where
    smoothquant/awq matter."""
    bundle = simple_mlp_bundle(in_dim=in_dim, batch=batch, hidden=hidden)
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((batch, in_dim)).astype(np.float32)
    x[:, :4] *= 30.0  # channel outliers
    return bundle.replace(example_inputs=(jnp.asarray(x),))


def quant_err(bundle, q, x):
    base = bundle.apply(x)
    out = q.apply(x)
    return float(jnp.linalg.norm(out - base) / jnp.linalg.norm(base))


def loop(x):
    return lambda fn: fn(x)


class TestCapture:
    def test_capture_shapes(self):
        bundle = heavy_tailed_bundle()
        bundle2 = mtq.quantize(bundle, mtq.INT8_DEFAULT_CFG, loop(bundle.example_inputs[0]))
        caps = capture_inputs(bundle2, loop(bundle.example_inputs[0]))
        assert set(caps) == {"fc1", "fc2", "lm_head"}
        assert caps["fc1"].shape == (16, 32)


class TestSmoothQuant:
    def test_improves_int8_outliers(self):
        bundle = heavy_tailed_bundle()
        x = bundle.example_inputs[0]
        q_max = mtq.quantize(bundle, mtq.INT8_DEFAULT_CFG, loop(x))
        q_sq = mtq.quantize(bundle, mtq.INT8_SMOOTHQUANT_CFG, loop(x))
        e_max, e_sq = quant_err(bundle, q_max, x), quant_err(bundle, q_sq, x)
        assert e_sq < e_max
        # pre_quant_scale exists on fc1 input quantizer
        assert "pre_quant_scale" in q_sq.variables["quant"]["fc1"]["input_quantizer"]

    def test_save_restore_with_pqs(self, tmp_path):
        from modelopt_tpu.core import restore, save

        bundle = heavy_tailed_bundle()
        x = bundle.example_inputs[0]
        q = mtq.quantize(bundle, mtq.INT8_SMOOTHQUANT_CFG, loop(x))
        save(q, str(tmp_path / "ck"))
        r = restore(heavy_tailed_bundle(seed=3), str(tmp_path / "ck"))
        np.testing.assert_allclose(
            np.asarray(r.apply(x)), np.asarray(q.apply(x)), rtol=1e-6
        )


class TestAWQ:
    def test_awq_lite_weight_only_exact_reparam(self):
        """With activations unquantized, smoothing must not change the
        unquantized function: (x * pqs) @ (w * s) == x @ w."""
        bundle = heavy_tailed_bundle()
        x = bundle.example_inputs[0]
        q = mtq.quantize(bundle, mtq.INT4_AWQ_CFG, loop(x))
        # rebuild an identical bundle but disable ALL quantizers: outputs
        # must equal the original model (pure reparametrization)
        q_off = mtq.disable_quantizer(q, "*weight_quantizer")
        np.testing.assert_allclose(
            np.asarray(q_off.apply(x)), np.asarray(bundle.apply(x)),
            rtol=2e-3, atol=2e-3,
        )

    def test_awq_lite_beats_max_int4(self):
        bundle = heavy_tailed_bundle()
        x = bundle.example_inputs[0]
        cfg_max = dict(mtq.INT4_AWQ_CFG)
        cfg_max["algorithm"] = "max"
        e_max = quant_err(bundle, mtq.quantize(bundle, cfg_max, loop(x)), x)
        e_awq = quant_err(bundle, mtq.quantize(bundle, mtq.INT4_AWQ_CFG, loop(x)), x)
        assert e_awq <= e_max * 1.001

    def test_awq_clip_runs_and_quantizes(self):
        bundle = heavy_tailed_bundle()
        x = bundle.example_inputs[0]
        q = mtq.quantize(bundle, mtq.INT4_AWQ_CLIP_CFG, loop(x))
        err = quant_err(bundle, q, x)
        assert 0 < err < 0.5

    def test_awq_full(self):
        bundle = heavy_tailed_bundle()
        x = bundle.example_inputs[0]
        q = mtq.quantize(bundle, mtq.INT4_AWQ_FULL_CFG, loop(x))
        assert 0 < quant_err(bundle, q, x) < 0.5


class TestMSE:
    def test_mse_refines_amax(self):
        bundle = heavy_tailed_bundle()
        x = bundle.example_inputs[0]
        cfg = dict(mtq.INT8_DEFAULT_CFG)
        cfg["algorithm"] = "mse"
        q = mtq.quantize(bundle, cfg, loop(x))
        cfg2 = dict(mtq.INT8_DEFAULT_CFG)
        q_max = mtq.quantize(bundle, cfg2, loop(x))
        a_mse = q.variables["quant"]["fc1"]["input_quantizer"]["amax"]
        a_max = q_max.variables["quant"]["fc1"]["input_quantizer"]["amax"]
        assert float(a_mse) <= float(a_max) + 1e-6


class TestLocalHessian:
    """reference: model_calib.py:1005 local_hessian_calibrate — amax search
    under the Hessian-weighted (output-space) error."""

    _CFG = {
        "quant_cfg": {
            "*": {"enable": False},
            "*weight_quantizer": {"enable": True, "num_bits": 4,
                                  "block_sizes": {0: 16, "type": "static"}},
        },
        "algorithm": "local_hessian",
    }

    def test_refines_amax_and_bounds_output_error(self):
        bundle = heavy_tailed_bundle(in_dim=64, hidden=64)
        x = bundle.example_inputs[0]
        cfg_max = {**self._CFG, "algorithm": "max"}
        q_max = mtq.quantize(bundle, cfg_max, loop(x))
        q_lh = mtq.quantize(bundle, self._CFG, loop(x))
        a_max = q_max.variables["quant"]["fc1"]["weight_quantizer"]["amax"]
        a_lh = q_lh.variables["quant"]["fc1"]["weight_quantizer"]["amax"]
        assert a_lh.shape == a_max.shape
        assert not np.allclose(np.asarray(a_lh), np.asarray(a_max))
        # optimizing the output-space (Hessian) error must not lose to max
        # calibration on the actual layer outputs
        e_max = quant_err(bundle, q_max, x)
        e_lh = quant_err(bundle, q_lh, x)
        assert e_lh <= e_max * 1.001, (e_lh, e_max)

    def test_beats_plain_mse_on_correlated_inputs(self):
        """With strongly correlated input channels the Hessian is far from
        diagonal — weight-space MSE optimizes the wrong metric."""
        bundle = simple_mlp_bundle(in_dim=64, batch=32, hidden=64)
        rng = np.random.default_rng(3)
        base = rng.standard_normal((32, 8)).astype(np.float32)
        mix = rng.standard_normal((8, 64)).astype(np.float32)
        x = jnp.asarray(base @ mix + 0.05 * rng.standard_normal((32, 64)).astype(np.float32))
        bundle = bundle.replace(example_inputs=(x,))
        cfg_mse = {**self._CFG, "algorithm": "mse"}
        e_mse = quant_err(bundle, mtq.quantize(bundle, cfg_mse, loop(x)), x)
        e_lh = quant_err(bundle, mtq.quantize(bundle, self._CFG, loop(x)), x)
        assert e_lh <= e_mse * 1.05, (e_lh, e_mse)


class TestGPTQ:
    def test_gptq_beats_rtn_int4(self):
        """GPTQ error compensation should beat round-to-nearest on the
        layer outputs for blockwise INT4."""
        bundle = heavy_tailed_bundle(in_dim=64, hidden=64)
        x = bundle.example_inputs[0]
        cfg_rtn = dict(mtq.INT4_BLOCKWISE_WEIGHT_ONLY_CFG)
        cfg_gptq = dict(mtq.INT4_BLOCKWISE_WEIGHT_ONLY_CFG)
        cfg_gptq["algorithm"] = "gptq"
        e_rtn = quant_err(bundle, mtq.quantize(bundle, cfg_rtn, loop(x)), x)
        e_gptq = quant_err(bundle, mtq.quantize(bundle, cfg_gptq, loop(x)), x)
        assert e_gptq < e_rtn

    def test_gptq_idempotent_grid(self):
        """GPTQ'd kernels are already on the quantization grid."""
        from modelopt_tpu.quant.fake_quant import fake_quantize

        bundle = heavy_tailed_bundle(in_dim=64, hidden=64)
        x = bundle.example_inputs[0]
        cfg = dict(mtq.INT4_BLOCKWISE_WEIGHT_ONLY_CFG)
        cfg["algorithm"] = "gptq"
        q = mtq.quantize(bundle, cfg, loop(x))
        w = q.variables["params"]["fc1"]["kernel"]
        # GPTQ pins the grid static: resolve the UPDATED config and use the
        # stored amax — runtime quantization must be a no-op on the kernel
        spec = mtq.get_config(q.records[-1].config).resolve("fc1/weight_quantizer")[0]
        assert spec.block is not None and not spec.block.dynamic
        amax = q.variables["quant"]["fc1"]["weight_quantizer"]["amax"]
        np.testing.assert_allclose(
            np.asarray(fake_quantize(w, spec, amax=amax)), np.asarray(w),
            rtol=1e-5, atol=1e-6,
        )


class TestLayerwiseGPTQ:
    def test_layerwise_matches_full(self):
        """Layer-by-layer capture replay matches single-pass GPTQ on a real
        decoder (memory-bounded path)."""
        import jax
        from modelopt_tpu.core import ModelBundle
        from modelopt_tpu.models import Decoder, tiny_test_config

        cfg = tiny_test_config(dtype=jnp.float32)
        m = Decoder(cfg)
        ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (4, 16)), jnp.int32)
        variables = m.init(jax.random.PRNGKey(0), ids)
        bundle = ModelBundle(module=m, variables=dict(variables), example_inputs=(ids,))

        base_cfg = dict(mtq.INT4_BLOCKWISE_WEIGHT_ONLY_CFG)
        base_cfg["algorithm"] = "gptq"
        q_full = mtq.quantize(bundle, base_cfg, loop(ids))
        lw_cfg = dict(mtq.INT4_BLOCKWISE_WEIGHT_ONLY_CFG)
        lw_cfg["algorithm"] = {"method": "gptq", "layerwise": True}
        q_lw = mtq.quantize(bundle, lw_cfg, loop(ids))
        w_full = q_full.variables["params"]["layers_0"]["mlp"]["down_proj"]["kernel"]
        w_lw = q_lw.variables["params"]["layers_0"]["mlp"]["down_proj"]["kernel"]
        np.testing.assert_allclose(np.asarray(w_lw), np.asarray(w_full), rtol=1e-5, atol=1e-6)


class TestSVDQuant:
    def test_svdquant_nvfp4(self):
        bundle = heavy_tailed_bundle(in_dim=64, hidden=64)
        x = bundle.example_inputs[0]
        q = mtq.quantize(bundle, mtq.NVFP4_SVDQUANT_CFG, loop(x))
        assert "svd_lora_a" in q.variables["quant"]["fc1"]
        e_svd = quant_err(bundle, q, x)
        e_plain = quant_err(
            bundle, mtq.quantize(bundle, mtq.NVFP4_DEFAULT_CFG, loop(x)), x
        )
        assert e_svd < e_plain
