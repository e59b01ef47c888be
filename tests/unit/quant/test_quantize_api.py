"""End-to-end quantize()/calibrate() API tests, mirroring
reference tests/unit/torch/quantization/test_quantize_cpu.py in spirit."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import modelopt_tpu.quant as mtq
from modelopt_tpu.core import ModelBundle, modelopt_state, restore_from_modelopt_state, save, restore
from modelopt_tpu.quant.fake_quant import fake_quant_int

from tests._test_utils.models import simple_mlp_bundle


def calib_loop(batches):
    def loop(model_fn):
        for b in batches:
            model_fn(b)

    return loop


class TestQuantizeAPI:
    def test_int8_default_collects_amax(self, rng):
        bundle = simple_mlp_bundle()
        batches = [jnp.asarray(rng.standard_normal((4, 16), dtype=np.float32) * s) for s in (1, 3)]
        q = mtq.quantize(bundle, mtq.INT8_DEFAULT_CFG, calib_loop(batches))
        quant = q.variables["quant"]
        # input amax of fc1 = max |x| over both batches
        a = np.asarray(quant["fc1"]["input_quantizer"]["amax"])
        expected = max(float(jnp.abs(b).max()) for b in batches)
        assert a == pytest.approx(expected, rel=1e-6)
        # weight amax per out-channel
        w = np.asarray(bundle.variables["params"]["fc1"]["kernel"])
        wa = np.asarray(quant["fc1"]["weight_quantizer"]["amax"])
        np.testing.assert_allclose(wa, np.abs(w).max(0), rtol=1e-6)
        # lm_head excluded by preset
        assert "lm_head" not in quant

    def test_quantized_output_matches_manual(self, rng):
        bundle = simple_mlp_bundle()
        x = jnp.asarray(rng.standard_normal((4, 16), dtype=np.float32))
        q = mtq.quantize(bundle, mtq.INT8_WEIGHT_ONLY_CFG, calib_loop([x]))
        out = q.apply(x)
        # manual: fake-quant each kernel per-out-channel, plain forward
        p = q.variables["params"]

        def fq(k):
            amax = jnp.abs(k).max(0, keepdims=True)
            return fake_quant_int(k, amax, 8)

        h = jnp.maximum(x @ fq(p["fc1"]["kernel"]) + p["fc1"]["bias"], 0)
        h = h @ fq(p["fc2"]["kernel"]) + p["fc2"]["bias"]
        s = p["norm"]["scale"]
        h32 = h.astype(jnp.float32)
        h = (h32 * jax.lax.rsqrt(jnp.mean(h32**2, -1, keepdims=True) + 1e-6)) * s
        h = h @ p["lm_head"]["kernel"] + p["lm_head"]["bias"]  # unquantized
        np.testing.assert_allclose(np.asarray(out), np.asarray(h), rtol=1e-4, atol=1e-5)

    def test_unquantized_model_unchanged(self, rng):
        bundle = simple_mlp_bundle()
        x = bundle.example_inputs[0]
        base = bundle.apply(x)
        q = mtq.quantize(bundle, mtq.INT8_DEFAULT_CFG, calib_loop([x]))
        # original bundle still produces identical outputs (purity)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(bundle.apply(x)))
        # quantized differs
        assert not np.allclose(np.asarray(base), np.asarray(q.apply(x)))

    def test_disable_quantizer(self, rng):
        bundle = simple_mlp_bundle()
        x = bundle.example_inputs[0]
        base = bundle.apply(x)
        q = mtq.quantize(bundle, mtq.INT8_DEFAULT_CFG, calib_loop([x]))
        q_off = mtq.disable_quantizer(q, "*")
        np.testing.assert_allclose(np.asarray(q_off.apply(x)), np.asarray(base), rtol=1e-6)

    def test_weight_only_no_forward_loop(self):
        bundle = simple_mlp_bundle()
        q = mtq.quantize(bundle, mtq.INT4_BLOCKWISE_WEIGHT_ONLY_CFG, None)
        # dynamic block weights: no amax needed, applies fine
        out = q.apply(bundle.example_inputs[0])
        assert out.shape == (4, 16)

    def test_sequential_w4a8(self, rng):
        bundle = simple_mlp_bundle()
        x = bundle.example_inputs[0]
        cfg = dict(mtq.W4A8_AWQ_BETA_CFG)
        cfg["algorithm"] = "max"  # awq tested separately
        q = mtq.quantize(bundle, cfg, calib_loop([x]))
        quant = q.variables["quant"]
        # both amax entries exist for the sequential weight quantizer chain:
        # int4-block (dynamic -> no amax var) then fp8 per-tensor (amax_1)
        assert "amax_1" in quant["fc1"]["weight_quantizer"]
        out = q.apply(x)
        assert out.shape == (4, 16)

    def test_summary_and_specs(self, rng, capsys):
        bundle = simple_mlp_bundle()
        q = mtq.quantize(bundle, mtq.NVFP4_DEFAULT_CFG, calib_loop([bundle.example_inputs[0]]))
        specs = dict(mtq.quantizer_specs(q))
        assert specs["fc1/weight_quantizer"] is not None
        assert specs["lm_head/weight_quantizer"] is None
        text = mtq.print_quant_summary(q)
        assert "fc1/weight_quantizer" in text and "e2m1" in text


class TestSaveRestore:
    def test_state_roundtrip(self, rng, tmp_path):
        bundle = simple_mlp_bundle()
        x = bundle.example_inputs[0]
        q = mtq.quantize(bundle, mtq.FP8_DEFAULT_CFG, calib_loop([x]))
        state = modelopt_state(q)
        fresh = simple_mlp_bundle()
        r = restore_from_modelopt_state(fresh, state)
        assert len(r.records) == 1
        assert r.records[0].config == q.records[0].config

    def test_save_restore_files(self, rng, tmp_path):
        bundle = simple_mlp_bundle()
        x = bundle.example_inputs[0]
        q = mtq.quantize(bundle, mtq.INT8_DEFAULT_CFG, calib_loop([x]))
        out_q = q.apply(x)
        save(q, str(tmp_path / "ckpt"))
        fresh = simple_mlp_bundle(seed=99)  # different weights, replaced on load
        r = restore(fresh, str(tmp_path / "ckpt"))
        np.testing.assert_allclose(
            np.asarray(r.apply(x)), np.asarray(out_q), rtol=1e-6
        )

    def test_restore_rejects_mismatched_architecture(self, rng, tmp_path):
        """restore() must diff the checkpoint against the template with an
        actionable error, not load silently and explode at trace time
        (reference validates by module replay, opt/conversion.py:650)."""
        import pytest

        bundle = simple_mlp_bundle()
        x = bundle.example_inputs[0]
        q = mtq.quantize(bundle, mtq.INT8_DEFAULT_CFG, calib_loop([x]))
        save(q, str(tmp_path / "ckpt"))
        wrong = simple_mlp_bundle(hidden=48)  # different width
        with pytest.raises(ValueError, match="shape mismatch"):
            restore(wrong, str(tmp_path / "ckpt"))

    def test_chained_modes_roundtrip_outputs(self, rng, tmp_path):
        """quantize -> compress -> lora -> save -> restore -> identical
        outputs (reference analogue: tests/unit/torch/opt/test_chaining.py)."""
        from modelopt_tpu.peft import LoRAConfig, update_model
        from modelopt_tpu.quant import compress

        bundle = simple_mlp_bundle()
        x = bundle.example_inputs[0]
        q = mtq.quantize(bundle, mtq.INT4_BLOCKWISE_WEIGHT_ONLY_CFG, calib_loop([x]))
        c = compress(q)
        l = update_model(c, LoRAConfig(rank=4, patterns=("*fc1",)))
        out = np.asarray(l.apply(x))
        save(l, str(tmp_path / "ckpt"))
        fresh = simple_mlp_bundle(seed=123)
        r = restore(fresh, str(tmp_path / "ckpt"))
        assert [rec.mode for rec in r.records] == ["quantize", "compress", "lora"]
        np.testing.assert_allclose(np.asarray(r.apply(x)), out, rtol=1e-6)

    def test_chained_modes_record_order(self, rng):
        bundle = simple_mlp_bundle()
        x = bundle.example_inputs[0]
        q = mtq.quantize(bundle, mtq.INT8_DEFAULT_CFG, calib_loop([x]))
        st = modelopt_state(q)["modelopt_state_dict"]
        assert [e["mode"] for e in st] == ["quantize"]
        assert st[0]["config"]["algorithm"] == "max"


class TestFoldWeight:
    def test_fold_weight_matches_fake_quant(self, rng):
        bundle = simple_mlp_bundle()
        x = bundle.example_inputs[0]
        q = mtq.quantize(bundle, mtq.INT8_WEIGHT_ONLY_CFG, calib_loop([x]))
        out_q = q.apply(x)
        folded = mtq.fold_weight(q)
        # weight quantizers now disabled, but outputs identical
        np.testing.assert_allclose(
            np.asarray(folded.apply(x)), np.asarray(out_q), rtol=1e-5, atol=1e-6
        )
        specs = dict(mtq.quantizer_specs(folded))
        assert specs["fc1/weight_quantizer"] is None

    def test_compute_quantization_mse(self, rng):
        bundle = simple_mlp_bundle()
        x = bundle.example_inputs[0]
        q = mtq.quantize(bundle, mtq.INT4_BLOCKWISE_WEIGHT_ONLY_CFG, calib_loop([x]))
        stats = mtq.compute_quantization_mse(q)
        assert "fc1" in stats and stats["fc1"]["output_rel_err"] > 0


class TestAffineQuant:
    def test_affine_better_on_offset_data(self, rng):
        """Asymmetric data: affine quantization beats symmetric."""
        from modelopt_tpu.nn.quantizer import TensorQuantizer
        from modelopt_tpu.quant.qspec import QuantizerSpec
        from modelopt_tpu.core.bundle import PHASE_CALIB, PHASE_QUANT, _set_phase

        x = jnp.asarray(rng.standard_normal((64, 32)) * 0.5 + 5.0, jnp.float32)
        for bias_mode, name in ((None, "sym"), ("static", "affine")):
            spec = QuantizerSpec(num_bits=(4, 3), bias_mode=bias_mode)
            q = TensorQuantizer(fixed_spec=spec)
            with _set_phase(PHASE_CALIB):
                vs = q.init(jax.random.PRNGKey(0), x)
                _, muts = q.apply(vs, x, mutable=["quant"])
            with _set_phase(PHASE_QUANT):
                out = q.apply({"quant": muts.get("quant", {})}, x)
            err = float(jnp.sqrt(jnp.mean((out - x) ** 2)))
            if bias_mode is None:
                err_sym = err
            else:
                err_affine = err
        assert err_affine < err_sym * 0.5

    def test_fp8_affine_kv_model(self, rng):
        bundle = simple_mlp_bundle()
        x = bundle.example_inputs[0]
        q = mtq.quantize(bundle, mtq.FP8_AFFINE_KV_CFG, calib_loop([x]))
        out = q.apply(x)
        assert np.isfinite(np.asarray(out)).all()
