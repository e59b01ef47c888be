"""Histogram (percentile/entropy) calibration tests."""

import jax.numpy as jnp
import numpy as np

import modelopt_tpu.quant as mtq
from modelopt_tpu.quant.algorithms.histogram import entropy_amax, percentile_amax

from tests._test_utils.models import simple_mlp_bundle


def outlier_bundle():
    bundle = simple_mlp_bundle(in_dim=32, hidden=64, batch=64)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((64, 32)).astype(np.float32)
    x[0, 0] = 100.0  # single extreme outlier
    return bundle.replace(example_inputs=(jnp.asarray(x),))


def test_percentile_ignores_outlier():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(10000).astype(np.float32)
    x[0] = 1000.0
    a = percentile_amax(x, 99.9)
    assert a < 10  # outlier ignored


def test_entropy_amax_reasonable():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(20000).astype(np.float32)
    x[:5] = 500.0
    a = entropy_amax(x, num_bits=8)
    assert 1.0 < a < 100.0


def test_percentile_calibrate_clips_outlier():
    bundle = outlier_bundle()
    x = bundle.example_inputs[0]
    cfg = dict(mtq.INT8_DEFAULT_CFG)
    cfg["algorithm"] = {"method": "percentile", "percentile": 99.0}
    q = mtq.quantize(bundle, cfg, lambda f: f(x))
    a_pct = float(q.variables["quant"]["fc1"]["input_quantizer"]["amax"])
    q_max = mtq.quantize(bundle, mtq.INT8_DEFAULT_CFG, lambda f: f(x))
    a_max = float(q_max.variables["quant"]["fc1"]["input_quantizer"]["amax"])
    assert a_max == 100.0 and a_pct < 10.0


def test_entropy_calibrate_runs():
    bundle = outlier_bundle()
    x = bundle.example_inputs[0]
    cfg = dict(mtq.INT8_DEFAULT_CFG)
    cfg["algorithm"] = "entropy"
    q = mtq.quantize(bundle, cfg, lambda f: f(x))
    out = q.apply(x)
    assert np.isfinite(np.asarray(out)).all()


def test_nvfp4_headroom_leaves_room():
    import jax.numpy as jnp
    import modelopt_tpu.quant as mtq
    from modelopt_tpu.quant.algorithms.nvfp4_headroom import headroom_amax

    rng = np.random.default_rng(0)
    x = rng.standard_normal((512, 64)).astype(np.float32)
    a = headroom_amax(x, 16, 1.0, 99.99, rho=64.0)
    assert a > np.abs(x).max()  # headroom above the observed max here

    # end-to-end: amax var ends up larger than max-calibrated
    bundle = outlier_bundle()
    xb = bundle.example_inputs[0]
    cfg = dict(mtq.NVFP4_DEFAULT_CFG)
    cfg["algorithm"] = "nvfp4_act_headroom"
    q = mtq.quantize(bundle, cfg, lambda f: f(xb))
    q_max = mtq.quantize(bundle, mtq.NVFP4_DEFAULT_CFG, lambda f: f(xb))
    a_h = float(q.variables["quant"]["fc1"]["input_quantizer"]["amax"])
    a_m = float(q_max.variables["quant"]["fc1"]["input_quantizer"]["amax"])
    assert a_h != a_m
    out = q.apply(xb)
    assert np.isfinite(np.asarray(out)).all()
