"""QuantLSTM / QuantPool registry coverage (reference:
nn/modules/quant_rnn.py, quant_pooling.py)."""

import jax
import jax.numpy as jnp
import numpy as np

import modelopt_tpu.quant as mtq
from modelopt_tpu.core import ModelBundle
from modelopt_tpu.nn import QuantLSTM, QuantPool


def _bundle(module, *inputs):
    variables = module.init(jax.random.PRNGKey(0), *inputs)
    return ModelBundle(module=module, variables=dict(variables),
                       example_inputs=inputs)


def test_quant_lstm_runs_and_quantizes():
    m = QuantLSTM(features=16)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 12)),
                    jnp.float32)
    b = _bundle(m, x)
    ys, (h, c) = b.apply(x)
    assert ys.shape == (2, 8, 16) and h.shape == (2, 16)
    q = mtq.quantize(b, mtq.INT8_DEFAULT_CFG, lambda f: f(x))
    qys, _ = jax.jit(q.make_fn())(q.variables, x)
    # quantization perturbs but tracks the fp output
    rel = float(jnp.linalg.norm(qys - ys) / jnp.linalg.norm(ys))
    assert 0 < rel < 0.35
    # both projections got calibrated quantizers
    qcol = q.variables["quant"]
    assert "ih_proj" in qcol and "weight_quantizer" in qcol


def test_quant_lstm_compresses():
    m = QuantLSTM(features=128, param_dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 4, 256)),
                    jnp.float32)
    b = _bundle(m, x)
    q = mtq.quantize(b, mtq.INT4_BLOCKWISE_WEIGHT_ONLY_CFG, lambda f: f(x))
    ref, _ = jax.jit(q.make_fn())(q.variables, x)
    c = mtq.compress(q)
    got, _ = jax.jit(c.make_fn())(c.variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-2, atol=5e-2)


def test_quant_pool_points():
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 8, 8, 4)),
                    jnp.float32)
    for kind in ("avg", "max"):
        m = QuantPool(window=(2, 2), kind=kind)
        b = _bundle(m, x)
        y = b.apply(x)
        assert y.shape == (2, 4, 4, 4)
        ref = y
        cfg = {"quant_cfg": {"*input_quantizer": {"num_bits": 8, "axis": None},
                             "*output_quantizer": {"num_bits": 8, "axis": None}},
               "algorithm": "max"}
        q = mtq.quantize(b, cfg, lambda f: f(x))
        got = jax.jit(q.make_fn())(q.variables, x)
        rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
        assert 0 < rel < 0.1
    # global/adaptive pooling
    g = QuantPool(kind="avg")
    bg = _bundle(g, x)
    yg = bg.apply(x)
    assert yg.shape == (2, 1, 1, 4)
    np.testing.assert_allclose(np.asarray(yg)[:, 0, 0],
                               np.asarray(jnp.mean(x, (1, 2))), rtol=1e-5)
