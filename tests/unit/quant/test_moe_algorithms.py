"""Weight-calibration algorithms (AWQ/GPTQ/smoothquant) must cover MoE
expert einsum kernels — via the folded [in, E*out] view with an
input-shared smoothing scale (capture.LinearInfo.moe_shape)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import modelopt_tpu.quant as mtq
from modelopt_tpu.core import PHASE_QUANT, ModelBundle
from modelopt_tpu.core.tree import get_in
from modelopt_tpu.models import Decoder, tiny_test_config


@pytest.fixture(scope="module")
def moe_bundle():
    cfg = tiny_test_config(num_experts=4, experts_per_token=2)
    m = Decoder(cfg)
    ids = jnp.zeros((2, 16), jnp.int32)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), ids)
    return ModelBundle(module=m, variables=dict(v), example_inputs=(ids,))


def _expert_kernel(b, name="gate_proj"):
    return np.asarray(
        get_in(b.variables["params"], ("layers_0", "moe", name, "kernel"))
    )


@pytest.mark.parametrize("preset,algo_touches_weights", [
    ("INT4_AWQ_CFG", True),          # awq_lite: scale folded into kernels
    ("W4A8_AWQ_BETA_CFG", True),
])
def test_awq_scales_moe_experts(moe_bundle, preset, algo_touches_weights):
    data = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 256)
    before = _expert_kernel(moe_bundle)
    q = mtq.quantize(moe_bundle, preset, lambda f: f(data))
    after = _expert_kernel(q)
    assert after.shape == before.shape  # unfolded back to [E, in, out]
    if algo_touches_weights:
        assert not np.allclose(after, before), "experts untouched by AWQ"
    # the shared smoothing scale lands on the experts' input quantizer
    pqs = get_in(q.variables["quant"],
                 ("layers_0", "moe", "gate_proj", "input_quantizer",
                  "pre_quant_scale"))
    assert pqs is not None and pqs.shape == (before.shape[1],)
    out = jax.jit(q.make_fn(phase=PHASE_QUANT))(q.variables, data)
    lg = out[0] if isinstance(out, tuple) else out
    assert np.isfinite(np.asarray(lg)).all()


def test_gptq_updates_moe_experts(moe_bundle):
    data = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 0, 256)
    before = _expert_kernel(moe_bundle, "down_proj")
    q = mtq.quantize(
        moe_bundle,
        {"quant_cfg": {"*weight_quantizer": {"num_bits": 4,
                                             "block_sizes": {-2: 32}},
                       "*input_quantizer": {"enable": False},
                       "*output_quantizer": {"enable": False},
                       "*lm_head*": {"enable": False},
                       "*router*": {"enable": False},
                       "*embed*": {"enable": False}},
         "algorithm": "gptq"},
        lambda f: f(data),
    )
    after = _expert_kernel(q, "down_proj")
    assert after.shape == before.shape
    assert not np.allclose(after, before), "experts untouched by GPTQ"
    out = jax.jit(q.make_fn(phase=PHASE_QUANT))(q.variables, data)
    lg = out[0] if isinstance(out, tuple) else out
    assert np.isfinite(np.asarray(lg)).all()


def test_compress_packs_moe_experts(moe_bundle):
    """compress() packs 3-D expert kernels (folded view) and the
    compressed model's outputs match the fake-quant model."""
    from modelopt_tpu.core import PHASE_QUANT
    from modelopt_tpu.core.tree import get_in as tget

    data = jax.random.randint(jax.random.PRNGKey(3), (2, 16), 0, 256)
    q = mtq.quantize(moe_bundle, {
        "quant_cfg": {"*weight_quantizer": {"num_bits": 4,
                                            "block_sizes": {-2: 32}},
                      "*input_quantizer": {"enable": False},
                      "*output_quantizer": {"enable": False},
                      "*lm_head*": {"enable": False},
                      "*router*": {"enable": False},
                      "*embed*": {"enable": False}},
        "algorithm": "max"}, lambda f: f(data))
    ref = jax.jit(q.make_fn(phase=PHASE_QUANT))(q.variables, data)
    ref = np.asarray(ref[0] if isinstance(ref, tuple) else ref, np.float32)
    c = mtq.compress(q)
    # expert kernel gone from params, qweight present
    assert tget(c.variables["params"], ("layers_0", "moe", "gate_proj",
                                        "kernel")) is None
    assert tget(c.variables["quant"], ("layers_0", "moe", "gate_proj",
                                       "qweight")) is not None
    out = jax.jit(c.make_fn(phase=PHASE_QUANT))(c.variables, data)
    out = np.asarray(out[0] if isinstance(out, tuple) else out, np.float32)
    np.testing.assert_allclose(out, ref, rtol=5e-2, atol=5e-2)
