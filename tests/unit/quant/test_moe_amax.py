"""Per-expert (Grouped-quantizer) amax separation on the MoE path.

The reference wraps expert linears in a GroupedQuantizer so each expert
calibrates its own scales (reference: nn/modules/tensor_quantizer.py:1865
GroupedQuantizer, model_calib.py:226 MoE calibration-completeness). Here the
expert dim is just an axis the amax reduction KEEPS — this pins that the
einsum-axes formulation really produces per-expert scales."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import modelopt_tpu.quant as mtq
from modelopt_tpu.core import ModelBundle
from modelopt_tpu.core.tree import get_in
from modelopt_tpu.models import Decoder, tiny_test_config


def _moe_bundle(num_experts=4, seed=0):
    cfg = dataclasses.replace(
        tiny_test_config(), num_experts=num_experts, experts_per_token=2
    )
    module = Decoder(cfg)
    ids = jnp.zeros((2, 8), jnp.int32)
    variables = module.init(jax.random.PRNGKey(seed), ids)
    return ModelBundle(module=module, variables=dict(variables),
                       example_inputs=(ids,)), ids


PER_EXPERT_CFG = {
    "quant_cfg": {
        "*": {"enable": False},
        # weight amax keeps (expert, out) axes -> one scale per expert/out
        "*moe*weight_quantizer": {"enable": True, "num_bits": 8, "axis": (0, -1)},
        # down_proj input h is [B, T, E, I]: keeping axis -2 gives one
        # activation amax per EXPERT
        "*moe/down_proj/input_quantizer": {"enable": True, "num_bits": 8,
                                           "axis": (-2,)},
    },
    "algorithm": "max",
}


def test_per_expert_weight_amax_separation():
    bundle, ids = _moe_bundle()
    E = 4
    # make expert e's gate_proj weights e+1 times larger
    params = bundle.variables["params"]
    kern = get_in(params, ("layers_0", "moe", "gate_proj", "kernel"))
    scalers = jnp.arange(1, E + 1, dtype=kern.dtype)[:, None, None]
    new_kern = kern * scalers
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy tree
    params["layers_0"]["moe"]["gate_proj"]["kernel"] = new_kern
    bundle = bundle.replace(variables={**bundle.variables, "params": params})

    q = mtq.quantize(bundle, PER_EXPERT_CFG, lambda f: f(ids))
    amax = get_in(q.variables["quant"],
                  ("layers_0", "moe", "gate_proj", "weight_quantizer", "amax"))
    assert amax is not None
    amax = np.asarray(amax).reshape(E, -1)
    # per-expert leading dim with ratios tracking the injected scaling
    per_expert = amax.max(axis=1)
    ratios = per_expert / per_expert[0]
    # bf16 params: kern * 3 rounds, so ratios are only ~1e-3 exact
    np.testing.assert_allclose(ratios, np.arange(1, E + 1), rtol=1e-2)


def test_per_expert_activation_amax_shape_and_separation():
    bundle, ids = _moe_bundle()
    q = mtq.quantize(bundle, PER_EXPERT_CFG, lambda f: f(ids))
    amax = get_in(q.variables["quant"],
                  ("layers_0", "moe", "down_proj", "input_quantizer", "amax"))
    assert amax is not None
    a = np.asarray(amax).reshape(-1)
    assert a.shape == (4,)  # one activation scale per expert
    # gated intermediates differ across experts — scales must not be tied
    assert np.unique(np.round(a, 6)).size > 1


def test_forward_finite_after_per_expert_quant():
    bundle, ids = _moe_bundle()
    q = mtq.quantize(bundle, PER_EXPERT_CFG, lambda f: f(ids))
    out = q.apply(ids)
    logits = out[0] if isinstance(out, tuple) else out
    assert np.isfinite(np.asarray(logits, np.float32)).all()
