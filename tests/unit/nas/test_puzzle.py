"""Puzzletron-lite heterogeneous NAS tests."""

import jax
import jax.numpy as jnp
import numpy as np

import modelopt_tpu.nas as mtn
from modelopt_tpu.core import ModelBundle
from modelopt_tpu.models import Decoder, tiny_test_config


def lm_bundle():
    cfg = tiny_test_config(dtype=jnp.float32, num_layers=3, intermediate_size=128)
    m = Decoder(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (4, 24)), jnp.int32)
    variables = m.init(jax.random.PRNGKey(0), ids)
    return ModelBundle(module=m, variables=dict(variables), example_inputs=(ids,))


def test_layer_plan_heterogeneous_forward():
    bundle = lm_bundle()
    ids = bundle.example_inputs[0]
    from modelopt_tpu.nas.puzzle import _materialize
    from modelopt_tpu.prune.minitron import _top_idx, estimate_importances

    imps = estimate_importances(bundle)
    keep = {i: _top_idx(imps["ffn"][i], 128) for i in range(3)}
    plan = ((("no_attn", True),), (("ffn", 64),), ())
    het = _materialize(bundle, plan, keep)
    assert "attn" not in het.variables["params"]["layers_0"]
    assert het.variables["params"]["layers_1"]["mlp"]["gate_proj"]["kernel"].shape[1] == 64
    logits, _ = het.apply(ids)
    assert np.isfinite(np.asarray(logits)).all()


def test_puzzle_search_respects_budget():
    bundle = lm_bundle()
    sewed, info = mtn.puzzle_search(bundle, {"params_ratio": 0.7})
    assert info["params_after"] <= 0.7 * info["params_before"] + 1
    logits, _ = sewed.apply(*bundle.example_inputs)
    assert np.isfinite(np.asarray(logits)).all()
    # keep option scores are zero; replacements scored > 0
    s = np.asarray(info["kl_scores"])
    assert np.all(s[:, 0] == 0) and np.any(s[:, 1:] > 0)


def test_puzzle_prefers_cheap_layers():
    """The MIP should replace layers whose replacement hurts least."""
    bundle = lm_bundle()
    sewed, info = mtn.puzzle_search(bundle, {"params_ratio": 0.85})
    # at least one layer kept intact and at least one replaced
    plan = info["plan"]
    assert any(p == [] for p in plan)
    assert any(p != [] for p in plan)
    # chosen plan's KL no worse than the single worst replacement score
    assert info["model_kl"] <= np.asarray(info["kl_scores"]).max() * 3 + 1e-3
