"""Puzzletron heterogeneous NAS tests (reference: modelopt/torch/puzzletron —
replacement library, MIP selection, sewing kit, bypassed training)."""

import jax
import jax.numpy as jnp
import numpy as np

import modelopt_tpu.nas as mtn
from modelopt_tpu.core import ModelBundle
from modelopt_tpu.models import Decoder, tiny_test_config


def lm_bundle(**over):
    kw = dict(dtype=jnp.float32, num_layers=3, intermediate_size=128)
    kw.update(over)
    cfg = tiny_test_config(**kw)
    m = Decoder(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (4, 24)), jnp.int32)
    variables = m.init(jax.random.PRNGKey(0), ids)
    return ModelBundle(module=m, variables=dict(variables), example_inputs=(ids,))


def test_layer_plan_heterogeneous_forward():
    bundle = lm_bundle()
    ids = bundle.example_inputs[0]
    plan = ((("no_attn", True),), (("ffn", 64),), ())
    het = mtn.sew(bundle, plan)
    assert "attn" not in het.variables["params"]["layers_0"]
    assert het.variables["params"]["layers_1"]["mlp"]["gate_proj"]["kernel"].shape[1] == 64
    logits, _ = het.apply(ids)
    assert np.isfinite(np.asarray(logits)).all()


def test_sew_kv_reduction_and_bypass():
    """Per-layer KV-group halving and full-block bypass both run, and the
    runtime plan is derived from the sewed params."""
    bundle = lm_bundle()
    ids = bundle.example_inputs[0]
    plan = ((("kv", 1),), (("no_attn", True), ("no_mlp", True)), ())
    het = mtn.sew(bundle, plan)
    l0 = het.variables["params"]["layers_0"]["attn"]
    cfg = bundle.module.cfg
    assert l0["k_proj"]["kernel"].shape[1] == cfg.dims_per_head  # 1 kv head
    assert l0["q_proj"]["kernel"].shape[1] == cfg.dims_per_head * (
        cfg.num_heads // cfg.kv_heads
    )
    assert het.variables["params"]["layers_1"].keys() == set()
    assert het.module.cfg.layer_plan[0] == (("kv", 1),)
    logits, _ = het.apply(ids)
    assert np.isfinite(np.asarray(logits)).all()


def test_sew_kv_cache_decode():
    """Heterogeneous KV plans allocate per-layer cache shapes and decode."""
    from modelopt_tpu.models import make_cache

    bundle = lm_bundle()
    het = mtn.sew(bundle, ((("kv", 1),), (("no_attn", True),), ()))
    cache = make_cache(het.module.cfg, batch=2, max_len=16)
    D = het.module.cfg.dims_per_head
    assert cache["k"][0].shape[2] == 1 * D  # reduced layer
    assert cache["k"][1].shape[2] == 1 * D  # bypassed attention: dummy head
    assert cache["k"][2].shape[2] == 2 * D  # untouched
    ids = jnp.asarray([[5, 3, 7], [2, 2, 2]], jnp.int32)
    logits, cache = het.apply(ids, cache)
    tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
    logits2, cache = het.apply(tok, cache)
    assert np.isfinite(np.asarray(logits2)).all()
    # cached decode == full forward
    full, _ = het.apply(jnp.concatenate([ids, tok], 1))
    np.testing.assert_allclose(
        np.asarray(logits2[:, -1]), np.asarray(full[:, -1]), rtol=2e-4, atol=2e-4
    )


def test_sew_donor_layers():
    """Anymodel stitching: a donor bundle's layer grafts into the plan and
    the derived layer_plan reflects the donor's geometry."""
    bundle = lm_bundle()
    donor = lm_bundle(intermediate_size=64)  # same hidden, smaller FFN
    het = mtn.sew(
        bundle, ((("donor", "small"),), (), ()), donors={"small": donor}
    )
    l0 = het.variables["params"]["layers_0"]
    assert l0["mlp"]["gate_proj"]["kernel"].shape[1] == 64
    assert het.module.cfg.layer_plan[0] == (("ffn", 64),)
    logits, _ = het.apply(*bundle.example_inputs)
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


def test_puzzle_search_with_donor():
    bundle = lm_bundle()
    donor = lm_bundle(intermediate_size=32)
    sewed, info = mtn.puzzle_search(
        bundle, {"params_ratio": 0.7}, donors={"tiny": donor}
    )
    assert info["params_after"] <= 0.7 * info["params_before"] + 1
    logits, _ = sewed.apply(*bundle.example_inputs)
    assert np.isfinite(np.asarray(logits)).all()


def test_puzzle_prefers_cheap_layers():
    """The MIP should replace layers whose replacement hurts least."""
    bundle = lm_bundle()
    sewed, info = mtn.puzzle_search(bundle, {"params_ratio": 0.85})
    plan = info["plan"]
    assert any(p == [] for p in plan)
    assert any(p != [] for p in plan)
    assert info["model_kl"] <= np.asarray(info["kl_scores"]).max() * 3 + 1e-3


def test_recovery_training_reduces_kl():
    """Bypassed training: distilling into ONLY the touched layers lowers
    teacher-student KL; untouched layers stay bit-identical."""
    import optax

    bundle = lm_bundle()
    ids = bundle.example_inputs[0]
    sewed = mtn.sew(bundle, ((("ffn", 32),), (), ()))
    init_state, step, finalize = mtn.make_recovery_step(
        bundle, sewed, optax.adam(5e-3)
    )
    state = init_state()
    losses = []
    for _ in range(30):
        state, loss = step(state, ids)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    recovered = finalize(state)
    # untouched layer params unchanged
    np.testing.assert_array_equal(
        np.asarray(recovered.variables["params"]["layers_1"]["mlp"]["gate_proj"]["kernel"]),
        np.asarray(sewed.variables["params"]["layers_1"]["mlp"]["gate_proj"]["kernel"]),
    )
    logits, _ = recovered.apply(ids)
    assert np.isfinite(np.asarray(logits)).all()


def test_puzzle_search_memory_and_latency_budgets():
    """Multi-budget MIP (reference: mip/run_puzzle.py solves under memory
    AND runtime budgets): a KV-heavy deployment point plus a tight memory
    budget must force KV/attention reductions, and the reported usage must
    respect both budgets."""
    bundle = lm_bundle()
    deployment = dict(batch=8, seq_len=2048, kv_itemsize=2, param_itemsize=2)

    # baseline usage with no reductions
    _, free_info = mtn.puzzle_search(
        bundle, {"memory_gb": 1e9, "deployment": deployment})
    base_mem = free_info["memory_gb_after"]
    base_lat = free_info["latency_ms_after"]

    mem_budget = 0.7 * base_mem
    lat_budget = 0.8 * base_lat
    sewed, info = mtn.puzzle_search(
        bundle, {"memory_gb": mem_budget, "latency_ms": lat_budget,
                 "deployment": deployment})
    assert info["memory_gb_after"] <= mem_budget * (1 + 1e-6)
    assert info["latency_ms_after"] <= lat_budget * (1 + 1e-6)
    # at least one layer was reduced and the model still runs
    assert any(p for p in info["plan"])
    ids = bundle.example_inputs[0]
    logits, _ = sewed.apply(ids)
    assert np.isfinite(np.asarray(logits)).all()
