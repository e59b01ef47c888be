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


# ---------------------------------------------------------------------------
# round-5 depth: family-aware libraries, local activation scoring, stats
# pipeline (reference: puzzletron/build_library_and_stats.py + mip/run_puzzle)
# ---------------------------------------------------------------------------
def hybrid_bundle(**over):
    from modelopt_tpu.models import tiny_hybrid_test_config

    kw = dict(dtype=jnp.float32, param_dtype=jnp.float32)
    kw.update(over)
    cfg = tiny_hybrid_test_config(**kw)
    m = Decoder(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 24)),
                      jnp.int32)
    variables = m.init(jax.random.PRNGKey(0), ids)
    return ModelBundle(module=m, variables=dict(variables),
                       example_inputs=(ids,))


def test_layer_libraries_family_aware():
    b = hybrid_bundle()
    cfg = b.module.cfg
    libs = mtn.build_layer_libraries(cfg)
    assert len(libs) == cfg.num_layers
    for i in range(cfg.num_layers):
        assert libs[i][0] == ()  # keep first
        if cfg.is_mamba(i):
            # mamba layers: keep | bypass only
            assert (("bypass", True),) in libs[i]
            assert all("ffn" not in dict(e) for e in libs[i])
        else:
            assert any("no_attn" in dict(e) for e in libs[i])
    # MoE config: no ffn-slicing knobs on routed layers
    moe = lm_bundle(num_experts=4, experts_per_token=2)
    mlibs = mtn.build_layer_libraries(moe.module.cfg)
    for lib in mlibs:
        assert all("ffn" not in dict(e) for e in lib)
        assert (("no_mlp", True),) in lib


def test_moe_layer_plan_not_dropped_by_sew():
    """Regression: MoE params live under 'moe', not 'mlp' — deriving
    no_mlp for them silently dropped every expert block."""
    b = lm_bundle(num_experts=4, experts_per_token=2)
    ids = b.example_inputs[0]
    base, _ = b.apply(ids)
    sewed = mtn.sew(b, tuple(() for _ in range(b.module.cfg.num_layers)))
    for opts in sewed.module.cfg.layer_plan:
        assert ("no_mlp", True) not in opts
    got, _ = sewed.apply(ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=1e-5, atol=1e-5)


def test_stats_pipeline_roundtrip(tmp_path):
    b = lm_bundle()
    path = str(tmp_path / "stats.json")
    stats = mtn.build_library_and_stats(b, {"params_ratio": 0.8}, path=path)
    assert stats["scoring"] == "local_block_mse"
    L = b.module.cfg.num_layers
    for i in range(L):
        assert stats["scores"][i][0] == 0.0  # keep is free
        assert all(s >= 0 for s in stats["scores"][i])
    sewed, info = mtn.puzzle_search(b, {"params_ratio": 0.8}, stats=path)
    assert info["params_after"] <= 0.8 * info["params_before"] * 1.001
    logits, _ = sewed.apply(b.example_inputs[0])
    assert np.isfinite(np.asarray(logits)).all()


def test_hybrid_local_puzzle_runs_and_updates_pattern():
    b = hybrid_bundle()
    sewed, info = mtn.puzzle_search(b, {"params_ratio": 0.6},
                                    scoring="local")
    cfg2 = sewed.module.cfg
    logits, _ = sewed.apply(b.example_inputs[0])
    assert np.isfinite(np.asarray(logits)).all()
    # any bypassed mamba layer must flip its pattern char
    for i in range(cfg2.num_layers):
        if cfg2.hybrid_pattern[i] == "M":
            assert "mixer" in sewed.variables["params"][f"layers_{i}"]


def _scale_layer_out(variables, i, factor):
    p = dict(variables["params"])
    layer = jax.tree.map(lambda x: x, p[f"layers_{i}"])
    for blk, name in (("attn", "o_proj"), ("mlp", "down_proj"),
                      ("mixer", "out_proj")):
        if blk in layer and name in layer[blk]:
            layer[blk][name] = {
                **layer[blk][name],
                "kernel": layer[blk][name]["kernel"] * factor}
    p[f"layers_{i}"] = layer
    return {**variables, "params": p}


def test_puzzle_beats_uniform_minitron_at_equal_memory():
    """End-to-end on a ~100M-param synthetic HYBRID with genuinely
    heterogeneous layer importance (several near-identity blocks):
    puzzle's per-layer selection at a params budget must lose less
    output-KL than UNIFORM Minitron pruning at the same budget —
    the Puzzletron premise (reference: mip/run_puzzle.py:764)."""
    from modelopt_tpu.models import DecoderConfig
    from modelopt_tpu.prune import minitron_prune

    cfg = DecoderConfig(
        vocab_size=24576, hidden_size=512, num_layers=12, num_heads=8,
        num_kv_heads=4, head_dim=64, intermediate_size=3584,
        hybrid_pattern="M*M*M*M*M*M*", mamba_num_heads=8, mamba_head_dim=64,
        mamba_state_dim=64, mamba_groups=2, mamba_chunk=16,
        positions="none", tie_word_embeddings=False,
        dtype=jnp.float32, param_dtype=jnp.float32,
        max_position_embeddings=64,
    )
    m = Decoder(cfg)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 24576, (2, 32)),
                      jnp.int32)
    v = m.init(jax.random.PRNGKey(0), ids)
    total = sum(x.size for x in jax.tree.leaves(v["params"]))
    assert total >= 100e6, total
    variables = dict(v)
    # four near-identity layers: realistic depth redundancy for the
    # selector to find (uniform pruning can't exploit it)
    for i in (2, 5, 8, 11):
        variables = _scale_layer_out(variables, i, 0.01)
    bundle = ModelBundle(module=m, variables=variables,
                         example_inputs=(ids,))
    base, _ = bundle.apply(ids)
    base_lp = jax.nn.log_softmax(np.asarray(base, np.float32), -1)

    def kl_of(b):
        lg, _ = b.apply(ids)
        lp = jax.nn.log_softmax(np.asarray(lg, np.float32), -1)
        return float(np.mean(np.sum(np.exp(base_lp) * (base_lp - lp), -1)))

    ratio = 0.72
    sewed, info = mtn.puzzle_search(bundle, {"params_ratio": ratio},
                                    scoring="local")
    puzzle_kl = kl_of(sewed)
    assert info["params_after"] <= ratio * info["params_before"] * 1.001

    # uniform Minitron at (approximately) the same per-layer budget:
    # shrink every FFN + halve KV groups to land at <= the same params
    uni = minitron_prune(bundle, {
        "intermediate_size": 1792, "num_kv_heads": 2,
    })
    uni_params = sum(
        x.size
        for i in range(cfg.num_layers)
        for x in jax.tree.leaves(uni.variables["params"][f"layers_{i}"])
    )
    assert uni_params <= ratio * info["params_before"] * 1.05
    uniform_kl = kl_of(uni)
    assert puzzle_kl < uniform_kl, (puzzle_kl, uniform_kl)
