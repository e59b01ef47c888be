"""NAS search tests (reference analogue: tests/unit/torch/nas/)."""

import jax
import jax.numpy as jnp
import numpy as np

import modelopt_tpu.nas as mtn
from modelopt_tpu.core import ModelBundle, modelopt_state
from modelopt_tpu.models import Decoder, tiny_test_config
from modelopt_tpu.utils import perplexity, synthetic_token_batches


def lm_bundle():
    cfg = tiny_test_config(dtype=jnp.float32, intermediate_size=128)
    m = Decoder(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (4, 24)), jnp.int32)
    variables = m.init(jax.random.PRNGKey(0), ids)
    return ModelBundle(module=m, variables=dict(variables), example_inputs=(ids,))


def test_search_space():
    bundle = lm_bundle()
    sp = mtn.search_space(bundle)
    assert set(sp) == {"intermediate_size", "num_kv_heads", "num_layers"}
    assert max(sp["intermediate_size"].choices) == 128
    assert sp["num_kv_heads"].choices == (1, 2)


def test_convert_records_space():
    bundle = lm_bundle()
    c = mtn.convert(bundle, "fastnas")
    st = modelopt_state(c)["modelopt_state_dict"]
    assert st[0]["mode"] == "fastnas"
    assert "intermediate_size" in st[0]["metadata"]["search_space"]


def test_profile():
    bundle = lm_bundle()
    p = mtn.profile(bundle)
    assert p["params"] > 0 and p["flops_per_token"] == 2 * p["params"]


def test_binary_search_shrinks_model():
    bundle = lm_bundle()
    batches = synthetic_token_batches(256, 2, 4, 24)

    def score(b):
        return -perplexity(b, batches)  # higher is better

    best, info = mtn.search(bundle, score, mode="binary", score_tolerance=0.5)
    assert info["params"] <= mtn.profile(bundle)["params"]
    assert info["assignment"]["intermediate_size"] <= 128
    # searched model still runs
    logits, _ = best.apply(*bundle.example_inputs)
    assert np.isfinite(np.asarray(logits)).all()


def test_evolve_search_respects_constraint():
    bundle = lm_bundle()
    base_params = mtn.profile(bundle)["params"]
    batches = synthetic_token_batches(256, 1, 4, 24)

    def score(b):
        return -perplexity(b, batches)

    best, info = mtn.search(
        bundle, score, constraints={"params": int(base_params * 0.95)},
        mode="evolve", iterations=6, seed=1,
    )
    assert info["params"] <= base_params * 0.95


def test_profile_measured_latency():
    """reference: _deploy/profiling.py — measured, not proxied, latency."""
    bundle = lm_bundle()
    p = mtn.profile(bundle, measure_latency=True, batch=1, seq_len=16, iters=4)
    assert p["latency_ms"] > 0


def test_latency_constrained_search_and_checkpoint(tmp_path):
    """Latency constraint feeds the search; checkpoint memoizes scores so a
    rerun does zero re-evaluations (reference: searcher.py:268
    save/load_search_checkpoint)."""
    import json

    bundle = lm_bundle()
    batches = synthetic_token_batches(256, 1, 4, 24)
    calls = {"n": 0}

    def score(b):
        calls["n"] += 1
        return -perplexity(b, batches)

    ckpt = str(tmp_path / "search.json")
    best, info = mtn.search(
        bundle, score, constraints={"latency_ms": 1e9}, mode="evolve",
        iterations=4, checkpoint=ckpt,
    )
    assert info["params"] <= mtn.profile(bundle)["params"]
    n_first = calls["n"]
    memo = json.load(open(ckpt))
    assert len(memo) > 0
    # rerun: every candidate score comes from the checkpoint
    best2, info2 = mtn.search(
        bundle, score, constraints={"latency_ms": 1e9}, mode="evolve",
        iterations=4, checkpoint=ckpt,
    )
    assert calls["n"] == n_first + 1  # only the base_score re-evaluation
    assert info2["assignment"] == info["assignment"]


def test_hparam_tying():
    from modelopt_tpu.nas.search import Hparam, expand_tied

    space = {
        "ffn_all": Hparam("ffn_all", (64, 128), tied=("ffn_0", "ffn_1")),
        "ffn_0": Hparam("ffn_0", (64, 128)),
        "ffn_1": Hparam("ffn_1", (64, 128)),
    }
    out = expand_tied({"ffn_all": 64}, space)
    assert out == {"ffn_all": 64, "ffn_0": 64, "ffn_1": 64}
    # explicit assignment wins over the tie
    out = expand_tied({"ffn_all": 64, "ffn_1": 128}, space)
    assert out["ffn_1"] == 128


def test_importance_operator():
    from modelopt_tpu.nas.search import Hparam

    hp = Hparam("x", (1, 2), importance=lambda arr: arr.sum(0))
    got = hp.resolve_importance(np.ones((3, 4)))
    np.testing.assert_array_equal(got, np.full(4, 3.0))


def test_vit_vlm_search_space_and_subnet():
    """CV dims (reference: FastNAS CV search space): ViT width/depth are
    searchable on VLM bundles and the sliced subnet still runs."""
    import jax.numpy as jnp

    from modelopt_tpu.models import VLM, tiny_vlm_config
    from modelopt_tpu.prune import vit_prune

    cfg = tiny_vlm_config()
    m = VLM(cfg)
    ids = jnp.zeros((1, 5), jnp.int32)
    px = jnp.asarray(np.random.default_rng(0).normal(size=(1, 16, 16, 3)),
                     jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), ids, px)
    bundle = ModelBundle(module=m, variables=dict(variables),
                         example_inputs=(ids, px))

    sp = mtn.search_space(bundle)
    assert set(sp) == {"vit_intermediate_size", "vit_num_layers"}
    assert max(sp["vit_intermediate_size"].choices) == 64
    # tap at -2 keeps depth >= 2
    assert min(sp["vit_num_layers"].choices) >= 2

    small = vit_prune(bundle, {"vit_intermediate_size": 32})
    assert small.module.cfg.vision.intermediate_size == 32
    fc1 = small.variables["params"]["vision_tower"]["layers_0"]["fc1"]
    assert fc1["kernel"].shape[1] == 32
    logits, _ = small.apply(ids, px)
    assert np.isfinite(np.asarray(logits)).all()
    # search end-to-end on the CV dims
    def score(b):
        out, _ = b.apply(ids, px)
        return -float(jnp.mean(out.astype(jnp.float32) ** 2))

    best, info = mtn.search(bundle, score, mode="evolve", iterations=3, seed=0)
    assert info["params"] <= mtn.profile(bundle)["params"]
