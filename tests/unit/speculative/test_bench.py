"""Engine-comparative specdec bench harness (reference analogue:
examples/specdec_bench — acceptance length/rate + timing across drafts)."""

import jax
import jax.numpy as jnp
import pytest

import modelopt_tpu.speculative as mtsp
from modelopt_tpu.core import ModelBundle
from modelopt_tpu.models import Decoder, tiny_test_config


@pytest.fixture(scope="module")
def base_bundle():
    cfg = tiny_test_config(dtype=jnp.float32)
    m = Decoder(cfg)
    ids = jnp.zeros((1, 8), jnp.int32)
    variables = m.init(jax.random.PRNGKey(0), ids)
    return ModelBundle(module=m, variables=dict(variables), example_inputs=(ids,))


def test_random_token_prompts_shapes():
    prompts = mtsp.random_token_prompts(5, vocab_size=64, min_len=3, max_len=9)
    assert len(prompts) == 5
    for p in prompts:
        assert 3 <= len(p) <= 9
        assert all(0 <= t < 64 for t in p)


def test_bench_modes_lossless_and_stats(base_bundle):
    """All draft architectures through the engine on the same prompts:
    outputs must be byte-identical to the plain engine (lossless), and
    acceptance-length/rate metrics must be populated and consistent."""
    bundles = {
        "base": base_bundle,
        "medusa": mtsp.convert(base_bundle, [("medusa", {"medusa_num_heads": 2})]),
        "eagle": mtsp.convert(base_bundle, [("eagle", {"num_draft_layers": 1})]),
        "dflash": mtsp.convert(
            base_bundle,
            [("dflash", {"num_draft_layers": 1, "block_size": 2})],
        ),
    }
    prompts = mtsp.random_token_prompts(
        3, vocab_size=base_bundle.module.cfg.vocab_size, min_len=3, max_len=8
    )
    results = mtsp.bench_engine_modes(
        bundles, prompts, max_new_tokens=6, spec_k=2,
        max_batch=2, max_seq_len=64, prefill_buckets=(16,),
    )
    assert set(results) == set(bundles)
    base = results["base"]
    assert base["tokens_per_forward"] == pytest.approx(1.0)
    assert base["acceptance_rate"] == 0.0
    for name in ("medusa", "eagle", "dflash"):
        r = results[name]
        # lossless was already asserted inside the harness; sanity re-check
        assert r["outputs"] == base["outputs"]
        assert r["stats"]["verify_forwards"] > 0
        assert 0.0 <= r["acceptance_rate"] <= 1.0
        # K drafts per verify: AL can never exceed K+1
        assert r["tokens_per_forward"] <= r["speculative"] + 1 + 1e-9
    report = mtsp.format_report(results)
    assert "dflash" in report and "tok/s" in report


def test_bench_detects_lossy_mode(base_bundle):
    """A 'draft' bundle with different base weights is NOT lossless — the
    harness must catch it rather than report a bogus speedup."""
    import dataclasses

    other = dataclasses.replace(
        base_bundle,
        variables=jax.tree.map(
            lambda x: x + 0.05 if x.dtype == jnp.float32 else x,
            dict(base_bundle.variables),
        ),
    )
    bundles = {
        "base": base_bundle,
        "tampered": mtsp.convert(other, [("medusa", {"medusa_num_heads": 2})]),
    }
    prompts = [[5, 17, 42, 7]]
    with pytest.raises(AssertionError, match="not lossless"):
        mtsp.bench_engine_modes(
            bundles, prompts, max_new_tokens=6, spec_k=2,
            max_batch=1, max_seq_len=64, prefill_buckets=(16,),
        )
