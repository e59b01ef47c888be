"""Speculative decoding tests: conversion, draft training reduces loss, and
the key invariant — greedy speculative decoding is LOSSLESS vs plain greedy
(reference analogue: tests/unit/torch/speculative/)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import modelopt_tpu.speculative as mtsp
from modelopt_tpu.core import ModelBundle, modelopt_state, restore_from_modelopt_state
from modelopt_tpu.models import Decoder, tiny_test_config
from modelopt_tpu.utils import synthetic_token_batches


@pytest.fixture(scope="module")
def base_bundle():
    cfg = tiny_test_config(dtype=jnp.float32)
    m = Decoder(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 24)), jnp.int32)
    variables = m.init(jax.random.PRNGKey(0), ids)
    return ModelBundle(module=m, variables=dict(variables), example_inputs=(ids,))


def plain_greedy(bundle, prompt, n, base_key="base"):
    toks = list(prompt)
    for _ in range(n):
        out = bundle.apply(jnp.asarray([toks], jnp.int32))
        logits = out[0]
        toks.append(int(jnp.argmax(logits[0, -1])))
    return toks[len(prompt):]


class TestEagle:
    def test_convert_attaches_draft(self, base_bundle):
        e = mtsp.convert(base_bundle, [("eagle", {"num_draft_layers": 1})])
        assert "eagle" in e.variables["params"]
        assert "base" in e.variables["params"]
        logits, _ = e.apply(*base_bundle.example_inputs)
        np.testing.assert_allclose(
            np.asarray(logits),
            np.asarray(base_bundle.apply(*base_bundle.example_inputs)[0]),
            atol=1e-5,
        )

    def test_eagle_training_reduces_loss(self, base_bundle):
        e = mtsp.convert(base_bundle, [("eagle", {})])
        init_state, step = mtsp.make_eagle_train_step(e, optax.adam(3e-3))
        state = init_state()
        batches = synthetic_token_batches(256, 1, 4, 24)
        losses = []
        for _ in range(20):
            state, loss = step(state, batches[0])
            losses.append(float(loss))
        assert losses[-1] < losses[0]

    def test_lossless_greedy(self, base_bundle):
        e = mtsp.convert(base_bundle, [("eagle", {})])
        prompt = [5, 9, 17, 3]
        ref = plain_greedy(e, prompt, 7)
        out, stats = mtsp.speculative_decode(e, prompt, max_new_tokens=7, draft_len=3)
        assert out == ref, (out, ref)
        assert stats["base_forwards"] <= 8  # never worse than 1/token

    def test_state_roundtrip(self, base_bundle):
        e = mtsp.convert(base_bundle, [("eagle", {"num_draft_layers": 1})])
        st = modelopt_state(e)
        assert st["modelopt_state_dict"][0]["mode"] == "eagle"
        fresh = restore_from_modelopt_state(base_bundle, st)
        assert isinstance(fresh.module, mtsp.EagleModel)


class TestMedusa:
    def test_convert_and_train(self, base_bundle):
        m = mtsp.convert(base_bundle, [("medusa", {"medusa_num_heads": 2})])
        assert any(k.startswith("head_") for k in m.variables["params"])
        init_state, step = mtsp.make_medusa_train_step(m, optax.adam(3e-3))
        state = init_state()
        batches = synthetic_token_batches(256, 1, 4, 24)
        losses = []
        for _ in range(15):
            state, loss = step(state, batches[0])
            losses.append(float(loss))
        assert losses[-1] < losses[0]

    def test_lossless_greedy_medusa(self, base_bundle):
        m = mtsp.convert(base_bundle, [("medusa", {"medusa_num_heads": 3})])
        prompt = [1, 2, 3]
        ref = plain_greedy(m, prompt, 10)
        out, stats = mtsp.speculative_decode(m, prompt, max_new_tokens=10, draft_len=3)
        assert out == ref
