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

    def test_ttt_mask_structure(self):
        """Pin the multi-step TTT mask rule (reference utils.py:539): a
        step-j query at token t sees step-0 keys <= t-j plus one diagonal
        key per intermediate step."""
        from modelopt_tpu.speculative.eagle import _ttt_mask

        m = np.asarray(_ttt_mask(2, 4))  # 3 blocks of T=4 -> [12, 12]
        ok = m == 0.0
        # step-0 block: plain causal
        assert np.array_equal(ok[:4, :4], np.tril(np.ones((4, 4), bool)))
        # step-2 query at t=3 (row 11): block-0 keys <= 1, diagonal key in
        # block 1 at t=2 (col 6), block 2 at t=3 (col 11)
        assert list(np.nonzero(ok[11])[0]) == [0, 1, 6, 11]
        # step-1 query at t=0 (row 4): nothing in block 0 (t-1 < 0), own
        # diagonal in block 1 (col 4)
        assert list(np.nonzero(ok[4])[0]) == [4]

    def test_ttt_training_reduces_loss(self, base_bundle):
        """Multi-step (TTT) training runs end-to-end and converges; step-0
        term equals the single-step recipe so the loss ladder is
        comparable."""
        e = mtsp.convert(base_bundle, [("eagle", {})])
        init_state, step = mtsp.make_eagle_train_step(
            e, optax.adam(3e-3), ttt_steps=3, ttt_decay=0.9)
        state = init_state()
        batches = synthetic_token_batches(256, 1, 4, 24)
        losses = []
        for _ in range(20):
            state, loss = step(state, batches[0])
            losses.append(float(loss))
        assert np.isfinite(losses).all()
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


class TestDFlash:
    """Block-parallel draft with KV injection (reference:
    plugins/modeling_dflash.py, hf_dflash.py)."""

    def test_convert_attaches_draft_and_base_unchanged(self, base_bundle):
        d = mtsp.convert(base_bundle, [("dflash", {"block_size": 4,
                                                   "num_draft_layers": 1})])
        p = d.variables["params"]
        assert "base" in p and "draft_0" in p and "mask_embedding" in p
        logits, _ = d.apply(*base_bundle.example_inputs)
        np.testing.assert_allclose(
            np.asarray(logits),
            np.asarray(base_bundle.apply(*base_bundle.example_inputs)[0]),
            atol=1e-5,
        )

    def test_draft_block_shape_and_ctx_masking(self, base_bundle):
        from modelopt_tpu.speculative.dflash import DFlashModel

        d = mtsp.convert(base_bundle, [("dflash", {"block_size": 4,
                                                   "num_draft_layers": 1})])
        m = d.module
        ids = base_bundle.example_inputs[0]
        _, _, feats = d.apply(ids, output_hidden=True)
        anchor = ids[:, -1:]
        B, T = ids.shape
        pos = jnp.full((B,), T - 1, jnp.int32)
        blog = m.apply(d.variables, anchor, feats, pos,
                       method=DFlashModel.draft_block)
        assert blog.shape == (B, 4, m.cfg.vocab_size)
        # ctx masking: an early anchor must ignore later context features —
        # corrupting features AFTER the anchor cannot change the block
        pos_early = jnp.full((B,), 5, jnp.int32)
        anchor_early = ids[:, 5:6]
        b1 = m.apply(d.variables, anchor_early, feats, pos_early,
                     method=DFlashModel.draft_block)
        feats_corrupt = feats.at[:, 8:].set(1e3)
        b2 = m.apply(d.variables, anchor_early, feats_corrupt, pos_early,
                     method=DFlashModel.draft_block)
        np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=1e-5)

    def test_training_reduces_loss(self, base_bundle):
        d = mtsp.convert(base_bundle, [("dflash", {"block_size": 3,
                                                   "num_draft_layers": 1})])
        init_state, step = mtsp.make_dflash_train_step(d, optax.adam(3e-3))
        state = init_state()
        batches = synthetic_token_batches(256, 1, 4, 24)
        losses = []
        for _ in range(25):
            state, loss = step(state, batches[0])
            losses.append(float(loss))
        assert losses[-1] < losses[0]

    def test_lossless_greedy_dflash(self, base_bundle):
        d = mtsp.convert(base_bundle, [("dflash", {"block_size": 4,
                                                   "num_draft_layers": 1})])
        prompt = [5, 9, 17, 3]
        plain = plain_greedy(base_bundle, prompt, 12)
        spec, stats = mtsp.speculative_decode(d, prompt, max_new_tokens=12,
                                              draft_len=4)
        assert spec == plain  # lossless invariant
        assert stats["base_forwards"] >= 1

    def test_state_roundtrip(self, base_bundle):
        d = mtsp.convert(base_bundle, [("dflash", {"block_size": 4})])
        st = modelopt_state(d)
        assert st["modelopt_state_dict"][0]["mode"] == "dflash"
        fresh = restore_from_modelopt_state(base_bundle, st)
        assert isinstance(fresh.module, mtsp.DFlashModel)
        assert fresh.module.dflash_cfg.block_size == 4

    def test_dflash_export(self, base_bundle, tmp_path):
        from modelopt_tpu.export.spec_export import export_spec_checkpoint

        d = mtsp.convert(base_bundle, [("dflash", {"block_size": 4,
                                                   "num_draft_layers": 2})])
        state = export_spec_checkpoint(d, str(tmp_path))
        assert "fc.weight" in state and "mask_embedding" in state
        assert "layers.1.self_attn.k_norm.weight" in state
        import json
        cfg = json.load(open(tmp_path / "config.json"))
        assert cfg["dflash_config"]["block_size"] == 4
        assert len(cfg["dflash_config"]["target_layer_ids"]) >= 1


class TestDraftVocab:
    """Reduced DRAFT vocabulary (reference: hf_eagle.py d2t buffer +
    utils.py:43 calibrate_frequent_vocab): the draft head scores only the
    most frequent tokens; a d2t offset buffer maps back to target ids."""

    def _reduced(self, base_bundle, vd=64):
        e = mtsp.convert(base_bundle,
                         [("eagle", {"draft_vocab_size": vd})])
        # skewed calibration stream: tokens [64, 128) dominate, so the
        # most-common set is unambiguous (uniform data is all ties)
        rng = np.random.default_rng(3)
        reps = np.tile(np.arange(64, 128, dtype=np.int32), 8)
        batches = [jnp.asarray(rng.permutation(reps).reshape(8, 64))
                   for _ in range(3)]
        return mtsp.calibrate_draft_vocab(e, batches), batches

    def test_d2t_maps_most_common(self, base_bundle):
        e, batches = self._reduced(base_bundle)
        d2t = np.asarray(e.variables["buffers"]["d2t"])
        mapped = {int(i + d2t[i]) for i in range(64)}
        # the dominant band must fill the draft vocabulary
        assert mapped == set(range(64, 128))

    def test_draft_logits_confined_to_draft_vocab(self, base_bundle):
        e, _ = self._reduced(base_bundle)
        ids = jnp.asarray([[5, 9, 17, 3]], jnp.int32)
        _, _, hidden = e.apply(ids, output_hidden=True)
        dl, _ = e.apply(ids, hidden, method=mtsp.EagleModel.draft)
        d2t = np.asarray(e.variables["buffers"]["d2t"])
        support = {int(i + d2t[i]) for i in range(64)}
        finite = np.asarray(dl[0, -1]) > -1e8
        assert set(np.nonzero(finite)[0].tolist()) <= support
        assert int(np.argmax(np.asarray(dl[0, -1]))) in support

    def test_training_and_lossless_decode(self, base_bundle):
        e, batches = self._reduced(base_bundle)
        init_state, step = mtsp.make_eagle_train_step(
            e, optax.adam(3e-3), ttt_steps=2)
        state = init_state()
        losses = []
        for _ in range(10):
            state, loss = step(state, batches[0])
            losses.append(float(loss))
        assert np.isfinite(losses).all() and losses[-1] < losses[0]
        # verification keeps greedy LOSSLESS regardless of draft vocab
        prompt = [5, 9, 17, 3]
        ref = plain_greedy(e, prompt, 7)
        out, stats = mtsp.speculative_decode(e, prompt, max_new_tokens=7,
                                             draft_len=3)
        assert out == ref

    def test_engine_tree_with_draft_vocab(self, base_bundle):
        from modelopt_tpu.serve import ServingEngine
        from modelopt_tpu.speculative.tree import tree_from_branching

        e, _ = self._reduced(base_bundle)
        eng = ServingEngine(e, max_batch=1, max_seq_len=64,
                            prefill_buckets=(16,), speculative=2,
                            spec_tree=tree_from_branching((2, 1)))
        req = eng.submit([5, 9, 17, 3], max_new_tokens=6)
        eng.run()
        assert req.out_tokens == plain_greedy(e, [5, 9, 17, 3], 6)
