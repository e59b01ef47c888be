"""Tree speculative decoding (speculative/tree.py): topology, greedy
tree acceptance, KV-row compaction, and engine-level losslessness +
acceptance-length advantage over chain drafts (reference counterpart:
modelopt/torch/speculative/plugins/hf_eagle.py:431 TTT masks and the
medusa tree choices its deployment targets verify)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import modelopt_tpu.speculative as mtsp
from modelopt_tpu.core import ModelBundle
from modelopt_tpu.models import Decoder, tiny_test_config
from modelopt_tpu.serve import ServingEngine
from modelopt_tpu.speculative.tree import (
    SpecTree,
    chain_choices,
    compact_accepted_rows,
    tree_from_branching,
    tree_verify_greedy,
)


class TestTopology:
    def test_branching(self):
        t = SpecTree(tree_from_branching((3, 2)))
        assert t.num_nodes == 1 + 3 + 6
        assert t.max_depth == 2
        d = t.depths
        assert list(d[:4]) == [0, 1, 1, 1]

    def test_chain_is_a_path(self):
        t = SpecTree(chain_choices(3))
        assert t.num_nodes == 4
        assert list(t.parents) == [-1, 0, 1, 2]
        anc = np.asarray(t.ancestor_mask())
        assert np.array_equal(anc, np.tril(np.ones((4, 4), bool)))

    def test_orphan_choice_raises(self):
        with pytest.raises(ValueError, match="no parent"):
            SpecTree(((0, 0),))._build()

    def test_paths_pad_with_self(self):
        t = SpecTree(((0,), (1,), (0, 0)))
        p = t.paths  # [M, max_depth+1]
        # node 2 = choice (1,) has depth 1; its padded path repeats itself
        assert p[2, 0] == 0 and p[2, 1] == 2

    def test_hashable(self):
        assert hash(SpecTree(chain_choices(2))) == hash(
            SpecTree(chain_choices(2)))


class TestVerify:
    def test_deepest_path_wins(self):
        # tree: root; children a=(0,), b=(1,); grandchild (1,0) under b
        t = SpecTree(((0,), (1,), (1, 0)))
        # node order: root, (0,), (1,), (1,0)
        node_tokens = jnp.asarray([[7, 5, 9, 4]])  # root fed 7
        # root predicts 9 -> child (1,) [token 9] accepted, (0,) [5] not;
        # node (1,) predicts 4 -> grandchild accepted; its pred 2 = bonus
        preds = jnp.asarray([[9, 0, 4, 2]])
        best, n_acc, emitted = tree_verify_greedy(preds, node_tokens, t)
        assert int(best[0]) == 3 and int(n_acc[0]) == 2
        assert list(np.asarray(emitted[0])) == [9, 4, 2]

    def test_root_only(self):
        t = SpecTree(((0,), (1,)))
        node_tokens = jnp.asarray([[7, 5, 9]])
        preds = jnp.asarray([[3, 0, 0]])  # predicts 3: no child matches
        best, n_acc, emitted = tree_verify_greedy(preds, node_tokens, t)
        assert int(best[0]) == 0 and int(n_acc[0]) == 0
        assert int(emitted[0, 0]) == 3  # bonus token at the root

    def test_tie_breaks_to_lowest_rank(self):
        # two identical children can both be "accepted" only if their
        # tokens are equal; argmax picks the first (lowest rank)
        t = SpecTree(((0,), (1,)))
        node_tokens = jnp.asarray([[7, 5, 5]])
        preds = jnp.asarray([[5, 1, 2]])
        best, n_acc, _ = tree_verify_greedy(preds, node_tokens, t)
        assert int(best[0]) == 1 and int(n_acc[0]) == 1


class TestCompaction:
    def test_rows_move_to_front(self):
        B, S, W = 1, 8, 4
        slab = jnp.arange(B * S * W, dtype=jnp.float32).reshape(B, S, W)
        lengths = jnp.asarray([2])
        # accepted path = tree nodes [0, 2, 3] -> rows 2+0, 2+2, 2+3
        prows = jnp.asarray([[0, 2, 3]])
        out = compact_accepted_rows(slab, lengths, prows, 3)
        ref = np.asarray(slab)
        want = ref.copy()
        want[0, 2] = ref[0, 2]
        want[0, 3] = ref[0, 4]
        want[0, 4] = ref[0, 5]
        np.testing.assert_array_equal(np.asarray(out), want)

    def test_per_batch_lengths(self):
        B, S, W = 2, 8, 2
        slab = jnp.arange(B * S * W, dtype=jnp.float32).reshape(B, S, W)
        lengths = jnp.asarray([1, 4])
        prows = jnp.asarray([[0, 3], [0, 1]])
        out = np.asarray(compact_accepted_rows(slab, lengths, prows, 2))
        ref = np.asarray(slab)
        assert np.array_equal(out[0, 2], ref[0, 4])   # 1+1 <- 1+3
        assert np.array_equal(out[1, 5], ref[1, 5])   # 4+1 <- 4+1


@pytest.fixture(scope="module")
def base_bundle():
    cfg = tiny_test_config(dtype=jnp.float32, param_dtype=jnp.float32)
    m = Decoder(cfg)
    ids = jnp.zeros((1, 8), jnp.int32)
    v = m.init(jax.random.PRNGKey(0), ids)
    return ModelBundle(module=m, variables=dict(v), example_inputs=(ids,))


def _naive_greedy(bundle, prompt, n):
    toks = list(prompt)
    fn = jax.jit(bundle.make_fn())
    for _ in range(n):
        logits, _ = fn(bundle.variables, jnp.asarray([toks], jnp.int32))
        toks.append(int(jnp.argmax(logits[0, -1])))
    return toks[len(prompt):]


class TestTreeEngine:
    def test_medusa_tree_lossless(self, base_bundle):
        m = mtsp.convert(base_bundle, [("medusa", {"medusa_num_heads": 3})])
        eng = ServingEngine(m, max_batch=2, max_seq_len=64,
                            prefill_buckets=(16,), speculative=3,
                            spec_tree=tree_from_branching((3, 2, 1)))
        prompts = [[5, 17, 42, 7], [9, 1, 30]]
        reqs = [eng.submit(p, max_new_tokens=7) for p in prompts]
        eng.run()
        for p, r in zip(prompts, reqs):
            assert r.done and len(r.out_tokens) == 7
            assert r.out_tokens == _naive_greedy(m, p, 7), (p, r.out_tokens)

    def test_eagle_tree_lossless(self, base_bundle):
        m = mtsp.convert(base_bundle, [("eagle", {"num_draft_layers": 1})])
        eng = ServingEngine(m, max_batch=2, max_seq_len=64,
                            prefill_buckets=(16,), speculative=2,
                            spec_tree=tree_from_branching((2, 2)))
        prompts = [[5, 17, 42, 7], [9, 1, 30]]
        reqs = [eng.submit(p, max_new_tokens=7) for p in prompts]
        eng.run()
        for p, r in zip(prompts, reqs):
            assert r.done and len(r.out_tokens) == 7
            assert r.out_tokens == _naive_greedy(m, p, 7), (p, r.out_tokens)

    def test_chain_shaped_tree_matches_chain(self, base_bundle):
        """A degenerate path tree must accept exactly what the chain
        verifier accepts — same drafts, same rule."""
        m = mtsp.convert(base_bundle, [("medusa", {"medusa_num_heads": 2})])
        prompt = [5, 17, 42, 7]
        chain = ServingEngine(m, max_batch=1, max_seq_len=64,
                              prefill_buckets=(16,), speculative=2)
        r1 = chain.submit(prompt, max_new_tokens=8)
        chain.run()
        treng = ServingEngine(m, max_batch=1, max_seq_len=64,
                              prefill_buckets=(16,), speculative=2,
                              spec_tree=chain_choices(2))
        r2 = treng.submit(prompt, max_new_tokens=8)
        treng.run()
        assert r1.out_tokens == r2.out_tokens
        assert chain.stats["draft_accepted"] == treng.stats["draft_accepted"]
        assert chain.stats["verify_forwards"] == treng.stats["verify_forwards"]

    def test_tree_acceptance_beats_chain(self, base_bundle):
        """On a TRAINED toy, hedging with multiple children per depth must
        accept at least as many drafts per verify as the chain — the point
        of trees. (>= with a margin-free bound keeps the test robust; the
        structural claim is 'never worse', measured here as acceptance per
        verify forward.)"""
        import optax

        from modelopt_tpu.speculative.medusa import make_medusa_train_step

        m = mtsp.convert(base_bundle, [("medusa", {"medusa_num_heads": 2})])
        rng = np.random.default_rng(0)
        # a learnable repetitive stream so heads pick up real signal
        data = jnp.asarray(
            np.tile(rng.integers(5, 37, 16), (4, 3)), jnp.int32)
        init_state, step = make_medusa_train_step(
            m, optax.adam(1e-2))
        state = init_state()
        for _ in range(60):
            state, _ = step(state, data)
        m = m.replace(variables={
            **m.variables,
            "params": {**m.variables["params"], **state[0]}})

        def acceptance(**kw):
            eng = ServingEngine(m, max_batch=1, max_seq_len=128,
                                prefill_buckets=(16,), **kw)
            req = eng.submit(list(map(int, np.asarray(data[0, :10]))),
                             max_new_tokens=40)
            eng.run()
            return (eng.stats["tokens_emitted"]
                    / max(eng.stats["verify_forwards"], 1))

        chain = acceptance(speculative=2)
        tree = acceptance(speculative=2,
                          spec_tree=tree_from_branching((3, 2)))
        assert tree >= chain, (tree, chain)

    def test_tree_guards(self, base_bundle):
        m = mtsp.convert(base_bundle, [("medusa", {"medusa_num_heads": 2})])
        with pytest.raises(ValueError, match="speculative"):
            ServingEngine(m, spec_tree=chain_choices(2))
        with pytest.raises(NotImplementedError, match="paged"):
            ServingEngine(m, speculative=2, paged=True, page_size=64,
                          max_seq_len=512, spec_tree=chain_choices(2))
        with pytest.raises(ValueError, match="medusa heads"):
            ServingEngine(m, max_seq_len=64, prefill_buckets=(16,),
                          speculative=3, spec_tree=chain_choices(3))
