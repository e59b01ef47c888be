"""Serving-engine correctness: generated tokens must match a naive
full-forward greedy loop; continuous batching with staggered arrivals and
slot reuse; fp8 KV cache path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import modelopt_tpu.quant as mtq
from modelopt_tpu.core import ModelBundle
from modelopt_tpu.models import Decoder, tiny_test_config
from modelopt_tpu.serve import ServingEngine


@pytest.fixture(scope="module")
def bundle():
    cfg = tiny_test_config(dtype=jnp.float32)
    m = Decoder(cfg)
    ids = jnp.zeros((1, 8), jnp.int32)
    variables = m.init(jax.random.PRNGKey(0), ids)
    return ModelBundle(module=m, variables=dict(variables), example_inputs=(ids,))


def naive_greedy(bundle, prompt, n):
    """Reference: re-run the full sequence every step, no cache."""
    toks = list(prompt)
    fn = jax.jit(bundle.make_fn())
    for _ in range(n):
        logits, _ = fn(bundle.variables, jnp.asarray([toks], jnp.int32))
        toks.append(int(jnp.argmax(logits[0, -1])))
    return toks[len(prompt):]


class TestEngine:
    def test_single_request_matches_naive(self, bundle):
        prompt = [5, 17, 42, 7]
        eng = ServingEngine(bundle, max_batch=2, max_seq_len=64, prefill_buckets=(16,))
        req = eng.submit(prompt, max_new_tokens=6)
        eng.run()
        assert req.done
        assert req.out_tokens == naive_greedy(bundle, prompt, 6)

    def test_continuous_batching_staggered(self, bundle):
        eng = ServingEngine(bundle, max_batch=2, max_seq_len=64, prefill_buckets=(16,))
        prompts = [[5, 17, 42], [9, 9, 1, 30], [2, 4], [11, 3, 8, 20, 1]]
        reqs = [eng.submit(p, max_new_tokens=5) for p in prompts[:3]]
        # run a few ticks, then a late arrival (tests slot reuse)
        for _ in range(4):
            eng.step()
        reqs.append(eng.submit(prompts[3], max_new_tokens=5))
        eng.run()
        for p, r in zip(prompts, reqs):
            assert r.done and len(r.out_tokens) == 5
            assert r.out_tokens == naive_greedy(bundle, p, 5), f"prompt {p}"

    def test_eos_stops(self, bundle):
        prompt = [5, 17, 42, 7]
        ref = naive_greedy(bundle, prompt, 8)
        eos = ref[2]
        eng = ServingEngine(bundle, max_batch=1, max_seq_len=64, prefill_buckets=(16,))
        req = eng.submit(prompt, max_new_tokens=8, eos_id=eos)
        eng.run()
        assert req.done and req.out_tokens == ref[:3]

    def test_temperature_sampling_runs(self, bundle):
        eng = ServingEngine(bundle, max_batch=2, max_seq_len=64, prefill_buckets=(16,))
        req = eng.submit([1, 2, 3], max_new_tokens=10, temperature=1.0)
        eng.run()
        assert len(req.out_tokens) == 10

    def test_fp8_kv_cache_quantized_engine(self, bundle):
        x = jnp.asarray([[5, 17, 42, 7, 1, 2, 3, 4]], jnp.int32)
        q = mtq.quantize(bundle, mtq.FP8_KV_CFG, lambda f: f(x))
        eng = ServingEngine(q, max_batch=2, max_seq_len=64, prefill_buckets=(16,),
                            kv_dtype=jnp.float8_e4m3fn)
        assert eng.cache["k"][0].dtype == jnp.float8_e4m3fn
        prompt = [5, 17, 42, 7]
        req = eng.submit(prompt, max_new_tokens=6)
        eng.run()
        # fp8 KV introduces small noise; compare against the quantized
        # model's own naive greedy decode (bf16 cache-free path)
        ref = naive_greedy(q, prompt, 6)
        agree = sum(a == b for a, b in zip(req.out_tokens, ref))
        assert agree >= 4, (req.out_tokens, ref)

    def test_compressed_model_serving(self, bundle):
        x = jnp.asarray([[5, 17, 42, 7, 1, 2, 3, 4]], jnp.int32)
        q = mtq.quantize(bundle, mtq.INT8_DEFAULT_CFG, lambda f: f(x))
        c = mtq.compress(q)
        eng = ServingEngine(c, max_batch=2, max_seq_len=64, prefill_buckets=(16,))
        req = eng.submit([5, 17, 42], max_new_tokens=5)
        eng.run()
        assert req.done
        assert req.out_tokens == naive_greedy(c, [5, 17, 42], 5)


class TestScheduler:
    def test_chunked_prefill_matches_naive(self, bundle):
        """Prompt longer than the largest bucket streams in chunks."""
        rng = np.random.default_rng(0)
        prompt = list(map(int, rng.integers(0, 255, 23)))  # bucket is 8
        eng = ServingEngine(bundle, max_batch=2, max_seq_len=64,
                            prefill_buckets=(8,))
        req = eng.submit(prompt, max_new_tokens=5)
        eng.run()
        assert req.done
        assert req.out_tokens == naive_greedy(bundle, prompt, 5)

    def test_decode_never_starves(self, bundle):
        """With a deep queue, every tick still decodes all active slots."""
        eng = ServingEngine(bundle, max_batch=2, max_seq_len=64,
                            prefill_buckets=(16,), max_admit=1)
        reqs = [eng.submit([i + 1, i + 2, i + 3], max_new_tokens=20)
                for i in range(8)]
        eng.step()  # admits req0 (prefill emits its first token)
        eng.step()  # admits req1 + decodes req0
        for _ in range(10):
            if eng.num_decoding == 0:
                break
            before = [len(r.out_tokens) for r in reqs]
            n_dec = eng.num_decoding
            eng.step()
            after = [len(r.out_tokens) for r in reqs]
            grew = sum(b != a for b, a in zip(before, after))
            # every decoding slot progressed despite the queue backlog
            assert grew >= n_dec
        # correctness of the first two requests against the naive loop
        eng.run()
        for r in reqs:
            assert r.done and len(r.out_tokens) == 20

    def test_multi_admission_per_tick(self, bundle):
        eng = ServingEngine(bundle, max_batch=4, max_seq_len=64,
                            prefill_buckets=(16,), max_admit=4)
        reqs = [eng.submit([i + 1, 2], max_new_tokens=4) for i in range(4)]
        eng.step()
        assert eng.num_active == 4  # all four admitted in one tick
        eng.run()
        for r in reqs:
            assert r.done and len(r.out_tokens) == 4


class TestPagedEngine:
    def test_paged_matches_naive(self, bundle):
        eng = ServingEngine(bundle, max_batch=2, max_seq_len=64,
                            prefill_buckets=(16,), paged=True, page_size=16)
        prompts = [[5, 17, 42, 7], [9, 9, 1, 30]]
        reqs = [eng.submit(p, max_new_tokens=6) for p in prompts]
        eng.run()
        for p, r in zip(prompts, reqs):
            assert r.done
            assert r.out_tokens == naive_greedy(bundle, p, 6), (p, r.out_tokens)

    def test_paged_memory_scales_with_active_tokens(self, bundle):
        # pool smaller than worst case: 2 slots * 4 pages would need 8+null;
        # give 6 — fine for short requests
        eng = ServingEngine(bundle, max_batch=2, max_seq_len=64,
                            prefill_buckets=(16,), paged=True, page_size=16,
                            kv_pages=6)
        r1 = eng.submit([1, 2, 3], max_new_tokens=4)
        r2 = eng.submit([4, 5], max_new_tokens=4)
        eng.run()
        assert r1.done and r2.done
        assert eng.allocator.free_pages == 5  # all pages returned

    def test_paged_pool_exhaustion_requeues(self, bundle):
        # 3 usable pages of 16 = 48 tokens; two 33-token prompts need
        # 3 pages each -> second must wait until the first finishes
        rng = np.random.default_rng(1)
        p1 = list(map(int, rng.integers(0, 255, 33)))
        p2 = list(map(int, rng.integers(0, 255, 33)))
        eng = ServingEngine(bundle, max_batch=2, max_seq_len=64,
                            prefill_buckets=(64,), paged=True, page_size=16,
                            kv_pages=4)
        r1 = eng.submit(p1, max_new_tokens=3)
        r2 = eng.submit(p2, max_new_tokens=3)
        eng.step()
        assert eng.num_active == 1  # r2 couldn't get pages yet
        eng.run()
        assert r1.done and r2.done
        assert r2.out_tokens == naive_greedy(bundle, p2, 3)

    def test_paged_chunked_long_prompt(self, bundle):
        rng = np.random.default_rng(2)
        prompt = list(map(int, rng.integers(0, 255, 40)))
        eng = ServingEngine(bundle, max_batch=2, max_seq_len=64,
                            prefill_buckets=(16,), paged=True, page_size=16)
        req = eng.submit(prompt, max_new_tokens=4)
        eng.run()
        assert req.done
        assert req.out_tokens == naive_greedy(bundle, prompt, 4)


class TestSpeculativeEngine:
    def test_spec_decode_lossless(self, bundle):
        import modelopt_tpu.speculative as mtsp

        m = mtsp.convert(bundle, [("medusa", {"medusa_num_heads": 3})])
        eng = ServingEngine(m, max_batch=2, max_seq_len=64,
                            prefill_buckets=(16,), speculative=3)
        prompts = [[5, 17, 42, 7], [9, 1, 30]]
        reqs = [eng.submit(p, max_new_tokens=7) for p in prompts]
        eng.run()
        for p, r in zip(prompts, reqs):
            assert r.done and len(r.out_tokens) == 7
            assert r.out_tokens == naive_greedy(m, p, 7), (p, r.out_tokens)

    def test_spec_engine_rejects_temperature(self, bundle):
        import modelopt_tpu.speculative as mtsp
        import pytest as _pt

        m = mtsp.convert(bundle, [("medusa", {"medusa_num_heads": 2})])
        eng = ServingEngine(m, max_batch=1, max_seq_len=64,
                            prefill_buckets=(16,), speculative=2)
        with _pt.raises(ValueError):
            eng.submit([1, 2], temperature=0.5)

    def test_eagle_engine_lossless(self, bundle):
        import modelopt_tpu.speculative as mtsp

        m = mtsp.convert(bundle, [("eagle", {"num_draft_layers": 1})])
        eng = ServingEngine(m, max_batch=2, max_seq_len=64,
                            prefill_buckets=(16,), speculative=2)
        prompts = [[5, 17, 42, 7], [9, 1, 30]]
        reqs = [eng.submit(p, max_new_tokens=7) for p in prompts]
        eng.run()
        for p, r in zip(prompts, reqs):
            assert r.done and len(r.out_tokens) == 7
            assert r.out_tokens == naive_greedy(m, p, 7), (p, r.out_tokens)

    def test_eagle3_taps_engine_lossless(self, bundle):
        """EAGLE-3-style feature taps: drafts come from multi-layer
        features; verification stays greedy-lossless."""
        import modelopt_tpu.speculative as mtsp

        m = mtsp.convert(
            bundle, [("eagle", {"num_draft_layers": 1, "feature_layers": (0,)})]
        )
        eng = ServingEngine(m, max_batch=1, max_seq_len=64,
                            prefill_buckets=(16,), speculative=2)
        req = eng.submit([5, 17, 42, 7], max_new_tokens=6)
        eng.run()
        assert req.done
        assert req.out_tokens == naive_greedy(m, [5, 17, 42, 7], 6)

    def test_eagle_paged_engine(self, bundle):
        import modelopt_tpu.speculative as mtsp

        m = mtsp.convert(bundle, [("eagle", {})])
        eng = ServingEngine(m, max_batch=2, max_seq_len=64,
                            prefill_buckets=(16,), speculative=2,
                            paged=True, page_size=16)
        req = eng.submit([5, 17, 42], max_new_tokens=6)
        eng.run()
        assert req.done
        assert req.out_tokens == naive_greedy(m, [5, 17, 42], 6)

    def test_spec_ticks_not_more_than_tokens(self, bundle):
        import modelopt_tpu.speculative as mtsp

        m = mtsp.convert(bundle, [("medusa", {"medusa_num_heads": 3})])
        eng = ServingEngine(m, max_batch=1, max_seq_len=64,
                            prefill_buckets=(16,), speculative=3)
        req = eng.submit([5, 17, 42], max_new_tokens=9)
        ticks = 0
        while not req.done and ticks < 50:
            eng.step()
            ticks += 1
        assert req.done
        assert ticks <= 10  # 1 prefill + at most 9 verify ticks

    def test_dflash_engine_lossless(self, bundle):
        """DFlash block-parallel drafts inside the engine: per-slot feature
        cache + one-forward drafting, output identical to plain greedy."""
        import modelopt_tpu.speculative as mtsp

        m = mtsp.convert(
            bundle, [("dflash", {"num_draft_layers": 1, "block_size": 3})]
        )
        eng = ServingEngine(m, max_batch=2, max_seq_len=64,
                            prefill_buckets=(16,), speculative=3)
        prompts = [[5, 17, 42, 7], [9, 1, 30]]
        reqs = [eng.submit(p, max_new_tokens=7) for p in prompts]
        eng.run()
        for p, r in zip(prompts, reqs):
            assert r.done and len(r.out_tokens) == 7
            assert r.out_tokens == naive_greedy(m, p, 7), (p, r.out_tokens)
        assert eng.stats["verify_forwards"] > 0
        assert eng.stats["draft_proposed"] >= eng.stats["draft_accepted"]

    def test_dflash_engine_chunked_prefill(self, bundle):
        """Feature cache stays consistent across prefill chunks (prompt
        longer than the bucket)."""
        import modelopt_tpu.speculative as mtsp

        m = mtsp.convert(
            bundle, [("dflash", {"num_draft_layers": 1, "block_size": 2})]
        )
        eng = ServingEngine(m, max_batch=1, max_seq_len=64,
                            prefill_buckets=(8,), speculative=2)
        prompt = list(range(2, 23))  # 21 tokens -> 3 chunks of 8
        req = eng.submit(prompt, max_new_tokens=5)
        eng.run()
        assert req.done
        assert req.out_tokens == naive_greedy(m, prompt, 5)


class TestMLAEngine:
    """MLA (DeepSeek-family) models serve through the same engine: the
    latent cache rides the standard cache pytree."""

    def test_mla_engine_matches_naive(self):
        from modelopt_tpu.models import tiny_mla_test_config

        cfg = tiny_mla_test_config(dtype=jnp.float32)
        m = Decoder(cfg)
        ids = jnp.zeros((1, 8), jnp.int32)
        variables = m.init(jax.random.PRNGKey(0), ids)
        b = ModelBundle(module=m, variables=dict(variables), example_inputs=(ids,))
        eng = ServingEngine(b, max_batch=2, max_seq_len=32, prefill_buckets=(16,))
        prompt = [5, 3, 7, 2]
        req = eng.submit(prompt, max_new_tokens=6)
        eng.run()
        assert req.done
        assert req.out_tokens == naive_greedy(b, prompt, 6)


class TestStopAndLogprobs:
    def test_stop_sequence_trims_and_finishes(self, bundle):
        # discover what greedy emits, then stop on its 3rd-4th tokens
        full = naive_greedy(bundle, [5, 17, 42, 7], 6)
        eng = ServingEngine(bundle, max_batch=2, max_seq_len=64,
                            prefill_buckets=(16,))
        req = eng.submit([5, 17, 42, 7], max_new_tokens=6,
                         stop_sequences=[full[2:4]])
        eng.run()
        assert req.done and req.stop_reason == "stop"
        assert req.out_tokens == full[:2]  # stop tail trimmed

    def test_logprobs_emitted_and_consistent(self, bundle):
        import math

        eng = ServingEngine(bundle, max_batch=2, max_seq_len=64,
                            prefill_buckets=(16,))
        req = eng.submit([5, 17, 42, 7], max_new_tokens=5)
        eng.run()
        assert len(req.out_logprobs) == len(req.out_tokens) == 5
        assert all(lp is not None and lp <= 0.0 and math.isfinite(lp)
                   for lp in req.out_logprobs)
        # greedy tokens: each logprob is the max over the vocab => > log(1/V)
        assert all(lp > math.log(1.0 / bundle.module.cfg.vocab_size)
                   for lp in req.out_logprobs)
        assert req.stop_reason == "length"


class TestNewFamilyEngine:
    """Families with alternating windows / sinks / chunked attention must
    serve with exact greedy parity (per-layer masks at decode time)."""

    @pytest.mark.parametrize("family", ["gemma3", "gptoss"])
    def test_family_engine_matches_naive(self, family):
        from modelopt_tpu.models import (
            tiny_gemma3_test_config, tiny_gptoss_test_config,
        )

        cfg = {"gemma3": tiny_gemma3_test_config,
               "gptoss": tiny_gptoss_test_config}[family](dtype=jnp.float32)
        m = Decoder(cfg)
        ids = jnp.zeros((1, 8), jnp.int32)
        v = m.init(jax.random.PRNGKey(0), ids)
        b = ModelBundle(module=m, variables=dict(v), example_inputs=(ids,))
        eng = ServingEngine(b, max_batch=2, max_seq_len=32,
                            prefill_buckets=(16,))
        prompt = [5, 3, 7, 2, 9]
        req = eng.submit(prompt, max_new_tokens=6)
        eng.run()
        assert req.done
        assert req.out_tokens == naive_greedy(b, prompt, 6)

    def test_mla_paged_engine_matches_naive(self):
        from modelopt_tpu.models import tiny_mla_test_config

        cfg = tiny_mla_test_config(dtype=jnp.float32)
        m = Decoder(cfg)
        ids = jnp.zeros((1, 8), jnp.int32)
        v = m.init(jax.random.PRNGKey(0), ids)
        b = ModelBundle(module=m, variables=dict(v), example_inputs=(ids,))
        eng = ServingEngine(b, max_batch=2, max_seq_len=32, paged=True,
                            page_size=8, prefill_buckets=(16,))
        prompt = [5, 3, 7, 2]
        req = eng.submit(prompt, max_new_tokens=6)
        eng.run()
        assert req.done
        assert req.out_tokens == naive_greedy(b, prompt, 6)


class TestInt8KV:
    def test_int8_kv_cache_quantized_engine(self, bundle):
        """INT8 KV cache path: calibrated per-tensor int8 codes + scale;
        greedy parity within quantization tolerance of the bf16 cache."""
        data = jnp.asarray([[5, 17, 42, 7, 3, 9, 1, 2]], jnp.int32)
        q = mtq.quantize(bundle, "INT8_KV_CFG", lambda f: f(data))
        eng = ServingEngine(q, max_batch=2, max_seq_len=64,
                            prefill_buckets=(16,), kv_dtype=jnp.int8)
        req = eng.submit([5, 17, 42, 7], max_new_tokens=6)
        eng.run()
        assert req.done and len(req.out_tokens) == 6

    def test_int8_kv_without_calibration_raises(self, bundle):
        with pytest.raises(ValueError, match="CALIBRATED"):
            eng = ServingEngine(bundle, max_batch=2, max_seq_len=64,
                                prefill_buckets=(16,), kv_dtype=jnp.int8)
            eng.submit([5, 3], max_new_tokens=2)
            eng.run()


class TestSmallCacheBuckets:
    def test_buckets_clamped_to_max_seq_len(self, bundle):
        from modelopt_tpu.serve import ServingEngine

        eng = ServingEngine(bundle, max_batch=2, max_seq_len=32)
        assert eng.prefill_buckets == (32,)
        req = eng.submit(list(range(1, 9)), max_new_tokens=6)
        eng.run()
        assert len(req.out_tokens) == 6

    def test_incompatible_cap_raises(self, bundle):
        import pytest as _pytest

        from modelopt_tpu.serve import ServingEngine

        with _pytest.raises(ValueError, match="multiple of"):
            ServingEngine(bundle, max_batch=2, max_seq_len=300,
                          prefill_buckets=(64, 256))


class TestTopKTopP:
    def test_filter_logits_math(self):
        from modelopt_tpu.serve.engine import _filter_logits

        lg = jnp.asarray([2.0, 1.0, 0.0, -1.0, -2.0])
        args = lambda k, p, m=0.0, t=1.0: (  # noqa: E731
            lg, jnp.int32(k), jnp.float32(p), jnp.float32(m), jnp.float32(t))
        # top_k=2 keeps exactly the two largest
        f = np.asarray(_filter_logits(*args(2, 1.0)))
        assert np.isfinite(f[:2]).all() and np.isneginf(f[2:]).all()
        # top_p just above the top-1 mass keeps the top-2 (first token kept
        # unconditionally, second starts below the p threshold)
        p1 = float(jax.nn.softmax(lg)[0])
        f = np.asarray(_filter_logits(*args(0, p1 + 0.01)))
        assert np.isfinite(f[:2]).all() and np.isneginf(f[2:]).all()
        # tiny top_p keeps only the argmax
        f = np.asarray(_filter_logits(*args(0, 1e-6)))
        assert np.isfinite(f[0]) and np.isneginf(f[1:]).all()
        # min_p at T=1: keep p_i >= m * p_max -> m just under p2/p1 keeps 2
        ratio = float(jax.nn.softmax(lg)[1] / jax.nn.softmax(lg)[0])
        f = np.asarray(_filter_logits(*args(0, 1.0, ratio - 1e-4)))
        assert np.isfinite(f[:2]).all() and np.isneginf(f[2:]).all()
        # identities
        f = np.asarray(_filter_logits(*args(0, 1.0)))
        np.testing.assert_allclose(f, np.asarray(lg))

    def test_top_k1_equals_greedy(self, bundle):
        from modelopt_tpu.serve import ServingEngine

        prompt = [5, 9, 2, 7]
        eng = ServingEngine(bundle, max_batch=2, max_seq_len=64,
                            prefill_buckets=(16,))
        greedy = eng.submit(prompt, max_new_tokens=8)
        eng.run()
        eng2 = ServingEngine(bundle, max_batch=2, max_seq_len=64,
                             prefill_buckets=(16,), seed=123)
        hot = eng2.submit(prompt, max_new_tokens=8, temperature=5.0, top_k=1)
        eng2.run()
        assert hot.out_tokens == greedy.out_tokens

    def test_tiny_top_p_equals_greedy(self, bundle):
        from modelopt_tpu.serve import ServingEngine

        prompt = [5, 9, 2, 7]
        eng = ServingEngine(bundle, max_batch=2, max_seq_len=64,
                            prefill_buckets=(16,))
        greedy = eng.submit(prompt, max_new_tokens=8)
        eng.run()
        eng2 = ServingEngine(bundle, max_batch=2, max_seq_len=64,
                             prefill_buckets=(16,), seed=7)
        hot = eng2.submit(prompt, max_new_tokens=8, temperature=3.0,
                          top_p=1e-6)
        eng2.run()
        assert hot.out_tokens == greedy.out_tokens

    def test_validation(self, bundle):
        import pytest as _pytest

        from modelopt_tpu.serve import ServingEngine

        eng = ServingEngine(bundle, max_batch=2, max_seq_len=64,
                            prefill_buckets=(16,))
        with _pytest.raises(ValueError, match="top_p"):
            eng.submit([1, 2], top_p=0.0)
        with _pytest.raises(ValueError, match="top_k"):
            eng.submit([1, 2], top_k=-1)


class TestPenalties:
    def test_repetition_penalty_blocks_seen_tokens(self, bundle):
        from modelopt_tpu.serve import ServingEngine

        prompt = [5, 9, 2, 7, 11, 13]
        eng = ServingEngine(bundle, max_batch=2, max_seq_len=64,
                            prefill_buckets=(16,))
        req = eng.submit(prompt, max_new_tokens=10,
                         repetition_penalty=1e9)
        eng.run()
        out = req.out_tokens
        # huge repetition penalty: no emitted token repeats the prompt or
        # an earlier emission (greedy over crushed logits)
        assert len(set(out)) == len(out)
        assert not (set(out) & set(prompt))

    def test_presence_penalty_blocks_generated_only(self, bundle):
        from modelopt_tpu.serve import ServingEngine

        prompt = [5, 9, 2, 7]
        eng = ServingEngine(bundle, max_batch=2, max_seq_len=64,
                            prefill_buckets=(16,))
        req = eng.submit(prompt, max_new_tokens=10, presence_penalty=1e9)
        eng.run()
        out = req.out_tokens
        assert len(set(out)) == len(out)  # generated tokens never repeat

    def test_no_penalty_matches_plain_greedy(self, bundle):
        from modelopt_tpu.serve import ServingEngine

        prompt = [5, 9, 2, 7]
        a = ServingEngine(bundle, max_batch=2, max_seq_len=64,
                          prefill_buckets=(16,))
        ra = a.submit(prompt, max_new_tokens=8)
        a.run()
        b = ServingEngine(bundle, max_batch=2, max_seq_len=64,
                          prefill_buckets=(16,))
        rb = b.submit(prompt, max_new_tokens=8, repetition_penalty=1.0,
                      presence_penalty=0.0, frequency_penalty=0.0)
        b.run()
        assert ra.out_tokens == rb.out_tokens

    def test_slot_reuse_resets_histograms(self, bundle):
        from modelopt_tpu.serve import ServingEngine

        eng = ServingEngine(bundle, max_batch=1, max_seq_len=64,
                            prefill_buckets=(16,))
        r1 = eng.submit([3, 4, 5], max_new_tokens=6,
                        repetition_penalty=1e9)
        eng.run()
        # second request on the SAME slot: must not inherit r1's histogram
        r2 = eng.submit([3, 4, 5], max_new_tokens=6,
                        repetition_penalty=1e9)
        eng.run()
        assert r1.out_tokens == r2.out_tokens

    def test_validation(self, bundle):
        import pytest as _pytest

        from modelopt_tpu.serve import ServingEngine

        eng = ServingEngine(bundle, max_batch=2, max_seq_len=64,
                            prefill_buckets=(16,))
        with _pytest.raises(ValueError, match="repetition"):
            eng.submit([1, 2], repetition_penalty=0.0)


class TestMinP:
    def test_high_min_p_equals_greedy(self, bundle):
        from modelopt_tpu.serve import ServingEngine

        prompt = [5, 9, 2, 7]
        a = ServingEngine(bundle, max_batch=2, max_seq_len=64,
                          prefill_buckets=(16,))
        ra = a.submit(prompt, max_new_tokens=8)
        a.run()
        b = ServingEngine(bundle, max_batch=2, max_seq_len=64,
                          prefill_buckets=(16,), seed=11)
        # min_p ~1 keeps only tokens with p >= ~p_max -> argmax only
        rb = b.submit(prompt, max_new_tokens=8, temperature=4.0, min_p=0.999)
        b.run()
        assert ra.out_tokens == rb.out_tokens

    def test_validation(self, bundle):
        import pytest as _pytest

        from modelopt_tpu.serve import ServingEngine

        eng = ServingEngine(bundle, max_batch=2, max_seq_len=64,
                            prefill_buckets=(16,))
        with _pytest.raises(ValueError, match="min_p"):
            eng.submit([1, 2], min_p=1.0)

    def test_chunked_prompt_histogram(self, bundle):
        """A prompt longer than the bucket accumulates its repetition
        histogram across prefill chunks: none of its tokens may be emitted
        under a huge repetition penalty."""
        from modelopt_tpu.serve import ServingEngine

        prompt = list(range(2, 38))  # 36 tokens, bucket 16 -> 3 chunks
        eng = ServingEngine(bundle, max_batch=2, max_seq_len=64,
                            prefill_buckets=(16,))
        req = eng.submit(prompt, max_new_tokens=8, repetition_penalty=1e9)
        eng.run()
        assert not (set(req.out_tokens) & set(prompt))
        assert len(set(req.out_tokens)) == len(req.out_tokens)


class TestMultiStep:
    def _run(self, bundle, **kw):
        from modelopt_tpu.serve import ServingEngine

        eng = ServingEngine(bundle, max_batch=2, max_seq_len=64,
                            prefill_buckets=(16,), **kw)
        r1 = eng.submit([5, 9, 2, 7], max_new_tokens=11)
        r2 = eng.submit([4, 4, 8], max_new_tokens=5)
        eng.run()
        return r1, r2, eng

    def test_burst_matches_single_step_greedy(self, bundle):
        a1, a2, _ = self._run(bundle)
        b1, b2, eng = self._run(bundle, multi_step=4)
        assert a1.out_tokens == b1.out_tokens
        assert a2.out_tokens == b2.out_tokens
        assert a1.out_logprobs == b1.out_logprobs
        # bursts actually happened (fewer host dispatches than tokens)
        assert eng.stats["decode_forwards"] > eng.stats["tokens_emitted"] / 2

    def test_burst_eos_on_device(self, bundle):
        from modelopt_tpu.serve import ServingEngine

        # find greedy token stream first, then use its 3rd token as eos
        a = ServingEngine(bundle, max_batch=1, max_seq_len=64,
                          prefill_buckets=(16,))
        ra = a.submit([5, 9, 2, 7], max_new_tokens=10)
        a.run()
        eos = ra.out_tokens[3]
        b = ServingEngine(bundle, max_batch=1, max_seq_len=64,
                          prefill_buckets=(16,), multi_step=4)
        rb = b.submit([5, 9, 2, 7], max_new_tokens=10, eos_id=eos)
        b.run()
        assert rb.stop_reason == "eos"
        assert rb.out_tokens == ra.out_tokens[:4]

    def test_burst_stop_sequence_trims_overshoot(self, bundle):
        from modelopt_tpu.serve import ServingEngine

        a = ServingEngine(bundle, max_batch=1, max_seq_len=64,
                          prefill_buckets=(16,))
        ra = a.submit([5, 9, 2, 7], max_new_tokens=10)
        a.run()
        ss = tuple(ra.out_tokens[2:4])
        b = ServingEngine(bundle, max_batch=1, max_seq_len=64,
                          prefill_buckets=(16,), multi_step=4)
        rb = b.submit([5, 9, 2, 7], max_new_tokens=10, stop_sequences=[ss])
        b.run()
        assert rb.stop_reason == "stop"
        assert rb.out_tokens == ra.out_tokens[:2]

    def test_burst_paged(self, bundle):
        a1, a2, _ = self._run(bundle)
        b1, b2, _ = self._run(bundle, multi_step=4, paged=True, page_size=16)
        assert a1.out_tokens == b1.out_tokens
        assert a2.out_tokens == b2.out_tokens

    def test_burst_with_penalties(self, bundle):
        from modelopt_tpu.serve import ServingEngine

        prompt = [5, 9, 2, 7, 11]
        eng = ServingEngine(bundle, max_batch=1, max_seq_len=64,
                            prefill_buckets=(16,), multi_step=4)
        req = eng.submit(prompt, max_new_tokens=9, repetition_penalty=1e9)
        eng.run()
        assert len(set(req.out_tokens)) == len(req.out_tokens)
        assert not (set(req.out_tokens) & set(prompt))


class TestSpecSampling:
    def test_temp0_matches_greedy_spec(self, bundle):
        """spec_sampling at temperature 0 degenerates to the greedy
        rejection-free path: outputs equal the greedy spec engine's."""
        import modelopt_tpu.speculative as mtsp

        m = mtsp.convert(bundle, [("medusa", {"medusa_num_heads": 3})])
        prompts = [[5, 17, 42, 7], [9, 1, 30]]
        a = ServingEngine(m, max_batch=2, max_seq_len=64,
                          prefill_buckets=(16,), speculative=3)
        ra = [a.submit(p, max_new_tokens=7) for p in prompts]
        a.run()
        b = ServingEngine(m, max_batch=2, max_seq_len=64,
                          prefill_buckets=(16,), speculative=3,
                          spec_sampling=True)
        rb = [b.submit(p, max_new_tokens=7) for p in prompts]
        b.run()
        for x, y in zip(ra, rb):
            assert x.out_tokens == y.out_tokens

    def test_eagle_temp0_matches_greedy_spec(self, bundle):
        import modelopt_tpu.speculative as mtsp

        m = mtsp.convert(bundle, [("eagle", {"num_draft_layers": 1})])
        a = ServingEngine(m, max_batch=1, max_seq_len=64,
                          prefill_buckets=(16,), speculative=2)
        ra = a.submit([5, 17, 42, 7], max_new_tokens=7)
        a.run()
        b = ServingEngine(m, max_batch=1, max_seq_len=64,
                          prefill_buckets=(16,), speculative=2,
                          spec_sampling=True)
        rb = b.submit([5, 17, 42, 7], max_new_tokens=7)
        b.run()
        assert ra.out_tokens == rb.out_tokens

    def test_temperature_spec_sampling_runs(self, bundle):
        import modelopt_tpu.speculative as mtsp

        m = mtsp.convert(bundle, [("medusa", {"medusa_num_heads": 3})])
        eng = ServingEngine(m, max_batch=2, max_seq_len=64,
                            prefill_buckets=(16,), speculative=3,
                            spec_sampling=True)
        reqs = [eng.submit([5, 17, 42, 7], max_new_tokens=9,
                           temperature=1.0) for _ in range(2)]
        eng.run()
        V = m.module.cfg.vocab_size
        for r in reqs:
            assert r.done and len(r.out_tokens) == 9
            assert all(0 <= t < V for t in r.out_tokens)
        # acceptance bookkeeping stays sane
        assert eng.stats["draft_accepted"] <= eng.stats["draft_proposed"]

    def test_penalties_still_rejected(self, bundle):
        import modelopt_tpu.speculative as mtsp
        import pytest as _pt

        m = mtsp.convert(bundle, [("medusa", {"medusa_num_heads": 2})])
        eng = ServingEngine(m, max_batch=1, max_seq_len=64,
                            prefill_buckets=(16,), speculative=2,
                            spec_sampling=True)
        # filters are fine (p gets filtered exactly); penalties are not
        eng.submit([1, 2], temperature=0.5, top_k=10)
        with _pt.raises(ValueError):
            eng.submit([1, 2], temperature=0.5, repetition_penalty=2.0)

    def test_dflash_temp0_matches_greedy_spec(self, bundle):
        import modelopt_tpu.speculative as mtsp

        m = mtsp.convert(
            bundle, [("dflash", {"num_draft_layers": 1, "block_size": 3})]
        )
        a = ServingEngine(m, max_batch=1, max_seq_len=64,
                          prefill_buckets=(16,), speculative=3)
        ra = a.submit([5, 17, 42, 7], max_new_tokens=7)
        a.run()
        b = ServingEngine(m, max_batch=1, max_seq_len=64,
                          prefill_buckets=(16,), speculative=3,
                          spec_sampling=True)
        rb = b.submit([5, 17, 42, 7], max_new_tokens=7)
        b.run()
        assert ra.out_tokens == rb.out_tokens

    def test_spec_sampling_topk1_equals_greedy(self, bundle):
        """top_k=1 restricts the filtered target to the argmax: outputs
        equal the greedy spec engine's even at high temperature."""
        import modelopt_tpu.speculative as mtsp

        m = mtsp.convert(bundle, [("medusa", {"medusa_num_heads": 3})])
        a = ServingEngine(m, max_batch=1, max_seq_len=64,
                          prefill_buckets=(16,), speculative=3)
        ra = a.submit([5, 17, 42, 7], max_new_tokens=7)
        a.run()
        b = ServingEngine(m, max_batch=1, max_seq_len=64,
                          prefill_buckets=(16,), speculative=3,
                          spec_sampling=True, seed=5)
        rb = b.submit([5, 17, 42, 7], max_new_tokens=7, temperature=4.0,
                      top_k=1)
        b.run()
        assert ra.out_tokens == rb.out_tokens


def test_generate_tokens_wrapper(bundle):
    """deploy/llm-style one-call API over the engine."""
    from modelopt_tpu.serve import ServingEngine, generate_tokens

    prompts = [[5, 9, 2, 7], [4, 4, 8]]
    outs = generate_tokens(bundle, prompts, max_new_tokens=6)
    assert len(outs) == 2 and all(len(o) == 6 for o in outs)
    # matches per-request engine outputs
    eng = ServingEngine(bundle, max_batch=2, max_seq_len=256)
    reqs = [eng.submit(p, max_new_tokens=6) for p in prompts]
    eng.run()
    assert outs == [r.out_tokens for r in reqs]
    # warm-engine reuse
    outs2 = generate_tokens(bundle, prompts, max_new_tokens=6, engine=eng)
    assert outs2 == outs
