"""Serving-benchmark harness tests (reference protocol frame:
examples/benchmark.md:14 — input 2048 / output 128 full requests; here at
toy scale so the harness logic is pinned on CPU)."""

import jax
import jax.numpy as jnp

from modelopt_tpu.core import ModelBundle
from modelopt_tpu.models import Decoder, tiny_test_config
from modelopt_tpu.serve import ServingEngine
from modelopt_tpu.serve.benchmark import run_serving_benchmark


def _bundle():
    cfg = tiny_test_config(dtype=jnp.float32, param_dtype=jnp.float32,
                           max_position_embeddings=64)
    m = Decoder(cfg)
    ids = jnp.zeros((1, 8), jnp.int32)
    v = m.init(jax.random.PRNGKey(0), ids)
    return ModelBundle(module=m, variables=dict(v), example_inputs=(ids,))


def test_full_request_protocol_report():
    eng = ServingEngine(_bundle(), max_batch=4, max_seq_len=64,
                        prefill_buckets=(16,), multi_step=4, max_admit=1)
    rep = run_serving_benchmark(eng, n_requests=6, input_len=24,
                                output_len=8, vocab=50)
    assert rep["output_tokens"] == 6 * 8
    assert rep["output_tok_s"] > 0
    # all requests submitted at t0: TTFTs are monotone-ish, first <= mean
    assert 0 < rep["ttft_first_s"] <= rep["ttft_mean_s"]
    assert rep["prefill_s"] <= rep["total_s"]
    assert rep["decode_tok_s"] > 0
    assert rep["engine_stats"]["prefill_chunks"] >= 6 * 2  # 24 -> 2 chunks


def test_warmup_then_measure_reuses_engine():
    eng = ServingEngine(_bundle(), max_batch=3, max_seq_len=64,
                        prefill_buckets=(16,), multi_step=4)
    run_serving_benchmark(eng, n_requests=3, input_len=16, output_len=4,
                          vocab=50)
    rep = run_serving_benchmark(eng, n_requests=3, input_len=16,
                                output_len=4, vocab=50, seed=1)
    assert rep["output_tokens"] == 12
