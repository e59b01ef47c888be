"""Benchmark entry point — prints ONE JSON line with the headline metric.

Round-1 headline: single-chip decode throughput (tok/s) of a TinyLlama-1.1B-
shaped decoder (bf16 weights, static KV cache). vs_baseline anchors to the
reference's Llama3.1-8B BF16 H200 bs8 throughput (~802 tok/s, derived from
examples/benchmark.md: 1051 tok/s FP8 / 1.31x) until real-quant 8B serving
lands in a later round.

Timing methodology (validated against the axon tunnel's quirks — see
.claude/skills/verify/SKILL.md):
- dependent-chain dispatch, ONE data fetch at the end as the barrier
  (block_until_ready can return early over the relay);
- marginal cost between two chain lengths (subtracts RTT/dispatch overhead);
- implied HBM GB/s reported as a physical sanity check (v5e peak ~819).
- never materialize big arrays host-side (host->device is ~5 MB/s here).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from modelopt_tpu.core import ModelBundle
    from modelopt_tpu.models import Decoder, make_cache, tinyllama_config

    BATCH, MAXLEN = 16, 256

    cfg = tinyllama_config(max_position_embeddings=MAXLEN, param_dtype=jnp.bfloat16)
    module = Decoder(cfg)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (BATCH, 1)), jnp.int32
    )
    t0 = time.time()
    variables = jax.jit(module.init)(jax.random.PRNGKey(0), ids)
    bundle = ModelBundle(module=module, variables=dict(variables), example_inputs=(ids,))
    n_params = sum(x.size for x in jax.tree.leaves(variables))
    weight_gb = n_params * 2 / 1e9

    fn = jax.jit(bundle.make_fn())
    summ = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
    cache = make_cache(cfg, BATCH, MAXLEN)
    lg, cache = fn(bundle.variables, ids, cache)
    float(summ(lg))  # compile + execute everything queued
    warm_s = time.time() - t0

    times = {}
    for n in (16, 64):
        t0 = time.time()
        c, out = cache, lg
        for _ in range(n):
            out, c = fn(bundle.variables, ids, c)
        float(summ(out))  # data fetch = true barrier
        times[n] = time.time() - t0
    ms = 1e3 * (times[64] - times[16]) / 48.0
    tok_s = BATCH / (ms / 1e3)
    implied_gbps = weight_gb / (ms / 1e3)

    baseline_tok_s = 802.0
    print(
        json.dumps(
            {
                "metric": "decode_tok_s_tinyllama1.1b_bs16_bf16_1xv5e",
                "value": round(tok_s, 1),
                "unit": "tok/s",
                "vs_baseline": round(tok_s / baseline_tok_s, 3),
                "aux": {
                    "params_b": round(n_params / 1e9, 3),
                    "decode_ms_per_step": round(ms, 2),
                    "implied_weight_gbps": round(implied_gbps, 1),
                    "warmup_s": round(warm_s, 1),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
