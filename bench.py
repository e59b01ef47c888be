"""Benchmark entry point — prints ONE JSON line with the headline metric.

Headline: single-chip decode throughput of a TinyLlama-1.1B-shaped decoder
with INT4 block-128 weight-only quantization served from packed weights
through the Pallas fused dequant-GEMM kernels, vs. the bf16 baseline
measured in the same run. vs_baseline anchors to the reference's
Llama3.1-8B INT4-AWQ bs8 H200 throughput (examples/benchmark.md: 599.72
tok/s) until an 8B model fits a later round's multi-chip serving runs.

Timing methodology (axon-tunnel-safe, see .claude/skills/verify/SKILL.md):
python-dispatched dependent decode chain, data-fetch barrier, marginal cost
between two chain lengths, implied-GB/s sanity fields.
"""

import json
import time

import numpy as np


def _measure_decode(fn, variables, ids, cache0, summ, n1=16, n2=64):
    import jax.numpy as jnp

    lg, cache = fn(variables, ids, cache0)
    float(summ(lg))  # compile + settle

    times = {}
    for n in (n1, n2):
        t0 = time.time()
        c, out = cache, lg
        for _ in range(n):
            out, c = fn(variables, ids, c)
        float(summ(out))
        times[n] = time.time() - t0
    return 1e3 * (times[n2] - times[n1]) / (n2 - n1)


def main():
    import jax
    import jax.numpy as jnp

    import modelopt_tpu.quant as mtq
    from modelopt_tpu.core import ModelBundle
    from modelopt_tpu.models import Decoder, make_cache, tinyllama_config

    BATCH, MAXLEN = 16, 256
    t_start = time.time()

    cfg = tinyllama_config(
        max_position_embeddings=MAXLEN, param_dtype=jnp.bfloat16,
        fused_qkv=True, fused_gate_up=True,
    )
    module = Decoder(cfg)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (BATCH, 1)), jnp.int32
    )
    variables = jax.jit(module.init)(jax.random.PRNGKey(0), ids)
    bundle = ModelBundle(module=module, variables=dict(variables), example_inputs=(ids,))
    summ = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
    cache0 = make_cache(cfg, BATCH, MAXLEN)

    def weight_bytes(vars_):
        return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(vars_))

    # --- bf16 baseline -----------------------------------------------------
    fn_bf16 = jax.jit(bundle.make_fn())
    ms_bf16 = _measure_decode(fn_bf16, bundle.variables, ids, cache0, summ)

    # --- INT4 block-128 weight-only, compressed, Pallas dequant-GEMM -------
    t0 = time.time()
    q = mtq.quantize(bundle, mtq.INT4_BLOCKWISE_WEIGHT_ONLY_CFG, None)
    calib_s = time.time() - t0
    c = mtq.compress(q)
    fn_int4 = jax.jit(c.make_fn())
    ms_int4 = _measure_decode(fn_int4, c.variables, ids, cache0, summ)

    # --- quality: perplexity delta on synthetic eval batches ---------------
    from modelopt_tpu.utils import perplexity, synthetic_token_batches

    evalb = synthetic_token_batches(cfg.vocab_size, 2, 4, 128, seed=7)
    ppl_base = perplexity(bundle, evalb)
    ppl_int4 = perplexity(c, evalb)

    tok_s = BATCH / (ms_int4 / 1e3)
    baseline_tok_s = 599.72  # reference Llama3.1-8B INT4-AWQ, H200 bs8
    print(
        json.dumps(
            {
                "metric": "decode_tok_s_tinyllama1.1b_int4_w4a16_bs16_1xv5e",
                "value": round(tok_s, 1),
                "unit": "tok/s",
                "vs_baseline": round(tok_s / baseline_tok_s, 3),
                "aux": {
                    "bf16_tok_s": round(BATCH / (ms_bf16 / 1e3), 1),
                    "int4_speedup_vs_bf16": round(ms_bf16 / ms_int4, 3),
                    "decode_ms_bf16": round(ms_bf16, 2),
                    "decode_ms_int4": round(ms_int4, 2),
                    "weight_gb_bf16": round(weight_bytes(bundle.variables) / 1e9, 3),
                    "weight_gb_int4": round(weight_bytes(c.variables) / 1e9, 3),
                    "ppl_delta_pct": round(100 * (ppl_int4 / ppl_base - 1), 3),
                    "calib_wall_s": round(calib_s, 2),
                    "wall_s": round(time.time() - t_start, 1),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
