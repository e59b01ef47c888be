"""Benchmark entry point — prints ONE JSON line with the headline metric.

Headline: single-chip decode throughput of a Llama-3-8B-shaped decoder with
INT4 block-128 weight-only quantization, served from packed weights through
the Pallas fused dequant-GEMM kernels on one v5e. vs_baseline is the
reference's own number for this model/format at the same batch size:
Llama3.1-8B INT4-AWQ at 1392.78 tok/s on an H200 (examples/benchmark.md:
23-25, bs64). The bf16 model (16 GB) does not even fit this chip's HBM;
its INT4-packed form runs in 5.8 GB. (At bs16 vs their bs8 row we measure
1184 tok/s vs 599.72 = 1.97x.)

Weights are synthetic (this environment has zero network egress — see
models/synthetic.py); identical compute/memory behavior to a real
checkpoint. Quality ladders for the calibration algorithms are tracked in
NOTES.md from on-chip runs with outlier data.

Timing methodology (axon-tunnel-safe, see .claude/skills/verify/SKILL.md):
dependent decode chains, data-fetch barriers, marginal cost between two
chain lengths, implied-GB/s sanity fields.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from modelopt_tpu.models import Decoder, llama3_8b_config, make_cache
    from modelopt_tpu.models.synthetic import build_compressed_bundle

    BATCH, MAXLEN = 64, 256
    t_start = time.time()

    cfg = llama3_8b_config(
        max_position_embeddings=MAXLEN, param_dtype=jnp.bfloat16,
        fused_qkv=True, fused_gate_up=True,
    )
    module = Decoder(cfg)
    ids = jnp.zeros((BATCH, 1), jnp.int32)
    t0 = time.time()
    bundle = build_compressed_bundle(module, (ids,), "INT4_BLOCKWISE_WEIGHT_ONLY_CFG")
    build_s = time.time() - t0
    weight_gb = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(bundle.variables)
    ) / 1e9

    summ = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
    # donate the cache or XLA copies all of it every step (see make_cache)
    fn = jax.jit(bundle.make_fn(), donate_argnums=(2,))
    cache = make_cache(cfg, BATCH, MAXLEN)
    lg, c = fn(bundle.variables, ids, cache)
    float(summ(lg))  # compile + settle

    # marginal timing over one continuous donated chain: each timed segment
    # ends with a data fetch; segment deltas cancel the RTT/dispatch overhead
    times = {}
    out, cc = lg, c
    for n in (8, 32):
        t0 = time.time()
        for _ in range(n):
            out, cc = fn(bundle.variables, ids, cc)
        float(summ(out))
        times[n] = time.time() - t0
    ms = 1e3 * (times[32] - times[8]) / 24.0
    tok_s = BATCH / (ms / 1e3)

    baseline_tok_s = 1392.78  # reference: Llama3.1-8B INT4-AWQ, H200, bs64
    print(
        json.dumps(
            {
                "metric": "decode_tok_s_llama3-8b_int4_w4a16_bs64_1xv5e",
                "value": round(tok_s, 1),
                "unit": "tok/s",
                "vs_baseline": round(tok_s / baseline_tok_s, 3),
                "aux": {
                    "baseline": "reference Llama3.1-8B INT4-AWQ 1392.78 tok/s (H200, bs64)",
                    "batch": BATCH,
                    "decode_ms_per_step": round(ms, 2),
                    "weight_gb_packed": round(weight_gb, 2),
                    "bf16_fits_this_chip": False,
                    "implied_weight_gbps": round(weight_gb / (ms / 1e3), 1),
                    "build_s": round(build_s, 1),
                    "wall_s": round(time.time() - t_start, 1),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
