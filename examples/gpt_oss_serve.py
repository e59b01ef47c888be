"""gpt-oss workload: MXFP4 experts end-to-end (reference:
examples/gpt-oss — QAT/PTQ of openai/gpt-oss-* with its native MXFP4
fused-expert checkpoints).

Two modes:
  * --checkpoint <dir>: load a NATIVE gpt-oss release checkpoint
    (mlp.experts.{gate_up,down}_proj_blocks/_scales in the OpenAI MXFP4
    layout) with ``load_oai_mxfp4_checkpoint`` — a bit-exact byte repack
    into the folded Pallas qtensor layout, no dequantize round trip — and
    serve it (attention sinks and all).
  * default (this sandbox has no network): build a tiny random-init
    gpt-oss-architecture model, PTQ its experts INTO the same MXFP4
    format, compress, and serve — the same numerics the real checkpoint
    ships with.

    python examples/gpt_oss_serve.py --requests 6
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # repo-checkout import path

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import modelopt_tpu.quant as mtq
    from modelopt_tpu.core import ModelBundle
    from modelopt_tpu.models import (
        Decoder, load_oai_mxfp4_checkpoint, tiny_gptoss_test_config,
    )
    from modelopt_tpu.serve import ServingEngine

    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None,
                    help="native gpt-oss MXFP4 checkpoint dir")
    ap.add_argument("--requests", type=int, default=6)
    ap.add_argument("--max-new", type=int, default=24)
    args = ap.parse_args()

    if args.checkpoint:
        t0 = time.time()
        bundle = load_oai_mxfp4_checkpoint(args.checkpoint)
        print(f"loaded native MXFP4 checkpoint in {time.time() - t0:.1f}s "
              f"(codes+scales copied bit-exact)")
    else:
        cfg = tiny_gptoss_test_config()
        m = Decoder(cfg)
        ids = jnp.asarray(
            np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 32)),
            jnp.int32)
        v = jax.jit(m.init)(jax.random.PRNGKey(0), ids)
        bundle = ModelBundle(module=m, variables=dict(v),
                             example_inputs=(ids,))
        # PTQ the experts into gpt-oss's own storage format (e2m1 codes,
        # biased-e8m0 block-32 scales) and pack for real
        q = mtq.quantize(bundle, "MXFP4_MLP_WEIGHT_ONLY_CFG",
                         lambda f: f(ids))
        bundle = mtq.compress(q)
        mtq.print_quant_summary(bundle)

    eng = ServingEngine(bundle, max_batch=4, max_seq_len=256,
                        prefill_buckets=(32, 64))
    rng = np.random.default_rng(1)
    vocab = bundle.module.cfg.vocab_size
    reqs = [
        eng.submit(rng.integers(0, vocab, int(rng.integers(4, 24))).tolist(),
                   max_new_tokens=args.max_new, temperature=0.8, top_p=0.95)
        for _ in range(args.requests)
    ]
    t0 = time.time()
    eng.run()
    dt = time.time() - t0
    toks = sum(len(r.out_tokens) for r in reqs)
    print(f"served {sum(r.done for r in reqs)}/{len(reqs)} requests, "
          f"{toks} tokens in {dt:.1f}s ({toks / dt:.0f} tok/s) "
          f"— learned attention sinks active in the decode kernel")
    for r in reqs[:2]:
        print("  sample:", r.out_tokens[:8])


if __name__ == "__main__":
    main()
