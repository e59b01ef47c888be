"""Serve a quantized model with the built-in continuous-batching engine
(reference: examples/vllm_serve — fakequant serving, but TPU-native and with
the engine built in).

    python examples/llm_serve.py --preset FP8_KV_CFG --fp8-kv --requests 8
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # repo-checkout import path

import argparse
import time

import jax.numpy as jnp
import numpy as np

from examples.llm_ptq import build_model


def main():
    import modelopt_tpu.quant as mtq
    from modelopt_tpu.serve import ServingEngine

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny")
    ap.add_argument("--preset", default="FP8_KV_CFG")
    ap.add_argument("--compress", action="store_true")
    ap.add_argument("--fp8-kv", action="store_true")
    ap.add_argument("--requests", type=int, default=8)
    ap.add_argument("--max-new", type=int, default=32)
    ap.add_argument("--max-batch", type=int, default=4)
    args = ap.parse_args()

    bundle = build_model(args.model)
    cfg = bundle.module.cfg
    calib = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 64)), jnp.int32
    )
    q = mtq.quantize(bundle, args.preset, lambda f: f(calib))
    if args.compress:
        q = mtq.compress(q)

    eng = ServingEngine(
        q, max_batch=args.max_batch, max_seq_len=256, prefill_buckets=(32, 64),
        kv_dtype=jnp.float8_e4m3fn if args.fp8_kv else None,
    )
    rng = np.random.default_rng(1)
    reqs = [
        eng.submit(rng.integers(0, cfg.vocab_size, rng.integers(4, 24)).tolist(),
                   max_new_tokens=args.max_new, temperature=0.7,
                   top_k=50, top_p=0.95)
        for _ in range(args.requests)
    ]
    t0 = time.time()
    eng.run()
    dt = time.time() - t0
    n_tok = sum(len(r.out_tokens) for r in reqs)
    print(f"served {len(reqs)} requests, {n_tok} tokens in {dt:.1f}s "
          f"({n_tok/dt:.1f} tok/s incl. compile)")
    for r in reqs[:3]:
        lp = [round(x, 2) if x is not None else None
              for x in r.out_logprobs[:4]]
        print(f"  req {r.id}: prompt[{len(r.prompt)}] -> {r.out_tokens[:8]}... "
              f"logprobs {lp} stop={r.stop_reason}")


if __name__ == "__main__":
    main()
