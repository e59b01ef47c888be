"""DeepSeek (MLA + routed MoE) quantization (reference: examples/deepseek/).

The reference quantizes DeepSeek V3/R1 to FP4 via its own inference stack;
here DeepSeek-shaped models are native modules (models/mla.py), so the
standard flow applies: quantize (NVFP4 weights, per-expert amax on the
routed experts), evaluate the delta, and serve with a REAL fp8 LATENT
cache — MLA's KV cache is one shared [kv_lora_rank + rope] row per token,
~9x smaller than a Llama-8B-shaped cache before quantization and 18x at
fp8.

    python examples/deepseek_ptq.py --preset NVFP4_DEFAULT_CFG
    python examples/deepseek_ptq.py --model /path/to/deepseek_checkpoint
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # repo-checkout import path

import argparse

import jax
import jax.numpy as jnp

from examples.llm_ptq import build_model


def main():
    import modelopt_tpu.quant as mtq
    from modelopt_tpu.models import make_cache
    from modelopt_tpu.utils import perplexity, synthetic_token_batches

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny-mla",
                    help="tiny-mla | deepseek-v2-lite | /path/to/hf_checkpoint")
    ap.add_argument("--preset", default="NVFP4_DEFAULT_CFG")
    ap.add_argument("--calib-batches", type=int, default=8)
    args = ap.parse_args()

    bundle = build_model(args.model)
    cfg = bundle.module.cfg
    assert cfg.attention_type == "mla", "this workload expects an MLA model"
    batches = synthetic_token_batches(cfg.vocab_size, args.calib_batches, 2, 64)

    ppl0 = perplexity(bundle, batches)
    q = mtq.quantize(bundle, args.preset, lambda f: [f(b) for b in batches])
    ppl1 = perplexity(q, batches)
    print(f"{args.preset}: ppl {ppl0:.3f} -> {ppl1:.3f} "
          f"({(ppl1 / ppl0 - 1) * 100:+.2f}%)")

    # fp8 latent cache decode (pair with FP8_KV_CFG for calibrated scales)
    qkv = mtq.quantize(bundle, "FP8_KV_CFG", lambda f: [f(b) for b in batches])
    cache = make_cache(cfg, 2, 64, dtype=jnp.float8_e4m3fn)
    fn = jax.jit(qkv.make_fn())
    ids = batches[0][:, :8]
    logits, cache = fn(qkv.variables, ids, cache)
    tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
    for _ in range(4):
        logits, cache = fn(qkv.variables, tok, cache)
        tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
    dc = cfg.kv_lora_rank + cfg.qk_rope_head_dim
    full = 2 * cfg.kv_heads * cfg.dims_per_head * 2  # bf16 K+V per token
    print(f"fp8 latent cache decode OK; bytes/token/layer: {dc} "
          f"vs {full} for bf16 K/V ({full / dc:.1f}x smaller)")


if __name__ == "__main__":
    main()
