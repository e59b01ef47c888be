"""MiniMax-M3-style MIXED-format PTQ: MXFP8 base + NVFP4 routed experts
(reference: examples/minimax_m3/hf_ptq_mixed_mxfp8_nvfp4.py — the
mixed-precision recipe where attention/dense layers take MXFP8 and the
routed experts take NVFP4, with routers/shared-experts/lm_head/KV kept
high precision).

    python examples/minimax_mixed_ptq.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # repo-checkout import path

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import modelopt_tpu.quant as mtq
    from modelopt_tpu.core import ModelBundle
    from modelopt_tpu.models import Decoder, qwen3_moe_config

    cfg = qwen3_moe_config(
        hidden_size=128, num_layers=2, num_experts=8, experts_per_token=2,
        num_heads=4, num_kv_heads=2, head_dim=32, intermediate_size=256,
        moe_intermediate_size=128, vocab_size=512,
        max_position_embeddings=128, dtype=jnp.float32,
        param_dtype=jnp.float32,
    )
    m = Decoder(cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 64)), jnp.int32)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), ids)
    bundle = ModelBundle(module=m, variables=dict(v), example_inputs=(ids,))

    def forward_loop(f):
        for s in range(4):
            f(jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 64)),
                          jnp.int32))

    q = mtq.quantize(bundle, "MIXED_MXFP8_NVFP4_EXPERTS_CFG", forward_loop)
    mtq.print_quant_summary(q)

    # quality: KL(bf16 || mixed) on held-out tokens
    held = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 64)), jnp.int32)
    base = bundle.apply(held)
    base = base[0] if isinstance(base, tuple) else base
    out = q.apply(held)
    out = out[0] if isinstance(out, tuple) else out
    lp0 = jax.nn.log_softmax(base.astype(jnp.float32), -1)
    lp1 = jax.nn.log_softmax(out.astype(jnp.float32), -1)
    kl = float(jnp.mean(jnp.sum(jnp.exp(lp0) * (lp0 - lp1), -1)))
    print(f"KL(base || mixed mxfp8+nvfp4-experts) = {kl:.5f}")

    mse = mtq.compute_quantization_mse(q)
    worst = sorted(mse.items(), key=lambda kv: -kv[1]["output_rel_err"])[:3]
    for path, d in worst:
        print(f"  worst rel-err: {path}: {d['output_rel_err']:.4f}")


if __name__ == "__main__":
    main()
