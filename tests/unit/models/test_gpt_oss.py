"""gpt-oss family: learned attention sinks, alternating sliding windows,
clamped-swiglu MoE with biases, YaRN rope — validated END TO END against
the HF torch implementation (logit parity on a random-init tiny model)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modelopt_tpu.core import PHASE_QUANT, ModelBundle
from modelopt_tpu.models import Decoder, make_cache, tiny_gptoss_test_config


def test_gptoss_cached_decode_matches_full():
    cfg = tiny_gptoss_test_config()
    m = Decoder(cfg)
    ids = jnp.asarray([[5, 3, 7, 2], [2, 2, 2, 2]], jnp.int32)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), ids)
    assert v["params"]["layers_0"]["attn"]["sinks"].shape == (cfg.num_heads,)
    cache = make_cache(cfg, 2, 16)
    lg, cache = m.apply(v, ids, cache)
    tok = jnp.argmax(lg[:, -1:], -1).astype(jnp.int32)
    lg2, cache = m.apply(v, tok, cache)
    full, _ = m.apply(v, jnp.concatenate([ids, tok], 1))
    np.testing.assert_allclose(
        np.asarray(lg2[:, -1]), np.asarray(full[:, -1]), rtol=3e-4, atol=3e-4
    )


def test_gptoss_quantizes():
    import modelopt_tpu.quant as mtq

    cfg = tiny_gptoss_test_config()
    m = Decoder(cfg)
    ids = jnp.zeros((2, 8), jnp.int32)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), ids)
    b = ModelBundle(module=m, variables=dict(v), example_inputs=(ids,))
    data = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, cfg.vocab_size)
    q = mtq.quantize(b, "MXFP4_DEFAULT_CFG", lambda f: f(data))
    out = jax.jit(q.make_fn(phase=PHASE_QUANT))(q.variables, data)
    lg = out[0] if isinstance(out, tuple) else out
    assert np.isfinite(np.asarray(lg)).all()


def test_gptoss_hf_import_logit_parity():
    """Import a random-init HF GptOssForCausalLM and match its logits —
    pins sinks math, gate_up de-interleave, clamp activation, router
    softmax-topk, yarn frequencies, and alternating windows at once."""
    torch = pytest.importorskip("torch")
    tfm = pytest.importorskip("transformers")
    from modelopt_tpu.models.hf_import import from_hf

    cfg = tfm.GptOssConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        intermediate_size=32, num_local_experts=4, num_experts_per_tok=2,
        sliding_window=8, layer_types=["sliding_attention", "full_attention"],
        rope_theta=150000.0,
        rope_scaling={"rope_type": "yarn", "factor": 4.0,
                      "original_max_position_embeddings": 32,
                      "beta_fast": 32.0, "beta_slow": 1.0},
        max_position_embeddings=128, attention_bias=True,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    from transformers.models.gpt_oss.modeling_gpt_oss import GptOssForCausalLM

    hf = GptOssForCausalLM(cfg).eval().float()
    ids = torch.tensor([[5, 3, 7, 2, 9, 1, 4, 8]])
    with torch.no_grad():
        ref = hf(ids).logits.numpy()
    bundle = from_hf(hf, cfg)
    assert bundle.module.cfg.layer_plan[0] == (("window", 8),)
    out = bundle.apply(jnp.asarray(ids.numpy()))
    logits = np.asarray(out[0] if isinstance(out, tuple) else out, np.float32)
    err = np.abs(logits - ref).max() / np.abs(ref).max()
    assert err < 2e-2, err  # bf16 compute vs fp32 torch
