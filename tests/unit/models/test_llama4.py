"""Llama-4 family: NoPE layers + temperature tuning, chunked attention,
qk L2 norm, input-scaled sigmoid routing with shared expert, interleaved
dense/MoE layers — pinned by logit parity vs the HF torch implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modelopt_tpu.models import Decoder, make_cache


def _tiny_hf_cfg(tfm):
    return tfm.Llama4TextConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        intermediate_size=32, intermediate_size_mlp=96,
        num_local_experts=4, num_experts_per_tok=1,
        interleave_moe_layer_step=2, no_rope_layers=None,
        attention_chunk_size=8, rope_theta=500000.0, rope_scaling=None,
        use_qk_norm=True, attn_temperature_tuning=True,
        floor_scale=8, attn_scale=0.1,
        rms_norm_eps=1e-5, tie_word_embeddings=False,
        max_position_embeddings=64, pad_token_id=0,
    )


def test_llama4_hf_logit_parity():
    torch = pytest.importorskip("torch")
    tfm = pytest.importorskip("transformers")
    from transformers.models.llama4.modeling_llama4 import Llama4ForCausalLM

    from modelopt_tpu.models.hf_import import from_hf

    cfg = _tiny_hf_cfg(tfm)
    torch.manual_seed(0)
    hf = Llama4ForCausalLM(cfg).eval().float()
    ids = torch.tensor([[5, 3, 7, 2, 9, 1, 4, 8, 11, 13, 2, 6]])
    with torch.no_grad():
        ref = hf(ids).logits.numpy()
    b = from_hf(hf, cfg)
    plan = b.module.cfg.layer_plan
    assert ("nope", True) in plan[3]  # every 4th layer NoPE
    assert ("chunk", 8) in plan[0]
    assert ("ffn", 96) in plan[0]  # dense interleave layer
    out = b.apply(jnp.asarray(ids.numpy()))
    lg = np.asarray(out[0] if isinstance(out, tuple) else out, np.float32)
    err = np.abs(lg - ref).max() / np.abs(ref).max()
    assert err < 2e-2, err  # bf16 compute vs fp32 torch


def test_llama4_cached_decode_matches_full():
    torch = pytest.importorskip("torch")
    tfm = pytest.importorskip("transformers")
    from transformers.models.llama4.modeling_llama4 import Llama4ForCausalLM

    from modelopt_tpu.models.hf_import import from_hf

    cfg = _tiny_hf_cfg(tfm)
    torch.manual_seed(1)
    hf = Llama4ForCausalLM(cfg).eval().float()
    b = from_hf(hf, cfg)
    m, v = b.module, b.variables
    ids = jnp.asarray([[5, 3, 7, 2, 9, 1], [2, 2, 2, 2, 2, 2]], jnp.int32)
    cache = make_cache(m.cfg, 2, 16)
    lg, cache = m.apply(v, ids, cache)
    tok = jnp.argmax(lg[:, -1:], -1).astype(jnp.int32)
    lg2, _ = m.apply(v, tok, cache)
    full, _ = m.apply(v, jnp.concatenate([ids, tok], 1))
    np.testing.assert_allclose(
        np.asarray(lg2[:, -1]), np.asarray(full[:, -1]), rtol=4e-4, atol=4e-4
    )
