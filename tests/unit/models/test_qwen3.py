"""Qwen3 family (per-head q/k RMSNorm, softmax top-k MoE) — validated by
logit parity against the HF torch implementations on random-init models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modelopt_tpu.core import PHASE_QUANT, ModelBundle
from modelopt_tpu.models import Decoder, make_cache, qwen3_config


def _err(bundle, hf, ids_t):
    import torch

    with torch.no_grad():
        ref = hf(ids_t).logits.numpy()
    out = bundle.apply(jnp.asarray(ids_t.numpy()))
    lg = np.asarray(out[0] if isinstance(out, tuple) else out, np.float32)
    return np.abs(lg - ref).max() / np.abs(ref).max()


def test_qwen3_dense_hf_logit_parity():
    torch = pytest.importorskip("torch")
    tfm = pytest.importorskip("transformers")
    from transformers.models.qwen3.modeling_qwen3 import Qwen3ForCausalLM

    from modelopt_tpu.models.hf_import import from_hf

    cfg = tfm.Qwen3Config(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        intermediate_size=96, rope_theta=1e6, rms_norm_eps=1e-6,
        tie_word_embeddings=False, max_position_embeddings=128,
    )
    torch.manual_seed(0)
    hf = Qwen3ForCausalLM(cfg).eval().float()
    b = from_hf(hf, cfg)
    assert b.module.cfg.qk_norm
    assert _err(b, hf, torch.tensor([[5, 3, 7, 2, 9, 1, 4, 8]])) < 2e-2


def test_qwen3_moe_hf_logit_parity():
    torch = pytest.importorskip("torch")
    tfm = pytest.importorskip("transformers")
    from transformers.models.qwen3_moe.modeling_qwen3_moe import (
        Qwen3MoeForCausalLM,
    )

    from modelopt_tpu.models.hf_import import from_hf

    cfg = tfm.Qwen3MoeConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        intermediate_size=96, moe_intermediate_size=32,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=True,
        decoder_sparse_step=1, mlp_only_layers=[],
        rope_theta=1e6, rms_norm_eps=1e-6,
        tie_word_embeddings=False, max_position_embeddings=128,
    )
    torch.manual_seed(1)
    hf = Qwen3MoeForCausalLM(cfg).eval().float()
    b = from_hf(hf, cfg)
    assert _err(b, hf, torch.tensor([[5, 3, 7, 2, 9, 1, 4, 8]])) < 2e-2


def test_qwen3_decode_and_quantize():
    cfg = qwen3_config(
        vocab_size=256, hidden_size=64, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=16, intermediate_size=96,
        max_position_embeddings=64,
    )
    m = Decoder(cfg)
    ids = jnp.asarray([[5, 3, 7], [2, 2, 2]], jnp.int32)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), ids)
    cache = make_cache(cfg, 2, 16)
    lg, cache = m.apply(v, ids, cache)
    tok = jnp.argmax(lg[:, -1:], -1).astype(jnp.int32)
    lg2, _ = m.apply(v, tok, cache)
    full, _ = m.apply(v, jnp.concatenate([ids, tok], 1))
    np.testing.assert_allclose(
        np.asarray(lg2[:, -1]), np.asarray(full[:, -1]), rtol=3e-4, atol=3e-4
    )
    import modelopt_tpu.quant as mtq

    b = ModelBundle(module=m, variables=dict(v), example_inputs=(ids,))
    q = mtq.quantize(b, "FP8_DEFAULT_CFG", lambda f: f(ids))
    out = jax.jit(q.make_fn(phase=PHASE_QUANT))(q.variables, ids)
    lg = out[0] if isinstance(out, tuple) else out
    assert np.isfinite(np.asarray(lg)).all()
