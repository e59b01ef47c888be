"""Gemma-3 family: (1+w) RMSNorm, sandwich norms, scaled embeddings,
qk-norm, query pre-scale, alternating local/global rope, linear scaling —
pinned by exact (fp32) logit parity vs the HF torch implementation."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modelopt_tpu.core import PHASE_QUANT, ModelBundle
from modelopt_tpu.models import Decoder, make_cache, tiny_gemma3_test_config


def test_gemma3_hf_logit_parity_exact():
    torch = pytest.importorskip("torch")
    tfm = pytest.importorskip("transformers")
    from transformers.models.gemma3.modeling_gemma3 import Gemma3ForCausalLM

    from modelopt_tpu.models.hf_import import from_hf

    cfg = tfm.Gemma3TextConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        intermediate_size=96, sliding_window=8,
        layer_types=["sliding_attention", "full_attention",
                     "sliding_attention"],
        rope_theta=1e6, rope_local_base_freq=10000.0,
        rope_scaling={"rope_type": "linear", "factor": 2.0},
        query_pre_attn_scalar=64, rms_norm_eps=1e-6,
        max_position_embeddings=128, tie_word_embeddings=True,
        attention_bias=False,
    )
    torch.manual_seed(0)
    hf = Gemma3ForCausalLM(cfg).eval().float()
    ids = torch.tensor([[5, 3, 7, 2, 9, 1, 4, 8]])
    with torch.no_grad():
        ref = hf(ids).logits.numpy()
    b = from_hf(hf, cfg)
    assert b.module.cfg.layer_plan[0] == (("window", 8), ("local_rope", True))
    # fp32 compute: semantics must be EXACT (<1e-5), not just bf16-close
    m32 = Decoder(dataclasses.replace(b.module.cfg, dtype=jnp.float32))
    out = m32.apply(b.variables, jnp.asarray(ids.numpy()))
    lg = np.asarray(out[0] if isinstance(out, tuple) else out, np.float32)
    err = np.abs(lg - ref).max() / np.abs(ref).max()
    assert err < 1e-5, err


def test_gemma3_decode_and_quantize():
    cfg = tiny_gemma3_test_config()
    m = Decoder(cfg)
    ids = jnp.asarray([[5, 3, 7], [2, 2, 2]], jnp.int32)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), ids)
    cache = make_cache(cfg, 2, 16)
    lg, cache = m.apply(v, ids, cache)
    tok = jnp.argmax(lg[:, -1:], -1).astype(jnp.int32)
    lg2, _ = m.apply(v, tok, cache)
    full, _ = m.apply(v, jnp.concatenate([ids, tok], 1))
    np.testing.assert_allclose(
        np.asarray(lg2[:, -1]), np.asarray(full[:, -1]), rtol=4e-4, atol=4e-4
    )
    import modelopt_tpu.quant as mtq

    b = ModelBundle(module=m, variables=dict(v), example_inputs=(ids,))
    q = mtq.quantize(b, "INT4_AWQ_CFG", lambda f: f(ids))
    out = jax.jit(q.make_fn(phase=PHASE_QUANT))(q.variables, ids)
    lg = out[0] if isinstance(out, tuple) else out
    assert np.isfinite(np.asarray(lg)).all()


def test_gemma2_softcaps_run():
    """gemma2-style softcaps (attention + final logits) execute and bound
    the final logits to the cap."""
    cfg = tiny_gemma3_test_config(
        qk_norm=False, attn_logit_softcap=50.0, final_logit_softcap=5.0,
        rope_scaling=None,
    )
    m = Decoder(cfg)
    ids = jnp.zeros((1, 8), jnp.int32)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), ids)
    lg, _ = m.apply(v, ids)
    assert float(jnp.max(jnp.abs(lg))) <= 5.0 + 1e-3
