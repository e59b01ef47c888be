"""Export -> reimport -> logit-match round trip for EVERY model family in
the zoo (docs/models.md): quantize, export_hf_checkpoint,
load_quantized_checkpoint, compare logits. This is the arch-generic
guarantee the reference gets from module-walking export
(reference: export/unified_export_hf.py:433,569 + model_hub import).

Each family exercises its own naming/layout hazards: fused projections,
qk-norms, sandwich norms, MLA latent projections (rope permutation),
per-expert MoE stacks, layernorm1p biases, attention sinks."""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import modelopt_tpu.quant as mtq
from modelopt_tpu.core import ModelBundle
from modelopt_tpu.export import export_hf_checkpoint
from modelopt_tpu.models import (
    Decoder,
    load_quantized_checkpoint,
    tiny_gemma3_test_config,
    tiny_gptoss_test_config,
    tiny_mla_test_config,
    tiny_test_config,
)

pytest.importorskip("safetensors")

FAMILIES = {
    "llama": lambda: tiny_test_config(),
    "qwen3": lambda: tiny_test_config(qk_norm=True),
    "qwen3_moe": lambda: tiny_test_config(qk_norm=True, num_experts=4,
                                          experts_per_token=2),
    "mixtral": lambda: tiny_test_config(num_experts=4, experts_per_token=2),
    "phi_fused": lambda: tiny_test_config(fused_qkv=True, fused_gate_up=True),
    "nemotron": lambda: tiny_test_config(
        activation="relu2", norm="layernorm1p", partial_rotary_factor=0.5),
    "gemma3": lambda: tiny_gemma3_test_config(),
    "deepseek_mla": lambda: tiny_mla_test_config(),
    "gpt_oss": lambda: tiny_gptoss_test_config(),
    "llama4": lambda: _llama4_cfg(),
}


def _llama4_cfg():
    from modelopt_tpu.models import config_from_hf

    return config_from_hf({
        "model_type": "llama4_text", "vocab_size": 128, "hidden_size": 64,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "num_key_value_heads": 2, "head_dim": 16,
        "intermediate_size": 32, "intermediate_size_mlp": 96,
        "num_local_experts": 4, "num_experts_per_tok": 1,
        "interleave_moe_layer_step": 2, "no_rope_layers": [1, 0],
        "attention_chunk_size": 8, "rope_theta": 500000.0,
        "use_qk_norm": True, "attn_temperature_tuning": True,
        "floor_scale": 8, "attn_scale": 0.1, "rms_norm_eps": 1e-5,
        "tie_word_embeddings": False, "max_position_embeddings": 64,
    })


def _bundle(cfg):
    import dataclasses

    cfg = dataclasses.replace(cfg, dtype=jnp.float32,
                              param_dtype=jnp.float32)
    m = Decoder(cfg)
    ids = jnp.asarray(np.random.default_rng(3).integers(
        0, cfg.vocab_size, (2, 16)), jnp.int32)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), ids)
    return ModelBundle(module=m, variables=dict(v), example_inputs=(ids,))


def _logits(bundle, ids):
    out = bundle.apply(ids)
    return np.asarray(out[0] if isinstance(out, tuple) else out, np.float32)


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_export_reimport_logit_match(family, tmp_path):
    bundle = _bundle(FAMILIES[family]())
    ids = bundle.example_inputs[0]
    q = mtq.quantize(bundle, mtq.INT4_BLOCKWISE_WEIGHT_ONLY_CFG,
                     lambda f: f(ids))
    export_hf_checkpoint(q, str(tmp_path))
    with warnings.catch_warnings():
        # no silent dequant fallback for any family's quantized tensors
        warnings.simplefilter("error")
        loaded = load_quantized_checkpoint(str(tmp_path),
                                           param_dtype=jnp.float32)
    ref = _logits(q, ids)
    got = _logits(loaded, ids)
    # fp16 storage of unquantized params is the one lossy convention
    np.testing.assert_allclose(got, ref, rtol=8e-2, atol=8e-2)
    rel = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-6)
    assert rel < 0.1, f"{family}: relative logit drift {rel:.3f}"
