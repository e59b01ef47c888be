"""Phi-3/4 family (fused qkv/gate_up projections, longrope scaling) —
pinned by logit parity vs the HF torch implementation."""

import jax.numpy as jnp
import numpy as np
import pytest


def test_phi3_hf_logit_parity():
    torch = pytest.importorskip("torch")
    tfm = pytest.importorskip("transformers")
    from transformers.models.phi3.modeling_phi3 import Phi3ForCausalLM

    from modelopt_tpu.models.hf_import import from_hf

    cfg = tfm.Phi3Config(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=96, rope_theta=10000.0,
        original_max_position_embeddings=64, max_position_embeddings=64,
        rope_scaling={"type": "longrope",
                      "short_factor": [1.0, 1.1, 1.2, 1.3, 1.4, 1.5,
                                       1.6, 1.7],
                      "long_factor": [2.0] * 8},
        rms_norm_eps=1e-6, tie_word_embeddings=False, sliding_window=None,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(0)
    hf = Phi3ForCausalLM(cfg).eval().float()
    ids = torch.tensor([[5, 3, 7, 2, 9, 1, 4, 8]])
    with torch.no_grad():
        ref = hf(ids).logits.numpy()
    b = from_hf(hf, cfg)
    assert b.module.cfg.fused_qkv and b.module.cfg.fused_gate_up
    out = b.apply(jnp.asarray(ids.numpy()))
    lg = np.asarray(out[0] if isinstance(out, tuple) else out, np.float32)
    err = np.abs(lg - ref).max() / np.abs(ref).max()
    assert err < 2e-2, err  # bf16 compute vs fp32 torch


def test_llama31_rope_scaling_parity():
    """Llama-3.1+ checkpoints ship rope_type='llama3' frequency scaling —
    parity vs HF LlamaForCausalLM with the scaling active."""
    torch = pytest.importorskip("torch")
    tfm = pytest.importorskip("transformers")
    from transformers.models.llama.modeling_llama import LlamaForCausalLM

    from modelopt_tpu.models.hf_import import from_hf

    cfg = tfm.LlamaConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=96,
        rope_theta=10000.0, max_position_embeddings=256,
        rope_scaling={"rope_type": "llama3", "factor": 8.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 64},
        rms_norm_eps=1e-6, tie_word_embeddings=False, attention_bias=False,
    )
    torch.manual_seed(0)
    hf = LlamaForCausalLM(cfg).eval().float()
    ids = torch.tensor([[5, 3, 7, 2, 9, 1, 4, 8]])
    with torch.no_grad():
        ref = hf(ids).logits.numpy()
    b = from_hf(hf, cfg)
    out = b.apply(jnp.asarray(ids.numpy()))
    lg = np.asarray(out[0] if isinstance(out, tuple) else out, np.float32)
    err = np.abs(lg - ref).max() / np.abs(ref).max()
    assert err < 2e-2, err


def test_nemotron_hf_logit_parity():
    """Nemotron (squared-ReLU MLP, layernorm1p, partial rotary) — logit
    parity vs HF NemotronForCausalLM with non-trivial norm weights."""
    torch = pytest.importorskip("torch")
    tfm = pytest.importorskip("transformers")
    from transformers.models.nemotron.modeling_nemotron import (
        NemotronForCausalLM,
    )

    from modelopt_tpu.models.hf_import import from_hf

    cfg = tfm.NemotronConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=96, partial_rotary_factor=0.5,
        rope_theta=10000.0, norm_eps=1e-5, tie_word_embeddings=False,
        max_position_embeddings=128,
    )
    torch.manual_seed(0)
    hf = NemotronForCausalLM(cfg).eval().float()
    with torch.no_grad():  # nonzero norms pin the (1+w)+bias convention
        for n, p in hf.named_parameters():
            if "layernorm" in n or ".norm." in n:
                p.uniform_(-0.3, 0.3)
    ids = torch.tensor([[5, 3, 7, 2, 9, 1, 4, 8]])
    with torch.no_grad():
        ref = hf(ids).logits.numpy()
    b = from_hf(hf, cfg)
    out = b.apply(jnp.asarray(ids.numpy()))
    lg = np.asarray(out[0] if isinstance(out, tuple) else out, np.float32)
    err = np.abs(lg - ref).max() / np.abs(ref).max()
    assert err < 2e-2, err
