"""Model correctness: HF parity (tiny random HF models on CPU torch),
KV-cache decode equivalence, and quantization integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import modelopt_tpu.quant as mtq
from modelopt_tpu.models import (
    Decoder,
    from_hf,
    make_cache,
    tiny_test_config,
)
from modelopt_tpu.core import ModelBundle
from modelopt_tpu.utils import perplexity, synthetic_token_batches


def tiny_bundle(**over):
    cfg = tiny_test_config(dtype=jnp.float32, **over)
    m = Decoder(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 16)), jnp.int32)
    variables = m.init(jax.random.PRNGKey(0), ids)
    return ModelBundle(module=m, variables=dict(variables), example_inputs=(ids,)), cfg


class TestDecoder:
    def test_forward_shapes(self):
        bundle, cfg = tiny_bundle()
        logits, cache = bundle.apply(*bundle.example_inputs)
        assert logits.shape == (2, 16, cfg.vocab_size)
        assert cache is None

    def test_kv_cache_decode_matches_full_forward(self):
        bundle, cfg = tiny_bundle()
        ids = bundle.example_inputs[0]
        full_logits, _ = bundle.apply(ids)

        cache = make_cache(cfg, batch=2, max_len=32, dtype=jnp.float32)
        # prefill on first 8 tokens, then decode one-by-one
        logits_p, cache = bundle.apply(ids[:, :8], cache)
        step_logits = [logits_p]
        fn = jax.jit(bundle.make_fn())
        for t in range(8, 16):
            lg, cache = fn(bundle.variables, ids[:, t : t + 1], cache)
            step_logits.append(lg)
        inc = jnp.concatenate(step_logits, axis=1)
        np.testing.assert_allclose(
            np.asarray(inc), np.asarray(full_logits), rtol=1e-4, atol=1e-4
        )

    def test_moe_forward(self):
        bundle, cfg = tiny_bundle(num_experts=4, experts_per_token=2)
        logits, _ = bundle.apply(*bundle.example_inputs)
        assert logits.shape == (2, 16, cfg.vocab_size)
        assert "moe" in bundle.variables["params"]["layers_0"]

    def test_quantize_decoder_fp8(self):
        bundle, cfg = tiny_bundle()
        ids = bundle.example_inputs[0]
        q = mtq.quantize(bundle, mtq.FP8_KV_CFG, lambda fn: fn(ids))
        quant = q.variables["quant"]
        assert "k_quantizer" in quant["layers_0"]["attn"]
        base, _ = bundle.apply(ids)
        out, _ = q.apply(ids)
        rel = float(jnp.linalg.norm(out - base) / jnp.linalg.norm(base))
        assert 0 < rel < 0.2

    def test_fuse_for_serving_exact(self):
        from modelopt_tpu.models.transformer import fuse_for_serving

        bundle, cfg = tiny_bundle()
        ids = bundle.example_inputs[0]
        fused = fuse_for_serving(bundle)
        assert fused.module.cfg.fused_qkv and fused.module.cfg.fused_gate_up
        base, _ = bundle.apply(ids)
        out, _ = fused.apply(ids)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(out))
        # fused model quantizes + serves
        import modelopt_tpu.quant as mtq

        q = mtq.quantize(fused, mtq.FP8_DEFAULT_CFG, lambda f: f(ids))
        assert "qkv_proj" in q.variables["quant"]["layers_0"]["attn"]

    def test_perplexity_sanity(self):
        bundle, cfg = tiny_bundle()
        batches = synthetic_token_batches(cfg.vocab_size, num_batches=2, seqlen=32)
        ppl = perplexity(bundle, batches)
        assert 1.0 < ppl < cfg.vocab_size * 10


@pytest.mark.parametrize("family", ["gpt2", "llama", "mixtral"])
def test_hf_parity(family):
    """Random tiny HF torch model logits == our imported model logits."""
    torch = pytest.importorskip("torch")
    import transformers

    torch.manual_seed(0)
    if family == "gpt2":
        hf_cfg = transformers.GPT2Config(
            vocab_size=128, n_positions=64, n_embd=32, n_layer=2, n_head=4,
            resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
        )
        hf = transformers.GPT2LMHeadModel(hf_cfg)
    elif family == "llama":
        hf_cfg = transformers.LlamaConfig(
            vocab_size=128, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=64, tie_word_embeddings=False,
        )
        hf = transformers.LlamaForCausalLM(hf_cfg)
    else:
        hf_cfg = transformers.MixtralConfig(
            vocab_size=128, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=64, num_local_experts=4,
            num_experts_per_tok=2, tie_word_embeddings=False,
        )
        hf = transformers.MixtralForCausalLM(hf_cfg)
    hf.eval()

    ids = np.random.default_rng(1).integers(0, 128, (2, 10))
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.float().numpy()

    bundle = from_hf(hf)
    # run in fp32 for parity
    import dataclasses

    cfg32 = dataclasses.replace(bundle.module.cfg, dtype=jnp.float32)
    bundle = bundle.replace(module=Decoder(cfg32))
    logits, _ = bundle.apply(jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-3, atol=2e-3)
