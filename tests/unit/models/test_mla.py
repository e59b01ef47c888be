"""Multi-head Latent Attention (DeepSeek family): decode parity, latent
cache quantization, MoE shared experts / sigmoid routing, HF import."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modelopt_tpu.core import PHASE_QUANT, ModelBundle
from modelopt_tpu.models import Decoder, make_cache, tiny_mla_test_config


@pytest.fixture(scope="module")
def mla_bundle():
    cfg = tiny_mla_test_config()
    m = Decoder(cfg)
    ids = jnp.zeros((2, 16), jnp.int32)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), ids)
    return ModelBundle(module=m, variables=dict(v), example_inputs=(ids,))


def test_mla_cached_decode_matches_full(mla_bundle):
    m, v = mla_bundle.module, mla_bundle.variables
    cfg = m.cfg
    ids = jnp.asarray([[5, 3, 7], [2, 2, 2]], jnp.int32)
    cache = make_cache(cfg, 2, 16)
    # latent rows padded to full lane tiles; v is an empty placeholder
    dc = cfg.kv_lora_rank + cfg.qk_rope_head_dim
    assert cache["k"][0].shape[2] == -(-dc // 128) * 128
    assert cache["v"][0].shape[2] == 0
    lg, cache = m.apply(v, ids, cache)
    tok = jnp.argmax(lg[:, -1:], -1).astype(jnp.int32)
    lg2, cache = m.apply(v, tok, cache)
    full, _ = m.apply(v, jnp.concatenate([ids, tok], 1))
    np.testing.assert_allclose(
        np.asarray(lg2[:, -1]), np.asarray(full[:, -1]), rtol=3e-4, atol=3e-4
    )


def test_mla_quantize_and_fp8_latent_cache(mla_bundle):
    import modelopt_tpu.quant as mtq

    cfg = mla_bundle.module.cfg
    data = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)
    q = mtq.quantize(mla_bundle, "FP8_KV_CFG", lambda f: f(data))
    # kv_b_proj participates in weight quantization (absorbed kernel)
    qt = q.variables["quant"]["layers_0"]["attn"]["kv_b_proj"]
    assert "weight_quantizer" in qt
    fn = jax.jit(q.make_fn(phase=PHASE_QUANT))
    cache = make_cache(cfg, 2, 16, dtype=jnp.float8_e4m3fn)
    lg, cache = fn(q.variables, jnp.asarray([[5, 3], [1, 4]], jnp.int32), cache)
    assert cache["k"][0].dtype == jnp.float8_e4m3fn
    tok = jnp.argmax(lg[:, -1:], -1).astype(jnp.int32)
    lg2, _ = fn(q.variables, tok, cache)
    assert np.isfinite(np.asarray(lg2)).all()


def test_shared_experts_and_sigmoid_router():
    import dataclasses

    cfg = tiny_mla_test_config(router_score="sigmoid")
    m = Decoder(cfg)
    ids = jnp.zeros((1, 8), jnp.int32)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), ids)
    # layer_0 is dense (first_k_dense=1); layer_1 routed MoE + shared expert
    p1 = v["params"]["layers_1"]["moe"]
    assert "shared_experts" in p1 and "router" in p1
    assert "mlp" in v["params"]["layers_0"]
    lg, _ = m.apply(v, ids)
    assert np.isfinite(np.asarray(lg)).all()
    # sigmoid scoring changes the routed mixture vs softmax on same params
    cfg_sm = dataclasses.replace(cfg, router_score="softmax")
    lg_sm, _ = Decoder(cfg_sm).apply(v, ids)
    assert not np.allclose(np.asarray(lg), np.asarray(lg_sm))


def test_deepseek_hf_import_roundtrip():
    """Synthetic DeepSeek-V2-Lite-shaped state dict imports and runs."""
    from modelopt_tpu.models.hf_import import from_hf

    rng = np.random.default_rng(0)
    hf_cfg = {
        "model_type": "deepseek_v2", "vocab_size": 64, "hidden_size": 32,
        "num_hidden_layers": 2, "num_attention_heads": 2,
        "intermediate_size": 48, "moe_intermediate_size": 16,
        "n_routed_experts": 4, "num_experts_per_tok": 2,
        "n_shared_experts": 1, "first_k_dense_replace": 1,
        "q_lora_rank": None, "kv_lora_rank": 16, "qk_nope_head_dim": 8,
        "qk_rope_head_dim": 4, "v_head_dim": 8, "rms_norm_eps": 1e-6,
    }
    H, Hd = 2, 32
    r, dn, dr, dv = 16, 8, 4, 8
    w = lambda *s: rng.standard_normal(s).astype(np.float32) * 0.05  # noqa: E731
    sd = {"model.embed_tokens.weight": w(64, Hd),
          "model.norm.weight": np.ones(Hd, np.float32),
          "lm_head.weight": w(64, Hd)}
    for i in range(2):
        L = f"model.layers.{i}."
        sd[L + "input_layernorm.weight"] = np.ones(Hd, np.float32)
        sd[L + "post_attention_layernorm.weight"] = np.ones(Hd, np.float32)
        A = L + "self_attn."
        sd[A + "q_proj.weight"] = w(H * (dn + dr), Hd)
        sd[A + "kv_a_proj_with_mqa.weight"] = w(r + dr, Hd)
        sd[A + "kv_a_layernorm.weight"] = np.ones(r, np.float32)
        sd[A + "kv_b_proj.weight"] = w(H * (dn + dv), r)
        sd[A + "o_proj.weight"] = w(Hd, H * dv)
        if i == 0:
            for n in ("gate_proj", "up_proj", "down_proj"):
                shp = (48, Hd) if n != "down_proj" else (Hd, 48)
                sd[L + f"mlp.{n}.weight"] = w(*shp)
        else:
            sd[L + "mlp.gate.weight"] = w(4, Hd)
            for e in range(4):
                for n in ("gate_proj", "up_proj", "down_proj"):
                    shp = (16, Hd) if n != "down_proj" else (Hd, 16)
                    sd[L + f"mlp.experts.{e}.{n}.weight"] = w(*shp)
            for n in ("gate_proj", "up_proj", "down_proj"):
                shp = (16, Hd) if n != "down_proj" else (Hd, 16)
                sd[L + f"mlp.shared_experts.{n}.weight"] = w(*shp)
    bundle = from_hf(sd, hf_cfg)
    assert bundle.module.cfg.attention_type == "mla"
    out = bundle.apply(jnp.asarray([[1, 2, 3]], jnp.int32))
    logits = out[0] if isinstance(out, tuple) else out
    assert logits.shape == (1, 3, 64)
    assert np.isfinite(np.asarray(logits)).all()


def test_deepseek_v3_hf_logit_parity():
    """Import a random-init HF DeepseekV3ForCausalLM and match its logits —
    pins the rope de-interleave permutation, noaux_tc sigmoid routing with
    group limiting + correction bias + routed_scaling_factor, YaRN
    frequencies with mscale, and the absorbed-MLA math at once."""
    torch = pytest.importorskip("torch")
    tfm = pytest.importorskip("transformers")
    from transformers.models.deepseek_v3.modeling_deepseek_v3 import (
        DeepseekV3ForCausalLM,
    )

    from modelopt_tpu.models.hf_import import from_hf

    cfg = tfm.DeepseekV3Config(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4,
        intermediate_size=96, moe_intermediate_size=32,
        n_routed_experts=8, num_experts_per_tok=2, n_shared_experts=1,
        n_group=2, topk_group=1, norm_topk_prob=True,
        routed_scaling_factor=2.5, scoring_func="sigmoid",
        topk_method="noaux_tc", first_k_dense_replace=1,
        q_lora_rank=32, kv_lora_rank=32, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16, qk_head_dim=24,
        rope_theta=10000.0,
        rope_scaling={"type": "yarn", "factor": 4.0,
                      "original_max_position_embeddings": 32,
                      "beta_fast": 32.0, "beta_slow": 1.0,
                      "mscale": 1.0, "mscale_all_dim": 1.0},
        max_position_embeddings=128, attention_bias=False,
        tie_word_embeddings=False, rms_norm_eps=1e-6,
    )
    torch.manual_seed(0)
    hf = DeepseekV3ForCausalLM(cfg).eval().float()
    with torch.no_grad():  # nonzero bias so the selection path is pinned
        for layer in hf.model.layers[1:]:
            layer.mlp.gate.e_score_correction_bias.uniform_(-0.5, 0.5)
    ids = torch.tensor([[5, 3, 7, 2, 9, 1, 4, 8]])
    with torch.no_grad():
        ref = hf(ids).logits.numpy()
    bundle = from_hf(hf, cfg)
    out = bundle.apply(jnp.asarray(ids.numpy()))
    logits = np.asarray(out[0] if isinstance(out, tuple) else out, np.float32)
    err = np.abs(logits - ref).max() / np.abs(ref).max()
    assert err < 2e-2, err  # bf16 compute vs fp32 torch


def test_mla_kernel_formulation_matches_einsum():
    """The decode fast path reformulates absorbed MLA attention as a
    single-shared-KV-head Pallas decode (q_eff = [q_lat;q_pe;pad] over
    padded latent rows, value projection commuted out of the PV product) —
    pin the formulation against the einsum path in interpreter mode."""
    from jax.experimental.pallas import tpu as pltpu

    from modelopt_tpu.kernels.attention import decode_attention

    rng = np.random.default_rng(0)
    B, S, H, r, dr = 2, 16, 2, 24, 8
    Dc = 128  # padded row width
    L = np.asarray([5, 16])
    rows = rng.standard_normal((B, S, r + dr)).astype(np.float32) * 0.3
    q_lat = rng.standard_normal((B, H, r)).astype(np.float32)
    q_pe = rng.standard_normal((B, H, dr)).astype(np.float32)
    scale = 1.0 / np.sqrt(17.0)

    # einsum reference
    s = (np.einsum("bhr,bsr->bhs", q_lat, rows[..., :r])
         + np.einsum("bhd,bsd->bhs", q_pe, rows[..., r:])) * scale
    for b in range(B):
        s[b, :, L[b]:] = -1e30
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    o_ref = np.einsum("bhs,bsr->bhr", p, rows[..., :r])

    pad = Dc - (r + dr)
    ck = jnp.asarray(np.pad(rows, ((0, 0), (0, 0), (0, pad))))
    q_eff = jnp.asarray(
        np.pad(np.concatenate([q_lat, q_pe], -1), ((0, 0), (0, 0), (0, pad)))
    )[:, None] * (scale * Dc ** 0.5)
    with pltpu.force_tpu_interpret_mode():
        o = decode_attention(q_eff.astype(jnp.float32), ck, ck,
                             jnp.asarray(L, jnp.int32), out_dtype=jnp.float32)
    got = np.asarray(o)[:, 0][..., :r]
    np.testing.assert_allclose(got, o_ref, rtol=2e-2, atol=2e-2)
