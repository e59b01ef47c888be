"""Per-model recipe presets: load/validate all, run two end-to-end
(reference: modelopt_recipes/configs/ptq/presets/{model,kv,diffusers})."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modelopt_tpu.recipe import PRESETS, load_recipe


def test_all_presets_load_and_validate():
    from modelopt_tpu.quant.config import get_config

    for name in PRESETS:
        r = load_recipe(name)
        cfg = get_config(r.to_quantize_config())
        assert cfg.rules, name
        hash(cfg)  # must stay jit-static


def test_kv_fragment_composition():
    r = load_recipe("llama_w4a8_int8kv")
    # base exclusions survive the multi-import merge
    assert r.quant_cfg["*lm_head*"] == {"enable": False}
    # kv/int8.yaml fragment merged in
    assert r.quant_cfg["*k_quantizer"]["num_bits"] == 8
    assert r.quant_cfg["*weight_quantizer"]["num_bits"] == 4
    assert r.algorithm == {"method": "awq_lite"}


def test_qwen3_moe_preset_end_to_end():
    from modelopt_tpu.core import ModelBundle
    from modelopt_tpu.models import Decoder, qwen3_moe_config
    from modelopt_tpu.recipe import run_recipe

    cfg = qwen3_moe_config(
        hidden_size=64, num_layers=2, num_experts=4, experts_per_token=2,
        num_heads=2, num_kv_heads=1, head_dim=32, intermediate_size=96,
        moe_intermediate_size=64, vocab_size=256, max_position_embeddings=32,
        dtype=jnp.float32, param_dtype=jnp.float32,
    )
    m = Decoder(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 16)),
                      jnp.int32)
    variables = m.init(jax.random.PRNGKey(0), ids)
    bundle = ModelBundle(module=m, variables=dict(variables),
                         example_inputs=(ids,))
    r = load_recipe("qwen3_moe_w4a8", [
        "calib.num_batches=2", "calib.batch_size=2", "calib.seq_len=16",
    ])
    q = run_recipe(bundle, r)
    assert "quant" in q.variables
    # router exclusion: no router quantizer state was created
    flat = jax.tree_util.tree_leaves_with_path(q.variables["quant"])
    assert not any("router" in jax.tree_util.keystr(p) for p, _ in flat)


def test_dit_preset_end_to_end():
    from modelopt_tpu.core import ModelBundle
    from modelopt_tpu.models.dit import DiT, dit_config_s
    from modelopt_tpu.quant import quantize

    cfg = dit_config_s(dtype=jnp.float32)
    module = DiT(cfg)
    B = 2
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (B, cfg.image_size, cfg.image_size, cfg.in_channels),
                          jnp.float32)
    t = jnp.zeros((B,), jnp.int32)
    y = jnp.zeros((B,), jnp.int32)
    variables = module.init(jax.random.PRNGKey(0), x, t, y)
    bundle = ModelBundle(module=module, variables=dict(variables),
                         example_inputs=(x, t, y))
    r = load_recipe("dit_fp8")

    def forward_loop(model_fn):
        model_fn(x, t, y)

    q = quantize(bundle, r.to_quantize_config(), forward_loop)
    out = q.make_fn()(q.variables, x, t, y)
    assert np.isfinite(np.asarray(out)).all()
    # excluded modules carry no quantizer state
    flat = jax.tree_util.tree_leaves_with_path(q.variables["quant"])
    keys = [jax.tree_util.keystr(p) for p, _ in flat]
    assert not any("final_proj" in k or "t_embed" in k for k in keys)
    assert any("qkv_proj" in k for k in keys)


def test_mamba_moe_preset_end_to_end():
    """Hybrid Mamba2 + MoE quantized by the mamba_moe recipes: the
    conservative preset excludes attention projections but quantizes the
    mamba in/out projections (reference:
    presets/model/mamba_moe_fp8_conservative.yaml +
    units/mamba_moe_disabled_quantizers.yaml)."""
    from modelopt_tpu.core import ModelBundle
    from modelopt_tpu.models import Decoder, tiny_hybrid_test_config
    from modelopt_tpu.quant import quantize

    cfg = tiny_hybrid_test_config(
        dtype=jnp.float32, param_dtype=jnp.float32,
        num_experts=4, experts_per_token=2, moe_intermediate_size=64,
    )
    m = Decoder(cfg)
    ids = jnp.asarray(np.random.default_rng(3).integers(0, 256, (2, 16)),
                      jnp.int32)
    v = m.init(jax.random.PRNGKey(0), ids)
    bundle = ModelBundle(module=m, variables=dict(v), example_inputs=(ids,))
    r = load_recipe("mamba_moe_fp8_conservative")
    q = quantize(bundle, r.to_quantize_config(), lambda f: f(ids))
    out, _ = q.apply(ids)
    assert np.isfinite(np.asarray(out)).all()
    flat = jax.tree_util.tree_leaves_with_path(q.variables["quant"])
    keys = [jax.tree_util.keystr(p) for p, _ in flat]
    assert any("mixer" in k and "in_proj" in k for k in keys)
    assert not any("attn" in k for k in keys)
    r2 = load_recipe("mamba_moe_fp8_aggressive")
    q2 = quantize(bundle, r2.to_quantize_config(), lambda f: f(ids))
    keys2 = [jax.tree_util.keystr(p) for p, _ in
             jax.tree_util.tree_leaves_with_path(q2.variables["quant"])]
    assert any("attn" in k for k in keys2)


def test_base_disable_does_not_leak_into_numeric_rules():
    """The $import deep-merge must not leave base.yaml's blanket
    {enable: false} inside rules that set real numerics (this silently
    disabled every YAML-recipe weight quantizer before round 4)."""
    r = load_recipe("llama_fp8")
    assert r.quant_cfg["*weight_quantizer"].get("enable") is not False
    assert r.quant_cfg["*lm_head*"] == {"enable": False}  # pure exclusions stay
