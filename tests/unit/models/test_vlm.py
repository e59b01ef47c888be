"""VLM (ViT tower + projector + decoder): forward, llava import map, and
quantization across both towers (reference analogue: examples/vlm_ptq)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import modelopt_tpu.quant as mtq
from modelopt_tpu.core import ModelBundle
from modelopt_tpu.models import VLM, from_hf, tiny_vlm_config


@pytest.fixture(scope="module")
def vlm_bundle():
    cfg = tiny_vlm_config()
    m = VLM(cfg)
    ids = jnp.zeros((2, 6), jnp.int32)
    px = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 16, 16, 3)), jnp.float32
    )
    variables = m.init(jax.random.PRNGKey(0), ids, px)
    return ModelBundle(module=m, variables=dict(variables),
                       example_inputs=(ids, px))


def test_vlm_forward_shapes(vlm_bundle):
    ids, px = vlm_bundle.example_inputs
    logits, _ = vlm_bundle.apply(ids, px)
    P = vlm_bundle.module.num_image_tokens
    assert P == 4  # 16/8 squared
    assert logits.shape == (2, P + 6, vlm_bundle.module.cfg.text.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_vlm_text_only_matches_decoder(vlm_bundle):
    """Without pixels the VLM is exactly its language model."""
    ids, _ = vlm_bundle.example_inputs
    logits, _ = vlm_bundle.apply(ids)
    from modelopt_tpu.models import Decoder

    dec = Decoder(vlm_bundle.module.cfg.text)
    want, _ = dec.apply(
        {"params": vlm_bundle.variables["params"]["language_model"]}, ids
    )
    np.testing.assert_allclose(np.asarray(logits), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_vlm_image_prefix_changes_text_logits(vlm_bundle):
    ids, px = vlm_bundle.example_inputs
    with_img, _ = vlm_bundle.apply(ids, px)
    without, _ = vlm_bundle.apply(ids)
    P = vlm_bundle.module.num_image_tokens
    # causal: text positions attend the image prefix, so logits must differ
    assert not np.allclose(np.asarray(with_img[:, P:]), np.asarray(without))


def test_vlm_quantize_covers_both_towers(vlm_bundle):
    qb = mtq.quantize(vlm_bundle, mtq.INT8_DEFAULT_CFG)
    from modelopt_tpu.core.tree import flatten_with_paths

    paths = [p for p, _ in flatten_with_paths(qb.variables["quant"])]
    assert any(p.startswith("vision_tower/") for p in paths)
    assert any(p.startswith("language_model/") for p in paths)
    assert mtq.validate_calibration(qb) == []
    ids, px = vlm_bundle.example_inputs
    logits, _ = qb.apply(ids, px)
    ref, _ = vlm_bundle.apply(ids, px)
    rel = float(
        jnp.linalg.norm(logits.astype(jnp.float32) - ref)
        / jnp.linalg.norm(ref)
    )
    assert np.isfinite(np.asarray(logits)).all()
    assert rel < 0.35, rel


def _synthetic_llava_sd(vcfg, tcfg, rng):
    """HF-naming state dict for a tiny llava checkpoint."""
    sd = {}
    V = "vision_tower.vision_model."
    H, I, p = vcfg["hidden_size"], vcfg["intermediate_size"], vcfg["patch_size"]
    n_patch = (vcfg["image_size"] // p) ** 2

    def t(*shape):
        return rng.normal(size=shape).astype(np.float32) * 0.05

    sd[V + "embeddings.patch_embedding.weight"] = t(H, 3, p, p)
    sd[V + "embeddings.class_embedding"] = t(H)
    sd[V + "embeddings.position_embedding.weight"] = t(n_patch + 1, H)
    sd[V + "pre_layrnorm.weight"] = np.ones(H, np.float32)
    sd[V + "pre_layrnorm.bias"] = np.zeros(H, np.float32)
    for i in range(vcfg["num_hidden_layers"]):
        L = f"{V}encoder.layers.{i}."
        for n in ("layer_norm1", "layer_norm2"):
            sd[L + n + ".weight"] = np.ones(H, np.float32)
            sd[L + n + ".bias"] = np.zeros(H, np.float32)
        for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[L + f"self_attn.{n}.weight"] = t(H, H)
            sd[L + f"self_attn.{n}.bias"] = t(H)
        sd[L + "mlp.fc1.weight"] = t(I, H)
        sd[L + "mlp.fc1.bias"] = t(I)
        sd[L + "mlp.fc2.weight"] = t(H, I)
        sd[L + "mlp.fc2.bias"] = t(H)
    sd[V + "post_layernorm.weight"] = np.ones(H, np.float32)
    sd[V + "post_layernorm.bias"] = np.zeros(H, np.float32)

    tH, tI, tV = tcfg["hidden_size"], tcfg["intermediate_size"], tcfg["vocab_size"]
    sd["multi_modal_projector.linear_1.weight"] = t(tH, H)
    sd["multi_modal_projector.linear_1.bias"] = t(tH)
    sd["multi_modal_projector.linear_2.weight"] = t(tH, tH)
    sd["multi_modal_projector.linear_2.bias"] = t(tH)
    T = "language_model.model."
    sd[T + "embed_tokens.weight"] = t(tV, tH)
    kvh = tcfg["num_key_value_heads"]
    hd = tH // tcfg["num_attention_heads"]
    for i in range(tcfg["num_hidden_layers"]):
        L = f"{T}layers.{i}."
        sd[L + "input_layernorm.weight"] = np.ones(tH, np.float32)
        sd[L + "post_attention_layernorm.weight"] = np.ones(tH, np.float32)
        sd[L + "self_attn.q_proj.weight"] = t(tH, tH)
        sd[L + "self_attn.k_proj.weight"] = t(kvh * hd, tH)
        sd[L + "self_attn.v_proj.weight"] = t(kvh * hd, tH)
        sd[L + "self_attn.o_proj.weight"] = t(tH, tH)
        for n, shp in (("gate_proj", (tI, tH)), ("up_proj", (tI, tH)),
                       ("down_proj", (tH, tI))):
            sd[L + f"mlp.{n}.weight"] = t(*shp)
    sd[T + "norm.weight"] = np.ones(tH, np.float32)
    sd["language_model.lm_head.weight"] = t(tV, tH)
    return sd


def test_llava_import_and_forward():
    rng = np.random.default_rng(1)
    vcfg = dict(image_size=16, patch_size=8, hidden_size=32,
                num_hidden_layers=2, num_attention_heads=2,
                intermediate_size=64, layer_norm_eps=1e-5)
    tcfg = dict(model_type="llama", vocab_size=128, hidden_size=32,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, intermediate_size=64,
                rms_norm_eps=1e-5, max_position_embeddings=64)
    hf_config = dict(model_type="llava", vision_config=vcfg, text_config=tcfg,
                     vision_feature_layer=-2)
    sd = _synthetic_llava_sd(vcfg, tcfg, rng)
    bundle = from_hf(sd, hf_config, example_len=6)
    assert isinstance(bundle.module, VLM)
    ids, px = bundle.example_inputs
    logits, _ = bundle.apply(ids, px)
    P = bundle.module.num_image_tokens
    assert logits.shape == (1, P + 6, 128)
    assert np.isfinite(np.asarray(logits, np.float32)).all()
    # select_layer=-2 on a 2-layer tower: only layer 0 imported/used
    assert "layers_1" not in bundle.variables["params"]["vision_tower"]
