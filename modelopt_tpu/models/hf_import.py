"""Import Hugging Face torch checkpoints into native linen decoders.

The reference wraps HF torch models in place; this framework instead converts
their weights into its own TPU-native modules (models/transformer.py). Covers
the GPT-2, Llama/TinyLlama/Mistral, Mixtral, LLaVA, and DeepSeek (MLA) families
(reference counterpart: the per-architecture HF plugins,
modelopt/torch/quantization/plugins/huggingface.py).

All functions accept either a live ``transformers`` model or a
``state_dict``-like mapping of numpy/torch tensors.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from ..core.bundle import ModelBundle
from .transformer import Decoder, DecoderConfig


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, dtype=np.float32)


def _sd(model_or_sd) -> Mapping[str, Any]:
    if hasattr(model_or_sd, "state_dict"):
        return model_or_sd.state_dict()
    return model_or_sd


def _rope_scaling_tuple(rs) -> tuple | None:
    """HF rope_scaling dict -> hashable (key, value) tuple; maps the legacy
    "type" key to "rope_type"."""
    if not rs:
        return None
    get = (lambda k, d=None: rs.get(k, d)) if isinstance(rs, dict) \
        else (lambda k, d=None: getattr(rs, k, d))
    rope_type = get("rope_type") or get("type")
    out = [("rope_type", rope_type)]
    for k in ("factor", "original_max_position_embeddings", "beta_fast",
              "beta_slow", "mscale", "mscale_all_dim", "attention_factor",
              "truncate", "short_factor", "long_factor",
              "low_freq_factor", "high_freq_factor"):
        v = get(k)
        if v is not None:
            if isinstance(v, (list, tuple)):
                v = tuple(float(x) for x in v)  # hashable (jit-static)
            out.append((k, v))
    return tuple(out)


def config_from_hf(hf_config) -> DecoderConfig:
    """Map an HF config object/dict to a DecoderConfig."""
    get = (lambda k, d=None: getattr(hf_config, k, d)) if not isinstance(
        hf_config, dict
    ) else (lambda k, d=None: hf_config.get(k, d))
    mt = (get("model_type") or "").lower()
    if mt == "gpt2":
        return DecoderConfig(
            vocab_size=get("vocab_size"), hidden_size=get("n_embd"),
            num_layers=get("n_layer"), num_heads=get("n_head"),
            intermediate_size=(get("n_inner") or 4 * get("n_embd")),
            activation="gelu", norm="layernorm", positions="learned",
            max_position_embeddings=get("n_positions", 1024), attn_bias=True,
            mlp_bias=True, tie_word_embeddings=True,
            norm_eps=get("layer_norm_epsilon", 1e-5),
        )
    if mt == "mamba2":
        # pure Mamba2 (state-spaces/mamba2 HF port): every layer is a
        # mixer-only block (no MLP, no attention) -> all-"M" hybrid
        # pattern + no_mlp layer plan on the native decoder
        L = get("num_hidden_layers")
        return DecoderConfig(
            vocab_size=get("vocab_size"), hidden_size=get("hidden_size"),
            num_layers=L, num_heads=1, intermediate_size=8,
            hybrid_pattern="M" * L,
            layer_plan=((("no_mlp", True),),) * L,
            mamba_num_heads=get("num_heads"),
            mamba_head_dim=get("head_dim", 64),
            mamba_state_dim=get("state_size", 128),
            mamba_groups=get("n_groups", 1),
            mamba_conv_width=get("conv_kernel", 4),
            mamba_chunk=get("chunk_size", 256),
            positions="none",
            norm_eps=get("layer_norm_epsilon", 1e-5),
            tie_word_embeddings=bool(get("tie_word_embeddings", False)),
            max_position_embeddings=get("max_position_embeddings", 4096)
            or 4096,
        )
    if mt == "bamba":
        # IBM Bamba: hybrid Mamba2 + attention, every block followed by a
        # SwiGLU MLP (the Jamba block shape) — maps onto hybrid_pattern
        # with attention at attn_layer_indices
        L = get("num_hidden_layers")
        attn_idx = set(get("attn_layer_indices") or [])
        return DecoderConfig(
            vocab_size=get("vocab_size"), hidden_size=get("hidden_size"),
            num_layers=L,
            num_heads=get("num_attention_heads"),
            num_kv_heads=get("num_key_value_heads"),
            intermediate_size=get("intermediate_size"),
            hybrid_pattern="".join(
                "*" if i in attn_idx else "M" for i in range(L)),
            mamba_num_heads=get("mamba_n_heads"),
            mamba_head_dim=get("mamba_d_head", 64),
            mamba_state_dim=get("mamba_d_state", 128),
            mamba_groups=get("mamba_n_groups", 1),
            mamba_conv_width=get("mamba_d_conv", 4),
            mamba_chunk=get("mamba_chunk_size", 256),
            partial_rotary_factor=get("partial_rotary_factor", 0.5),
            rope_theta=get("rope_theta", 10000.0),
            norm_eps=get("rms_norm_eps", 1e-5),
            tie_word_embeddings=bool(get("tie_word_embeddings", False)),
            max_position_embeddings=get("max_position_embeddings", 4096),
        )
    if mt == "nemotron_h":
        # NVIDIA Nemotron-H (reference per-arch importer:
        # modelopt/torch/export/plugins/mcore_nemotron.py:51
        # nemotron_h_causal_lm_import): every layer holds ONE block under
        # backbone.layers.{i}.mixer — Mamba2 ("M"), NoPE attention ("*"),
        # or squared-ReLU MLP ("-") per hybrid_override_pattern. Maps to
        # hybrid_pattern (M / *) + a layer_plan making each layer
        # single-block (no_mlp for M and *, no_attn for -).
        pattern = get("hybrid_override_pattern")
        plan = tuple(
            (("no_attn", True),) if c == "-" else (("no_mlp", True),)
            for c in pattern
        )
        return DecoderConfig(
            vocab_size=get("vocab_size"), hidden_size=get("hidden_size"),
            num_layers=get("num_hidden_layers"),
            num_heads=get("num_attention_heads"),
            num_kv_heads=get("num_key_value_heads"),
            head_dim=get("attention_head_dim") or get("head_dim"),
            intermediate_size=get("intermediate_size"),
            activation="relu2", positions="none",
            hybrid_pattern="".join("M" if c == "M" else "*"
                                   for c in pattern),
            layer_plan=plan,
            mamba_num_heads=get("mamba_num_heads"),
            mamba_head_dim=get("mamba_head_dim", 64),
            mamba_state_dim=get("ssm_state_size", 128),
            mamba_groups=get("n_groups", 1),
            mamba_conv_width=get("conv_kernel", 4),
            mamba_chunk=get("chunk_size", 256),
            norm_eps=get("rms_norm_eps", 1e-5),
            attn_bias=bool(get("use_bias", False)),
            mlp_bias=bool(get("use_bias", False)),
            tie_word_embeddings=bool(get("tie_word_embeddings", False)),
            max_position_embeddings=get("max_position_embeddings", 4096),
        )
    if mt == "nemotron":
        return DecoderConfig(
            vocab_size=get("vocab_size"), hidden_size=get("hidden_size"),
            num_layers=get("num_hidden_layers"),
            num_heads=get("num_attention_heads"),
            num_kv_heads=get("num_key_value_heads"),
            head_dim=get("head_dim"),
            intermediate_size=get("intermediate_size"),
            activation="relu2", norm="layernorm1p", positions="rope",
            partial_rotary_factor=float(get("partial_rotary_factor", 0.5)),
            rope_theta=get("rope_theta", 10000.0),
            max_position_embeddings=get("max_position_embeddings", 4096),
            attn_bias=bool(get("attention_bias", False)),
            mlp_bias=bool(get("mlp_bias", False)),
            tie_word_embeddings=bool(get("tie_word_embeddings", False)),
            norm_eps=get("norm_eps", 1e-5),
        )
    if mt in ("phi3", "phi4", "phi"):
        orig = get("original_max_position_embeddings")
        scaling = _rope_scaling_tuple(get("rope_scaling"))
        if scaling is not None:
            extra = []
            if orig:
                extra.append(("original_max_position_embeddings", orig))
                f = get("max_position_embeddings", orig) / orig
                extra.append(("factor", f))
                extra.append(("use_long_factors",
                              get("max_position_embeddings", orig) > orig))
            scaling = scaling + tuple(extra)
        return DecoderConfig(
            vocab_size=get("vocab_size"), hidden_size=get("hidden_size"),
            num_layers=get("num_hidden_layers"),
            num_heads=get("num_attention_heads"),
            num_kv_heads=get("num_key_value_heads"),
            intermediate_size=get("intermediate_size"),
            fused_qkv=True, fused_gate_up=True,
            activation="silu_glu", norm="rmsnorm", positions="rope",
            rope_theta=get("rope_theta", 10000.0), rope_scaling=scaling,
            max_position_embeddings=get("max_position_embeddings", 4096),
            attention_window=get("sliding_window"),
            tie_word_embeddings=bool(get("tie_word_embeddings", False)),
            norm_eps=get("rms_norm_eps", 1e-5),
        )
    if mt in ("llama4", "llama4_text"):
        tc = get("text_config")
        if tc is not None:
            return config_from_hf(tc)
        n_layers = get("num_hidden_layers")
        moe_layers = get("moe_layers")
        if moe_layers is None:
            step = get("interleave_moe_layer_step", 1)
            moe_layers = list(range(step - 1, n_layers, step))
        # HF fills empty/None no_rope_layers with the interval pattern
        # (every `no_rope_layer_interval`th layer is NoPE)
        interval = get("no_rope_layer_interval", 4)
        no_rope = get("no_rope_layers") or [
            int((i + 1) % interval != 0) for i in range(n_layers)
        ]
        layer_types = get("layer_types") or [
            "chunked_attention" if no_rope[i] else "full_attention"
            for i in range(n_layers)
        ]
        plan = []
        for i in range(n_layers):
            opts = []
            if not no_rope[i]:
                opts.append(("nope", True))
            if layer_types[i] == "chunked_attention":
                opts.append(("chunk", get("attention_chunk_size", 8192)))
            if i not in moe_layers:
                opts.append(("ffn", get("intermediate_size_mlp")))
            plan.append(tuple(opts))
        return DecoderConfig(
            vocab_size=get("vocab_size"), hidden_size=get("hidden_size"),
            num_layers=n_layers, num_heads=get("num_attention_heads"),
            num_kv_heads=get("num_key_value_heads"),
            head_dim=get("head_dim"),
            intermediate_size=get("intermediate_size_mlp"),
            moe_intermediate_size=get("intermediate_size"),
            num_experts=get("num_local_experts") or 0,
            experts_per_token=get("num_experts_per_tok") or 1,
            n_shared_experts=1, router_score="llama4",
            qk_l2norm=bool(get("use_qk_norm", True)),
            attn_temperature_tuning=bool(get("attn_temperature_tuning", True)),
            floor_scale=float(get("floor_scale", 8192)),
            attn_scale=float(get("attn_scale", 0.1)),
            activation="silu_glu", norm="rmsnorm", positions="rope",
            rope_theta=get("rope_theta", 500000.0),
            rope_scaling=_rope_scaling_tuple(get("rope_scaling")),
            layer_plan=tuple(plan),
            max_position_embeddings=get("max_position_embeddings", 131072),
            attn_bias=bool(get("attention_bias", False)),
            tie_word_embeddings=bool(get("tie_word_embeddings", False)),
            norm_eps=get("rms_norm_eps", 1e-5),
        )
    if mt in ("gemma2", "gemma3_text"):
        n_layers = get("num_hidden_layers")
        pattern = get("sliding_window_pattern",
                      6 if mt == "gemma3_text" else 2)
        # HF default: every `pattern`-th layer is full attention
        layer_types = get("layer_types") or [
            "sliding_attention" if (i + 1) % pattern else "full_attention"
            for i in range(n_layers)
        ]
        window = get("sliding_window", 4096)
        plan = tuple(
            (("window", window), ("local_rope", True))
            if t == "sliding_attention" else ()
            for t in layer_types
        ) or None
        return DecoderConfig(
            vocab_size=get("vocab_size"), hidden_size=get("hidden_size"),
            num_layers=get("num_hidden_layers"),
            num_heads=get("num_attention_heads"),
            num_kv_heads=get("num_key_value_heads"),
            head_dim=get("head_dim"),
            intermediate_size=get("intermediate_size"),
            activation="gelu_glu", norm="rmsnorm", positions="rope",
            norm_style="gemma", scale_embeddings=True,
            qk_norm=(mt == "gemma3_text"),
            query_pre_attn_scalar=float(get("query_pre_attn_scalar", 256)),
            attn_logit_softcap=get("attn_logit_softcapping"),
            final_logit_softcap=get("final_logit_softcapping"),
            rope_theta=get("rope_theta", 1e6),
            rope_local_base_freq=get(
                "rope_local_base_freq",
                10000.0 if mt == "gemma3_text" else get("rope_theta", 1e6),
            ),
            rope_scaling=_rope_scaling_tuple(get("rope_scaling")),
            layer_plan=plan,
            max_position_embeddings=get("max_position_embeddings", 131072),
            attn_bias=bool(get("attention_bias", False)),
            tie_word_embeddings=bool(get("tie_word_embeddings", True)),
            norm_eps=get("rms_norm_eps", 1e-6),
        )
    if mt in ("qwen3", "qwen3_moe"):
        return DecoderConfig(
            vocab_size=get("vocab_size"), hidden_size=get("hidden_size"),
            num_layers=get("num_hidden_layers"),
            num_heads=get("num_attention_heads"),
            num_kv_heads=get("num_key_value_heads"),
            head_dim=get("head_dim"),
            intermediate_size=get("intermediate_size"),
            moe_intermediate_size=get("moe_intermediate_size"),
            num_experts=(get("num_experts") or 0) if mt == "qwen3_moe" else 0,
            experts_per_token=get("num_experts_per_tok") or 2,
            norm_topk_prob=bool(get("norm_topk_prob", True)),
            qk_norm=True, activation="silu_glu", norm="rmsnorm",
            positions="rope", rope_theta=get("rope_theta", 1e6),
            rope_scaling=_rope_scaling_tuple(get("rope_scaling")),
            max_position_embeddings=get("max_position_embeddings", 40960),
            attn_bias=bool(get("attention_bias", False)),
            tie_word_embeddings=bool(get("tie_word_embeddings", False)),
            norm_eps=get("rms_norm_eps", 1e-6),
        )
    if mt in ("llama", "mistral", "qwen2", "tinyllama"):
        # Mistral (and qwen2 with use_sliding_window) checkpoints are trained
        # with sliding-window attention — importing them as full-causal
        # diverges at long context.
        window = None
        if mt == "mistral" or (mt == "qwen2" and get("use_sliding_window", False)):
            window = get("sliding_window")
        return DecoderConfig(
            attention_window=window,
            vocab_size=get("vocab_size"), hidden_size=get("hidden_size"),
            num_layers=get("num_hidden_layers"), num_heads=get("num_attention_heads"),
            num_kv_heads=get("num_key_value_heads"),
            head_dim=get("head_dim"),
            intermediate_size=get("intermediate_size"),
            activation="silu_glu", norm="rmsnorm", positions="rope",
            rope_theta=get("rope_theta", 10000.0),
            rope_scaling=_rope_scaling_tuple(get("rope_scaling")),
            max_position_embeddings=get("max_position_embeddings", 4096),
            attn_bias=bool(get("attention_bias", False)),
            tie_word_embeddings=bool(get("tie_word_embeddings", False)),
            norm_eps=get("rms_norm_eps", 1e-5),
        )
    if mt == "llava":
        from .vit import ViTConfig
        from .vlm import VLMConfig

        vc = get("vision_config")
        tc = get("text_config")
        vget = (lambda k, d=None: getattr(vc, k, d)) if not isinstance(
            vc, dict) else (lambda k, d=None: vc.get(k, d))
        if isinstance(tc, dict) and "model_type" not in tc:
            tc = {**tc, "model_type": "llama"}
        vision = ViTConfig(
            image_size=vget("image_size", 224),
            patch_size=vget("patch_size", 14),
            hidden_size=vget("hidden_size", 1024),
            num_layers=vget("num_hidden_layers", 24),
            num_heads=vget("num_attention_heads", 16),
            intermediate_size=vget("intermediate_size", 4096),
            norm_eps=vget("layer_norm_eps", 1e-5),
            select_layer=get("vision_feature_layer", -2),
        )
        return VLMConfig(vision=vision, text=config_from_hf(tc))
    if mt == "mixtral":
        return DecoderConfig(
            vocab_size=get("vocab_size"), hidden_size=get("hidden_size"),
            num_layers=get("num_hidden_layers"), num_heads=get("num_attention_heads"),
            num_kv_heads=get("num_key_value_heads"),
            intermediate_size=get("intermediate_size"),
            activation="silu_glu", norm="rmsnorm", positions="rope",
            rope_theta=get("rope_theta", 1e6),
            max_position_embeddings=get("max_position_embeddings", 4096),
            tie_word_embeddings=bool(get("tie_word_embeddings", False)),
            norm_eps=get("rms_norm_eps", 1e-5),
            num_experts=get("num_local_experts", 8),
            experts_per_token=get("num_experts_per_tok", 2),
        )
    if mt in ("deepseek_v2", "deepseek_v3", "deepseek"):
        # group limiting applies under V2 group_limited_greedy or V3 noaux_tc
        topk_method = get("topk_method") or (
            "noaux_tc" if mt == "deepseek_v3" else "greedy"
        )
        grouped = topk_method in ("group_limited_greedy", "noaux_tc")
        return DecoderConfig(
            vocab_size=get("vocab_size"), hidden_size=get("hidden_size"),
            num_layers=get("num_hidden_layers"),
            num_heads=get("num_attention_heads"),
            intermediate_size=get("intermediate_size"),
            moe_intermediate_size=get("moe_intermediate_size"),
            activation="silu_glu", norm="rmsnorm", positions="rope",
            rope_theta=get("rope_theta", 10000.0),
            rope_scaling=_rope_scaling_tuple(get("rope_scaling")),
            max_position_embeddings=get("max_position_embeddings", 4096),
            tie_word_embeddings=bool(get("tie_word_embeddings", False)),
            norm_eps=get("rms_norm_eps", 1e-5),
            num_experts=get("n_routed_experts") or 0,
            experts_per_token=get("num_experts_per_tok") or 2,
            n_shared_experts=get("n_shared_experts") or 0,
            router_score=("sigmoid" if get("scoring_func") == "sigmoid"
                          else "softmax"),
            router_correction_bias=(topk_method == "noaux_tc"),
            n_group=(get("n_group") if grouped else None),
            topk_group=get("topk_group") or 1,
            norm_topk_prob=bool(get("norm_topk_prob", False)),
            routed_scaling_factor=float(get("routed_scaling_factor", 1.0)),
            first_k_dense=get("first_k_dense_replace", 0),
            attention_type="mla",
            q_lora_rank=get("q_lora_rank"),
            kv_lora_rank=get("kv_lora_rank", 512),
            qk_nope_head_dim=get("qk_nope_head_dim", 128),
            qk_rope_head_dim=get("qk_rope_head_dim", 64),
            v_head_dim=get("v_head_dim", 128),
        )
    if mt == "gpt_oss":
        layer_types = get("layer_types") or []
        plan = tuple(
            (("window", get("sliding_window", 128)),)
            if t == "sliding_attention" else ()
            for t in layer_types
        ) or None
        scaling = _rope_scaling_tuple(get("rope_scaling"))
        return DecoderConfig(
            vocab_size=get("vocab_size"), hidden_size=get("hidden_size"),
            num_layers=get("num_hidden_layers"),
            num_heads=get("num_attention_heads"),
            num_kv_heads=get("num_key_value_heads"),
            head_dim=get("head_dim"),
            intermediate_size=get("intermediate_size"),
            activation="silu_glu", norm="rmsnorm", positions="rope",
            rope_theta=get("rope_theta", 150000.0), rope_scaling=scaling,
            max_position_embeddings=get("max_position_embeddings", 131072),
            attn_bias=bool(get("attention_bias", True)),
            tie_word_embeddings=bool(get("tie_word_embeddings", False)),
            norm_eps=get("rms_norm_eps", 1e-5),
            num_experts=get("num_local_experts", 32),
            experts_per_token=get("num_experts_per_tok", 4),
            moe_activation="swiglu_oai", moe_bias=True, router_bias=True,
            attention_sinks=True, layer_plan=plan,
        )
    raise ValueError(f"Unsupported HF model_type: {mt!r}")


def _llama_like_params(sd, cfg: DecoderConfig, prefix="model.", commit=None,
                       lm_head_key="lm_head.weight") -> dict:
    """``commit`` (default identity) is applied to each finished layer
    subtree — the streaming loader passes a device-put/cast here so at most
    one decoder layer of weights is ever resident on the host."""
    commit = commit or (lambda t: t)
    p: dict = {}
    p["embed_tokens"] = commit({"embedding": _np(sd[f"{prefix}embed_tokens.weight"])})
    for i in range(cfg.num_layers):
        L = f"{prefix}layers.{i}."
        if cfg.norm == "layernorm1p":
            layer: dict = {
                "input_norm": {
                    "scale": _np(sd[L + "input_layernorm.weight"]),
                    "bias": _np(sd[L + "input_layernorm.bias"]),
                },
                "post_attn_norm": {
                    "scale": _np(sd[L + "post_attention_layernorm.weight"]),
                    "bias": _np(sd[L + "post_attention_layernorm.bias"]),
                },
            }
        elif cfg.norm_style == "gemma":
            # gemma sandwich: HF post_attention_layernorm normalizes the
            # attention OUTPUT; pre_feedforward_layernorm is the pre-MLP norm
            layer: dict = {
                "input_norm": {"scale": _np(sd[L + "input_layernorm.weight"])},
                "post_attn_out_norm": {
                    "scale": _np(sd[L + "post_attention_layernorm.weight"])},
                "post_attn_norm": {
                    "scale": _np(sd[L + "pre_feedforward_layernorm.weight"])},
                "post_mlp_out_norm": {
                    "scale": _np(sd[L + "post_feedforward_layernorm.weight"])},
            }
        else:
            layer = {
                "input_norm": {"scale": _np(sd[L + "input_layernorm.weight"])},
                "post_attn_norm": {"scale": _np(sd[L + "post_attention_layernorm.weight"])},
            }
        attn = {}
        if cfg.fused_qkv:
            attn["qkv_proj"] = {"kernel": _np(sd[L + "self_attn.qkv_proj.weight"]).T}
            attn["o_proj"] = {"kernel": _np(sd[L + "self_attn.o_proj.weight"]).T}
        else:
            for name in ("q_proj", "k_proj", "v_proj", "o_proj"):
                attn[name] = {"kernel": _np(sd[L + f"self_attn.{name}.weight"]).T}
                if cfg.attn_bias and L + f"self_attn.{name}.bias" in sd:
                    attn[name]["bias"] = _np(sd[L + f"self_attn.{name}.bias"])
        if cfg.qk_norm:
            attn["q_norm"] = {"scale": _np(sd[L + "self_attn.q_norm.weight"])}
            attn["k_norm"] = {"scale": _np(sd[L + "self_attn.k_norm.weight"])}
        layer["attn"] = attn
        if cfg.num_experts > 0:
            E = cfg.num_experts
            if L + "block_sparse_moe.gate.weight" in sd:  # mixtral naming
                gate_key, ex = "block_sparse_moe.gate.weight", "block_sparse_moe.experts"
                names = {"gate_proj": "w1", "up_proj": "w3", "down_proj": "w2"}
            else:  # qwen3_moe naming
                gate_key, ex = "mlp.gate.weight", "mlp.experts"
                names = {n: n for n in ("gate_proj", "up_proj", "down_proj")}
            moe = {
                "router": {"kernel": _np(sd[L + gate_key]).T},
            }
            for ours, theirs in names.items():
                moe[ours] = {"kernel": np.stack([
                    _np(sd[L + f"{ex}.{e}.{theirs}.weight"]).T for e in range(E)
                ])}
            layer["moe"] = moe
        elif cfg.fused_gate_up:
            layer["mlp"] = {
                "gate_up_proj": {"kernel": _np(sd[L + "mlp.gate_up_proj.weight"]).T},
                "down_proj": {"kernel": _np(sd[L + "mlp.down_proj.weight"]).T},
            }
        elif cfg.activation == "relu2":
            layer["mlp"] = {
                name: {"kernel": _np(sd[L + f"mlp.{name}.weight"]).T}
                for name in ("up_proj", "down_proj")
            }
        else:
            layer["mlp"] = {
                name: {"kernel": _np(sd[L + f"mlp.{name}.weight"]).T}
                for name in ("gate_proj", "up_proj", "down_proj")
            }
        p[f"layers_{i}"] = commit(layer)
    fn = {"scale": _np(sd[f"{prefix}norm.weight"])}
    if cfg.norm == "layernorm1p":
        fn["bias"] = _np(sd[f"{prefix}norm.bias"])
    p["final_norm"] = commit(fn)
    if not cfg.tie_word_embeddings:
        p["lm_head"] = commit({"kernel": _np(sd[lm_head_key]).T})
    return p


def _deepseek_params(sd, cfg: DecoderConfig, prefix="model.", commit=None) -> dict:
    """DeepSeek-V2/V3 checkpoint map: MLA projections (optional q
    compression) + routed/shared MoE (reference workload:
    examples/deepseek/). HF naming follows DeepseekV2ForCausalLM.

    DeepSeek checkpoints store INTERLEAVED rope weights (HF applies
    apply_rotary_pos_emb_interleave: frequency j rotates adjacent columns
    (2j, 2j+1)); this framework's _rope rotates (j, j+d/2). The rope output
    dims only ever meet in the q_pe . k_pe inner product, so a consistent
    COLUMN PERMUTATION of the q rope slice and the k_pe slice reproduces
    HF's scores exactly: new column j <- old 2j, new j+d/2 <- old 2j+1."""
    commit = commit or (lambda t: t)
    dn, dr = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
    H = cfg.num_heads
    rope_perm = np.concatenate([np.arange(0, dr, 2), np.arange(1, dr, 2)])

    def deinterleave_q(w):
        # w [in, H*(dn+dr)]: permute each head's rope block columns
        w = w.reshape(w.shape[0], H, dn + dr)
        w = np.concatenate([w[..., :dn], w[..., dn:][..., rope_perm]], -1)
        return w.reshape(w.shape[0], H * (dn + dr))

    def deinterleave_kpe(w):
        # w [in, r+dr]: permute the shared rotary-key columns
        r = cfg.kv_lora_rank
        return np.concatenate([w[:, :r], w[:, r:][:, rope_perm]], -1)

    p: dict = {}
    p["embed_tokens"] = commit({"embedding": _np(sd[f"{prefix}embed_tokens.weight"])})
    for i in range(cfg.num_layers):
        L = f"{prefix}layers.{i}."
        A = L + "self_attn."
        attn: dict = {
            "kv_a_proj": {"kernel": deinterleave_kpe(
                _np(sd[A + "kv_a_proj_with_mqa.weight"]).T)},
            "kv_a_norm": {"scale": _np(sd[A + "kv_a_layernorm.weight"])},
            "kv_b_proj": {"kernel": _np(sd[A + "kv_b_proj.weight"]).T},
            "o_proj": {"kernel": _np(sd[A + "o_proj.weight"]).T},
        }
        if cfg.q_lora_rank:
            attn["q_a_proj"] = {"kernel": _np(sd[A + "q_a_proj.weight"]).T}
            attn["q_a_norm"] = {"scale": _np(sd[A + "q_a_layernorm.weight"])}
            attn["q_b_proj"] = {"kernel": deinterleave_q(
                _np(sd[A + "q_b_proj.weight"]).T)}
        else:
            attn["q_proj"] = {"kernel": deinterleave_q(
                _np(sd[A + "q_proj.weight"]).T)}
        layer: dict = {
            "input_norm": {"scale": _np(sd[L + "input_layernorm.weight"])},
            "post_attn_norm": {"scale": _np(sd[L + "post_attention_layernorm.weight"])},
            "attn": attn,
        }
        if cfg.num_experts > 0 and i >= cfg.first_k_dense:
            E = cfg.num_experts
            moe: dict = {
                "router": {"kernel": _np(sd[L + "mlp.gate.weight"]).T},
            }
            if cfg.router_correction_bias:
                moe["e_score_correction_bias"] = _np(
                    sd[L + "mlp.gate.e_score_correction_bias"]
                )
            moe.update({
                "gate_proj": {"kernel": np.stack([
                    _np(sd[L + f"mlp.experts.{e}.gate_proj.weight"]).T
                    for e in range(E)
                ])},
                "up_proj": {"kernel": np.stack([
                    _np(sd[L + f"mlp.experts.{e}.up_proj.weight"]).T
                    for e in range(E)
                ])},
                "down_proj": {"kernel": np.stack([
                    _np(sd[L + f"mlp.experts.{e}.down_proj.weight"]).T
                    for e in range(E)
                ])},
            })
            if cfg.n_shared_experts:
                moe["shared_experts"] = {
                    name: {"kernel": _np(
                        sd[L + f"mlp.shared_experts.{name}.weight"]).T}
                    for name in ("gate_proj", "up_proj", "down_proj")
                }
            layer["moe"] = moe
        elif cfg.fused_gate_up:
            layer["mlp"] = {
                "gate_up_proj": {"kernel": _np(sd[L + "mlp.gate_up_proj.weight"]).T},
                "down_proj": {"kernel": _np(sd[L + "mlp.down_proj.weight"]).T},
            }
        elif cfg.activation == "relu2":
            layer["mlp"] = {
                name: {"kernel": _np(sd[L + f"mlp.{name}.weight"]).T}
                for name in ("up_proj", "down_proj")
            }
        else:
            layer["mlp"] = {
                name: {"kernel": _np(sd[L + f"mlp.{name}.weight"]).T}
                for name in ("gate_proj", "up_proj", "down_proj")
            }
        p[f"layers_{i}"] = commit(layer)
    p["final_norm"] = commit({"scale": _np(sd[f"{prefix}norm.weight"])})
    if not cfg.tie_word_embeddings:
        p["lm_head"] = commit({"kernel": _np(sd["lm_head.weight"]).T})
    return p


def _gpt_oss_params(sd, cfg: DecoderConfig, prefix="model.", commit=None) -> dict:
    """gpt-oss checkpoint map: GQA with learned sinks + fused interleaved
    gate_up expert tensors (de-interleaved here into the native per-tensor
    expert einsums; reference workload: examples/gpt-oss/). Expert tensors
    are stored input-major ([E, in, out]) in the HF checkpoint — no
    transpose."""
    commit = commit or (lambda t: t)
    p: dict = {}
    p["embed_tokens"] = commit({"embedding": _np(sd[f"{prefix}embed_tokens.weight"])})
    for i in range(cfg.num_layers):
        L = f"{prefix}layers.{i}."
        attn: dict = {"sinks": _np(sd[L + "self_attn.sinks"])}
        for name in ("q_proj", "k_proj", "v_proj", "o_proj"):
            attn[name] = {"kernel": _np(sd[L + f"self_attn.{name}.weight"]).T}
            if L + f"self_attn.{name}.bias" in sd:
                attn[name]["bias"] = _np(sd[L + f"self_attn.{name}.bias"])
        gu = _np(sd[L + "mlp.experts.gate_up_proj"])          # [E, Hd, 2I]
        gub = _np(sd[L + "mlp.experts.gate_up_proj_bias"])    # [E, 2I]
        moe = {
            "router": {"kernel": _np(sd[L + "mlp.router.weight"]).T,
                       "bias": _np(sd[L + "mlp.router.bias"])},
            "gate_proj": {"kernel": gu[..., ::2], "bias": gub[..., ::2]},
            "up_proj": {"kernel": gu[..., 1::2], "bias": gub[..., 1::2]},
            "down_proj": {"kernel": _np(sd[L + "mlp.experts.down_proj"]),
                          "bias": _np(sd[L + "mlp.experts.down_proj_bias"])},
        }
        layer = {
            "input_norm": {"scale": _np(sd[L + "input_layernorm.weight"])},
            "post_attn_norm": {"scale": _np(sd[L + "post_attention_layernorm.weight"])},
            "attn": attn,
            "moe": moe,
        }
        p[f"layers_{i}"] = commit(layer)
    p["final_norm"] = commit({"scale": _np(sd[f"{prefix}norm.weight"])})
    if not cfg.tie_word_embeddings:
        p["lm_head"] = commit({"kernel": _np(sd["lm_head.weight"]).T})
    return p


def _llama4_params(sd, cfg: DecoderConfig, prefix="model.", commit=None) -> dict:
    """Llama-4 text checkpoint map: fused gate_up experts (chunked halves),
    input-scaled router, always-on shared expert, dense interleave layers
    under ``feed_forward.*``."""
    commit = commit or (lambda t: t)
    p: dict = {}
    p["embed_tokens"] = commit({"embedding": _np(sd[f"{prefix}embed_tokens.weight"])})
    I = cfg.moe_intermediate_size
    D = cfg.dims_per_head
    # Llama-4 applies INTERLEAVED complex rope (adjacent column pairs); the
    # native half-split rope needs new col j <- old 2j (see _deepseek_params
    # — the q.k inner product is permutation-invariant, and the post-rope
    # L2 norm is too)
    perm = np.concatenate([np.arange(0, D, 2), np.arange(1, D, 2)])

    def deinterleave(w):  # w [in, heads*D]
        w = w.reshape(w.shape[0], -1, D)[..., perm]
        return w.reshape(w.shape[0], -1)

    for i in range(cfg.num_layers):
        L = f"{prefix}layers.{i}."
        attn = {}
        for name in ("q_proj", "k_proj", "v_proj", "o_proj"):
            w = _np(sd[L + f"self_attn.{name}.weight"]).T
            if name in ("q_proj", "k_proj"):
                w = deinterleave(w)
            attn[name] = {"kernel": w}
        layer: dict = {
            "input_norm": {"scale": _np(sd[L + "input_layernorm.weight"])},
            "post_attn_norm": {"scale": _np(sd[L + "post_attention_layernorm.weight"])},
            "attn": attn,
        }
        opts = cfg.layer_opts(i)
        if "ffn" in opts:  # dense interleave layer
            layer["mlp"] = {
                name: {"kernel": _np(sd[L + f"feed_forward.{name}.weight"]).T}
                for name in ("gate_proj", "up_proj", "down_proj")
            }
        else:
            gu = _np(sd[L + "feed_forward.experts.gate_up_proj"])  # [E,Hd,2I]
            layer["moe"] = {
                "router": {"kernel": _np(sd[L + "feed_forward.router.weight"]).T},
                "gate_proj": {"kernel": gu[..., :I]},
                "up_proj": {"kernel": gu[..., I:]},
                "down_proj": {"kernel": _np(sd[L + "feed_forward.experts.down_proj"])},
                "shared_experts": {
                    name: {"kernel": _np(
                        sd[L + f"feed_forward.shared_expert.{name}.weight"]).T}
                    for name in ("gate_proj", "up_proj", "down_proj")
                },
            }
        p[f"layers_{i}"] = commit(layer)
    p["final_norm"] = commit({"scale": _np(sd[f"{prefix}norm.weight"])})
    if not cfg.tie_word_embeddings:
        p["lm_head"] = commit({"kernel": _np(sd["lm_head.weight"]).T})
    return p


def _llava_params(sd, cfg, commit=None) -> dict:
    """LLaVA checkpoint map: CLIP vision tower + 2-layer projector + llama
    decoder (reference VLM coverage: examples/vlm_ptq; naming follows HF
    LlavaForConditionalGeneration)."""
    commit = commit or (lambda t: t)
    vcfg = cfg.vision
    V = "vision_tower.vision_model."
    tower: dict = {
        "patch_embedding": {
            # torch conv [out, in, kh, kw] -> flax [kh, kw, in, out]
            "kernel": _np(sd[V + "embeddings.patch_embedding.weight"])
            .transpose(2, 3, 1, 0)
        },
        "class_embedding": _np(sd[V + "embeddings.class_embedding"]),
        "position_embedding": _np(sd[V + "embeddings.position_embedding.weight"]),
    }
    # HF CLIP spells it "pre_layrnorm"
    for hf_name in ("pre_layrnorm", "pre_layernorm"):
        if V + hf_name + ".weight" in sd:
            tower["pre_layernorm"] = {
                "scale": _np(sd[V + hf_name + ".weight"]),
                "bias": _np(sd[V + hf_name + ".bias"]),
            }
            break
    sel = vcfg.select_layer
    n_used = vcfg.num_layers if sel is None else (
        (vcfg.num_layers + sel if sel < 0 else sel) + 1
    )
    for i in range(n_used):
        L = f"{V}encoder.layers.{i}."
        layer = {
            "layer_norm1": {"scale": _np(sd[L + "layer_norm1.weight"]),
                            "bias": _np(sd[L + "layer_norm1.bias"])},
            "layer_norm2": {"scale": _np(sd[L + "layer_norm2.weight"]),
                            "bias": _np(sd[L + "layer_norm2.bias"])},
        }
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            layer[name] = {
                "kernel": _np(sd[L + f"self_attn.{name}.weight"]).T,
                "bias": _np(sd[L + f"self_attn.{name}.bias"]),
            }
        for name in ("fc1", "fc2"):
            layer[name] = {
                "kernel": _np(sd[L + f"mlp.{name}.weight"]).T,
                "bias": _np(sd[L + f"mlp.{name}.bias"]),
            }
        tower[f"layers_{i}"] = commit(layer)
    if sel is None:
        tower["post_layernorm"] = {
            "scale": _np(sd[V + "post_layernorm.weight"]),
            "bias": _np(sd[V + "post_layernorm.bias"]),
        }
    p: dict = {"vision_tower": tower}
    for name in ("linear_1", "linear_2"):
        p[name] = commit({
            "kernel": _np(sd[f"multi_modal_projector.{name}.weight"]).T,
            "bias": _np(sd[f"multi_modal_projector.{name}.bias"]),
        })
    p["language_model"] = _llama_like_params(
        sd, cfg.text, prefix="language_model.model.", commit=commit,
        lm_head_key="language_model.lm_head.weight",
    )
    return p


def _mamba2_params(sd, cfg: DecoderConfig, commit=None) -> dict:
    """HF Mamba2 (backbone.*) -> native hybrid decoder params. Weight
    translation only: in/out projections transpose (torch [out, in] ->
    [in, out]), the depthwise conv1d [conv_dim, 1, dc] becomes
    [dc, conv_dim], scalars (A_log/D/dt_bias) copy verbatim."""
    params: dict = {}
    params["embed_tokens"] = {"embedding": _np(sd["backbone.embeddings.weight"])}
    for i in range(cfg.num_layers):
        hp = f"backbone.layers.{i}."
        mixer = {
            "in_proj": {"kernel": _np(sd[hp + "mixer.in_proj.weight"]).T},
            "out_proj": {"kernel": _np(sd[hp + "mixer.out_proj.weight"]).T},
            "conv_kernel": _np(sd[hp + "mixer.conv1d.weight"])[:, 0, :].T,
            "conv_bias": _np(sd[hp + "mixer.conv1d.bias"]),
            "A_log": _np(sd[hp + "mixer.A_log"]),
            "D": _np(sd[hp + "mixer.D"]),
            "dt_bias": _np(sd[hp + "mixer.dt_bias"]),
            "norm_scale": _np(sd[hp + "mixer.norm.weight"]),
        }
        layer = {
            "input_norm": {"scale": _np(sd[hp + "norm.weight"])},
            "mixer": mixer,
        }
        params[f"layers_{i}"] = layer
        if commit is not None:
            params[f"layers_{i}"] = commit(params[f"layers_{i}"])
    params["final_norm"] = {"scale": _np(sd["backbone.norm_f.weight"])}
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"kernel": _np(sd["lm_head.weight"]).T}
    return params


def _bamba_params(sd, cfg: DecoderConfig, commit=None) -> dict:
    """IBM Bamba (model.*) -> native hybrid decoder params: mamba blocks
    translate like _mamba2_params (the mixer lives under '.mamba.'),
    attention blocks like the llama family, every block keeps its SwiGLU
    MLP under 'feed_forward'."""
    params: dict = {}
    params["embed_tokens"] = {"embedding": _np(sd["model.embed_tokens.weight"])}
    for i in range(cfg.num_layers):
        hp = f"model.layers.{i}."
        layer: dict = {
            "input_norm": {"scale": _np(sd[hp + "input_layernorm.weight"])},
            "post_attn_norm": {"scale": _np(sd[hp + "pre_ff_layernorm.weight"])},
            "mlp": {
                n: {"kernel": _np(sd[hp + f"feed_forward.{n}.weight"]).T}
                for n in ("gate_proj", "up_proj", "down_proj")
            },
        }
        if cfg.is_mamba(i):
            layer["mixer"] = {
                "in_proj": {"kernel": _np(sd[hp + "mamba.in_proj.weight"]).T},
                "out_proj": {"kernel": _np(sd[hp + "mamba.out_proj.weight"]).T},
                "conv_kernel": _np(sd[hp + "mamba.conv1d.weight"])[:, 0, :].T,
                "conv_bias": _np(sd[hp + "mamba.conv1d.bias"]),
                "A_log": _np(sd[hp + "mamba.A_log"]),
                "D": _np(sd[hp + "mamba.D"]),
                "dt_bias": _np(sd[hp + "mamba.dt_bias"]),
                "norm_scale": _np(sd[hp + "mamba.norm.weight"]),
            }
        else:
            layer["attn"] = {
                n: {"kernel": _np(sd[hp + f"self_attn.{n}.weight"]).T}
                for n in ("q_proj", "k_proj", "v_proj", "o_proj")
            }
        params[f"layers_{i}"] = layer
        if commit is not None:
            params[f"layers_{i}"] = commit(params[f"layers_{i}"])
    params["final_norm"] = {"scale": _np(sd["model.final_layernorm.weight"])}
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"kernel": _np(sd["lm_head.weight"]).T}
    return params


def _nemotron_h_params(sd, cfg: DecoderConfig, commit=None) -> dict:
    """NVIDIA Nemotron-H (backbone.*) -> native hybrid decoder params: one
    block per layer under ``backbone.layers.{i}.mixer`` whose kind follows
    hybrid_override_pattern — Mamba2 mixers translate like _mamba2_params,
    attention is q/k/v/o under mixer.*, MLP layers are up/down under
    mixer.* and their pre-norm maps to ``post_attn_norm`` (the Decoder's
    pre-MLP norm slot). Reference naming:
    export/plugins/mcore_nemotron.py:51."""
    params: dict = {}
    params["embed_tokens"] = {"embedding": _np(sd["backbone.embeddings.weight"])}
    for i in range(cfg.num_layers):
        hp = f"backbone.layers.{i}."
        mp = hp + "mixer."
        if cfg.is_mamba(i):
            layer = {
                "input_norm": {"scale": _np(sd[hp + "norm.weight"])},
                "mixer": {
                    "in_proj": {"kernel": _np(sd[mp + "in_proj.weight"]).T},
                    "out_proj": {"kernel": _np(sd[mp + "out_proj.weight"]).T},
                    "conv_kernel": _np(sd[mp + "conv1d.weight"])[:, 0, :].T,
                    "conv_bias": _np(sd[mp + "conv1d.bias"]),
                    "A_log": _np(sd[mp + "A_log"]),
                    "D": _np(sd[mp + "D"]),
                    "dt_bias": _np(sd[mp + "dt_bias"]),
                    "norm_scale": _np(sd[mp + "norm.weight"]),
                },
            }
        elif "no_attn" in cfg.layer_opts(i):  # "-": MLP-only layer
            mlp = {}
            for n in ("up_proj", "down_proj"):
                mlp[n] = {"kernel": _np(sd[mp + f"{n}.weight"]).T}
                if mp + f"{n}.bias" in sd:
                    mlp[n]["bias"] = _np(sd[mp + f"{n}.bias"])
            layer = {
                "post_attn_norm": {"scale": _np(sd[hp + "norm.weight"])},
                "mlp": mlp,
            }
        else:  # "*": NoPE attention layer
            attn = {}
            for n in ("q_proj", "k_proj", "v_proj", "o_proj"):
                attn[n] = {"kernel": _np(sd[mp + f"{n}.weight"]).T}
                if mp + f"{n}.bias" in sd:
                    attn[n]["bias"] = _np(sd[mp + f"{n}.bias"])
            layer = {
                "input_norm": {"scale": _np(sd[hp + "norm.weight"])},
                "attn": attn,
            }
        params[f"layers_{i}"] = layer
        if commit is not None:
            params[f"layers_{i}"] = commit(params[f"layers_{i}"])
    params["final_norm"] = {"scale": _np(sd["backbone.norm_f.weight"])}
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"kernel": _np(sd["lm_head.weight"]).T}
    return params


def _gpt2_params(sd, cfg: DecoderConfig) -> dict:
    pre = "transformer." if any(k.startswith("transformer.") for k in sd) else ""
    p: dict = {
        "embed_tokens": {"embedding": _np(sd[pre + "wte.weight"])},
        "embed_positions": {"embedding": _np(sd[pre + "wpe.weight"])},
    }
    H = cfg.hidden_size
    for i in range(cfg.num_layers):
        L = f"{pre}h.{i}."
        # HF GPT2 uses Conv1D: weights already [in, out]
        ca_w = _np(sd[L + "attn.c_attn.weight"])  # [H, 3H]
        ca_b = _np(sd[L + "attn.c_attn.bias"])
        qw, kw, vw = np.split(ca_w, 3, axis=1)
        qb, kb, vb = np.split(ca_b, 3)
        layer = {
            "input_norm": {
                "scale": _np(sd[L + "ln_1.weight"]), "bias": _np(sd[L + "ln_1.bias"])
            },
            "post_attn_norm": {
                "scale": _np(sd[L + "ln_2.weight"]), "bias": _np(sd[L + "ln_2.bias"])
            },
            "attn": {
                "q_proj": {"kernel": qw, "bias": qb},
                "k_proj": {"kernel": kw, "bias": kb},
                "v_proj": {"kernel": vw, "bias": vb},
                "o_proj": {
                    "kernel": _np(sd[L + "attn.c_proj.weight"]),
                    "bias": _np(sd[L + "attn.c_proj.bias"]),
                },
            },
            "mlp": {
                "fc_in": {
                    "kernel": _np(sd[L + "mlp.c_fc.weight"]),
                    "bias": _np(sd[L + "mlp.c_fc.bias"]),
                },
                "fc_out": {
                    "kernel": _np(sd[L + "mlp.c_proj.weight"]),
                    "bias": _np(sd[L + "mlp.c_proj.bias"]),
                },
            },
        }
        p[f"layers_{i}"] = layer
    p["final_norm"] = {
        "scale": _np(sd[pre + "ln_f.weight"]), "bias": _np(sd[pre + "ln_f.bias"])
    }
    return p


def from_hf(model, hf_config=None, example_len: int = 8, commit=None) -> ModelBundle:
    """Convert an HF torch model (or (state_dict, config)) into a ModelBundle."""
    if hf_config is None:
        hf_config = model.config
    cfg = config_from_hf(hf_config)
    sd = _sd(model)
    mt = (hf_config.model_type if not isinstance(hf_config, dict) else hf_config["model_type"]).lower()
    ids = jnp.zeros((1, example_len), jnp.int32)
    if mt == "gpt2":
        params = _gpt2_params(sd, cfg)
        module = Decoder(cfg)
        example_inputs = (ids,)
    elif mt == "llava":
        from .vlm import VLM

        params = _llava_params(sd, cfg, commit=commit)
        module = VLM(cfg)
        vc = cfg.vision
        pixels = jnp.zeros((1, vc.image_size, vc.image_size, 3), jnp.float32)
        example_inputs = (ids, pixels)
    elif mt.startswith("deepseek"):
        params = _deepseek_params(sd, cfg, commit=commit)
        module = Decoder(cfg)
        example_inputs = (ids,)
    elif mt == "gpt_oss":
        params = _gpt_oss_params(sd, cfg, commit=commit)
        module = Decoder(cfg)
        example_inputs = (ids,)
    elif mt.startswith("llama4"):
        params = _llama4_params(sd, cfg, commit=commit)
        module = Decoder(cfg)
        example_inputs = (ids,)
    elif mt == "mamba2":
        params = _mamba2_params(sd, cfg, commit=commit)
        module = Decoder(cfg)
        example_inputs = (ids,)
    elif mt == "bamba":
        params = _bamba_params(sd, cfg, commit=commit)
        module = Decoder(cfg)
        example_inputs = (ids,)
    elif mt == "nemotron_h":
        params = _nemotron_h_params(sd, cfg, commit=commit)
        module = Decoder(cfg)
        example_inputs = (ids,)
    else:
        params = _llama_like_params(sd, cfg, commit=commit)
        module = Decoder(cfg)
        example_inputs = (ids,)
    params = {k: _to_jnp(v) for k, v in params.items()}
    return ModelBundle(
        module=module,
        variables={"params": params},
        example_inputs=example_inputs,
        metadata={"hf_config": _config_dict(hf_config), "model_type": mt},
    )


class LazyStateDict(Mapping):
    """Read-on-demand view over a Hugging Face checkpoint directory's
    safetensors shards — each ``__getitem__`` reads ONE tensor from its
    shard's memory-map, so importing an N-GB model never materializes more
    than one tensor (plus one committed layer) on the host (reference
    counterpart: the sharded loaders behind examples/hf_ptq.py; the
    streaming concern mirrors unified_export_hf_streaming.py in reverse)."""

    def __init__(self, path: str):
        import glob
        import json
        import os

        self._path = path
        self._handles: dict = {}
        index = os.path.join(path, "model.safetensors.index.json")
        single = os.path.join(path, "model.safetensors")
        self._map: dict[str, str] = {}
        if os.path.exists(index):
            with open(index) as f:
                self._map = dict(json.load(f)["weight_map"])
        elif os.path.exists(single):
            for k in self._shard_keys("model.safetensors"):
                self._map[k] = "model.safetensors"
        else:
            shards = sorted(
                os.path.basename(p)
                for p in glob.glob(os.path.join(path, "*.safetensors"))
            )
            if not shards:
                raise FileNotFoundError(
                    f"no safetensors checkpoint under {path!r}"
                )
            for s in shards:
                for k in self._shard_keys(s):
                    self._map[k] = s

    def _open(self, shard: str):
        if shard not in self._handles:
            from safetensors import safe_open

            self._handles[shard] = safe_open(
                f"{self._path}/{shard}", framework="pt"
            )
        return self._handles[shard]

    def _shard_keys(self, shard: str):
        return list(self._open(shard).keys())

    def __getitem__(self, key: str):
        return self._open(self._map[key]).get_tensor(key)

    def __iter__(self):
        return iter(self._map)

    def __len__(self):
        return len(self._map)


def load_hf_checkpoint(path: str, example_len: int = 8,
                       param_dtype=None) -> ModelBundle:
    """Stream a Hugging Face checkpoint directory (``config.json`` +
    safetensors shard(s)) into a ModelBundle, shard-by-shard: tensors are
    read lazily and each finished decoder layer is committed to a jax array
    (cast to ``param_dtype``, default bf16) before the next layer is read —
    required on this relay where whole-model host materialization is not an
    option (reference: examples/hf_ptq.py --model <dir>)."""
    import json
    import os

    with open(os.path.join(path, "config.json")) as f:
        hf_config = json.load(f)
    dtype = param_dtype or jnp.bfloat16

    def commit(subtree):
        return jax.tree.map(
            lambda a: jnp.asarray(a, dtype=dtype), subtree
        )

    sd = LazyStateDict(path)
    bundle = from_hf(sd, hf_config, example_len=example_len, commit=commit)
    bundle.metadata["checkpoint_path"] = path
    return bundle


def _to_jnp(tree):
    if isinstance(tree, dict):
        return {k: _to_jnp(v) for k, v in tree.items()}
    return jnp.asarray(tree)


def _config_dict(hf_config):
    if isinstance(hf_config, dict):
        return hf_config
    try:
        return hf_config.to_dict()
    except Exception:
        return {}
