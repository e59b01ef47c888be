"""Deployable draft-model (EAGLE / Medusa) checkpoint export.

Reproduces the reference's speculative-decoding export schema
(reference: modelopt/torch/export/plugins/hf_spec_export.py:121
EagleExporter, :302 EagleMedusaExporter; template config in
plugins/hf_spec_configs.py llama_eagle_template_config) so drafts trained
here deploy to engines that consume that format:

  * ``model.safetensors`` holding ONLY the draft module, renamed to the
    deployment keys: ``layers.{i}.self_attn.{q,k,v,o}_proj.weight``,
    ``layers.{i}.mlp.{gate,up,down}_proj.weight``,
    ``layers.{i}.input_layernorm.weight``,
    ``layers.{i}.post_attention_layernorm.weight``, ``norm.weight``,
    ``fc.weight``, and ``lm_head.weight`` (borrowed from the base when the
    draft shares it — reference _extract_state_dict).
  * ``config.json`` from the llama-eagle template with an ``eagle_config``
    sub-dict (aux-hidden-state taps <-> our EAGLE-3 ``feature_layers``).

Architecture note (documented divergence): the reference's EAGLE-3 layer
attends over the 2H-wide [emb; hidden] concat directly; our EagleHead
first projects the concat to H (``fc``) and runs H-wide blocks. For
EAGLE-3 bundles the aux-feature fuse projection exports as ``fc.weight``
(the reference's aux fuse) and the concat projection exports under the
extension key ``embed_fc.weight``.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..core.bundle import ModelBundle

LLAMA_EAGLE_TEMPLATE = {
    "architectures": ["LlamaForCausalLMEagle3"],
    "model_type": "llama",
    "tie_word_embeddings": False,
    "use_cache": True,
    "torch_dtype": "bfloat16",
}


def _np32(x):
    return np.asarray(x, np.float32)


def _t(x):
    """Flax kernels are [in, out]; torch exports [out, in]."""
    return _np32(x).T


def _block_tensors(block_params: dict, i: int) -> dict:
    """One draft Block -> deployment-format tensors."""
    out = {}
    attn = block_params["attn"]
    for ours, theirs in (("q_proj", "q_proj"), ("k_proj", "k_proj"),
                         ("v_proj", "v_proj"), ("o_proj", "o_proj")):
        if ours in attn:
            out[f"layers.{i}.self_attn.{theirs}.weight"] = _t(attn[ours]["kernel"])
    if "qkv_proj" in attn:
        out[f"layers.{i}.self_attn.qkv_proj.weight"] = _t(attn["qkv_proj"]["kernel"])
    mlp = block_params["mlp"]
    for ours, theirs in (("gate_proj", "gate_proj"), ("up_proj", "up_proj"),
                         ("down_proj", "down_proj"), ("fc_in", "gate_proj"),
                         ("fc_out", "down_proj")):
        if ours in mlp:
            out[f"layers.{i}.mlp.{theirs}.weight"] = _t(mlp[ours]["kernel"])
    out[f"layers.{i}.input_layernorm.weight"] = _np32(
        block_params["input_norm"]["scale"])
    out[f"layers.{i}.post_attention_layernorm.weight"] = _np32(
        block_params["post_attn_norm"]["scale"])
    return out


def export_spec_checkpoint(bundle: ModelBundle, export_dir: str) -> dict:
    """Write the draft module of an EAGLE or Medusa bundle to
    ``export_dir`` in the reference's deployment schema. Returns the
    exported state dict (numpy)."""
    from ..speculative.eagle import EagleModel
    from ..speculative.medusa import MedusaModel

    os.makedirs(export_dir, exist_ok=True)
    module = bundle.module
    params = bundle.variables["params"]
    cfg = module.cfg

    state: dict = {}
    if isinstance(module, EagleModel):
        eagle = params["eagle"]
        n_layers = module.eagle_cfg.num_draft_layers
        for i in range(n_layers):
            state.update(_block_tensors(eagle[f"layers_{i}"], i))
        state["norm.weight"] = _np32(eagle["norm"]["scale"])
        taps = module.eagle_cfg.feature_layers
        if taps is not None:
            # EAGLE-3: the aux-feature fuse is the reference's "fc";
            # our concat projection goes under the extension key
            state["fc.weight"] = _t(params["fuse"]["kernel"])
            state["embed_fc.weight"] = _t(eagle["fc"]["kernel"])
        else:
            state["fc.weight"] = _t(eagle["fc"]["kernel"])
        # draft shares the base LM head (reference: "Use base model's
        # lm head if draft model doesn't have one")
        base = params["base"]
        if "lm_head" in base:
            state["lm_head.weight"] = _t(base["lm_head"]["kernel"])
        else:
            state["lm_head.weight"] = _np32(base["embed_tokens"]["embedding"])
        config = dict(
            LLAMA_EAGLE_TEMPLATE,
            hidden_size=cfg.hidden_size,
            intermediate_size=cfg.intermediate_size,
            num_attention_heads=cfg.num_heads,
            num_key_value_heads=cfg.kv_heads,
            num_hidden_layers=n_layers,
            head_dim=cfg.dims_per_head,
            rms_norm_eps=cfg.norm_eps,
            rope_theta=cfg.rope_theta,
            vocab_size=cfg.vocab_size,
            max_position_embeddings=cfg.max_position_embeddings,
            eagle_config={
                "eagle_aux_hidden_state_layer_ids":
                    list(taps) if taps is not None else None,
                "use_aux_hidden_state": taps is not None,
                "use_input_layernorm_in_first_layer": True,
                "use_last_layernorm": True,
                "use_mtp_layernorm": False,
                "next_layer_regular": True,
                "parallel_draft_step": None,
                "parallel_draft_heads_num_layers": None,
            },
        )
    elif isinstance(module, MedusaModel):
        # reference EagleMedusaExporter: heads export as
        # medusa_heads.{h}.{j}.linear.weight + lm_head per head
        n_heads = module.medusa_cfg.medusa_num_heads
        n_layers = module.medusa_cfg.medusa_num_layers
        for h in range(n_heads):
            for j in range(n_layers):
                state[f"medusa_heads.{h}.{j}.linear.weight"] = _t(
                    params[f"head_{h}_block_{j}"]["fc"]["kernel"])
            state[f"medusa_heads.{h}.lm_head.weight"] = _t(
                params[f"head_{h}_out"]["kernel"])
        config = dict(
            LLAMA_EAGLE_TEMPLATE,
            architectures=["LlamaForCausalLMMedusa"],
            hidden_size=cfg.hidden_size,
            vocab_size=cfg.vocab_size,
            medusa={"num_medusa_heads": n_heads,
                    "num_medusa_layers": module.medusa_cfg.medusa_num_layers},
        )
    else:
        from ..speculative.dflash import DFlashModel, build_target_layer_ids

        if not isinstance(module, DFlashModel):
            raise ValueError(
                "export_spec_checkpoint needs an eagle/medusa/dflash bundle"
            )
        # DFlash schema (reference: hf_dflash.py checkpoints, SpecForge
        # dflash format): fused fc + hidden_norm + draft layers with shared
        # k/v projections, mask embedding, final norm
        dcfg = module.dflash_cfg
        state["fc.weight"] = _t(params["fc"]["kernel"])
        state["hidden_norm.weight"] = _np32(params["hidden_norm"]["scale"])
        state["mask_embedding"] = _np32(params["mask_embedding"])
        for i in range(dcfg.num_draft_layers):
            L = params[f"draft_{i}"]
            pre = f"layers.{i}."
            state[pre + "input_layernorm.weight"] = _np32(L["input_norm"]["scale"])
            state[pre + "post_attention_layernorm.weight"] = _np32(
                L["post_attn_norm"]["scale"])
            for name, ours in (("q_proj", "q_proj"), ("k_proj", "k_proj"),
                               ("v_proj", "v_proj"), ("o_proj", "o_proj")):
                state[pre + f"self_attn.{name}.weight"] = _t(L[ours]["kernel"])
            state[pre + "self_attn.q_norm.weight"] = _np32(L["q_norm"]["scale"])
            state[pre + "self_attn.k_norm.weight"] = _np32(L["k_norm"]["scale"])
            for name in ("gate_proj", "up_proj", "down_proj"):
                state[pre + f"mlp.{name}.weight"] = _t(L["mlp"][name]["kernel"])
        state["norm.weight"] = _np32(params["norm"]["scale"])
        base = params["base"]
        if "lm_head" in base:
            state["lm_head.weight"] = _t(base["lm_head"]["kernel"])
        else:
            state["lm_head.weight"] = _np32(base["embed_tokens"]["embedding"])
        config = dict(
            LLAMA_EAGLE_TEMPLATE,
            architectures=["DFlashDraftModel"],
            hidden_size=cfg.hidden_size,
            intermediate_size=cfg.intermediate_size,
            num_attention_heads=cfg.num_heads,
            num_key_value_heads=cfg.kv_heads,
            num_hidden_layers=dcfg.num_draft_layers,
            head_dim=cfg.dims_per_head,
            rms_norm_eps=cfg.norm_eps,
            rope_theta=cfg.rope_theta,
            vocab_size=cfg.vocab_size,
            dflash_config={
                "block_size": dcfg.block_size,
                # setup()-computed taps aren't visible on an unbound module
                "target_layer_ids": list(
                    dcfg.feature_layers
                    or build_target_layer_ids(cfg.num_layers,
                                              min(3, cfg.num_layers))
                ),
            },
        )

    try:
        from safetensors.numpy import save_file

        save_file({k: np.ascontiguousarray(v) for k, v in state.items()},
                  os.path.join(export_dir, "model.safetensors"))
    except ImportError:  # environment without safetensors: npz fallback
        np.savez(os.path.join(export_dir, "model.npz"), **state)
    with open(os.path.join(export_dir, "config.json"), "w") as f:
        json.dump(config, f, indent=2)
    return state
