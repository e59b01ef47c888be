"""Unified HF checkpoint export for quantized models.

Produces a directory with sharded-safetensors-compatible output
(model.safetensors + hf_quant_config.json + config.json) following the
reference's export conventions so TRT-LLM/vLLM/SGLang-style loaders can
consume it (reference: modelopt/torch/export/unified_export_hf.py:1527
export_hf_checkpoint, quant_utils.py:834 to_quantized_weight, :1050
postprocess_state_dict naming, :1447 get_quant_config).

Conventions reproduced:
  * torch layout: exported weights are [out, in] (our kernels transposed);
  * INT4: two's-complement nibbles packed over OUTPUT-channel pairs ->
    uint8 [out/2, in] (reference quant_utils.py:790 pack_int4_in_uint8);
    per-group scales named ``<module>.weight_scale`` [out, in/group];
  * FP8: e4m3 weights + scalar ``weight_scale``; activation scale
    ``input_scale`` = act_amax/maxbound of the resolved activation format
    (448 fp8, 127 int8, 6*448 nvfp4 — reference get_scaling_factor,
    quant_utils.py:223); KV scales ``k_scale``/``v_scale`` = amax/maxbound,
    clamped to >= 1.0 for FP8 KV (quant_utils.py:371);
  * NVFP4: packed e2m1 + e4m3 ``weight_scale`` and fp32 ``weight_scale_2``;
  * ``hf_quant_config.json``: {"quantization": {"quant_algo", "group_size",
    "kv_cache_quant_algo", "exclude_modules"}}.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core.bundle import ModelBundle
from ..core.tree import flatten_with_paths, get_in
from ..quant.algorithms.capture import active_config
from ..quant.qspec import QuantizerSpec

# our decoder param path -> HF name (reverse of hf_import); family
# variations (gemma sandwich norms, qk-norm, MLA, biases) resolved in
# _layer_map(mcfg)
_LLAMA_MAP = {
    "embed_tokens/embedding": "model.embed_tokens.weight",
    "final_norm/scale": "model.norm.weight",
    "lm_head/kernel": "lm_head.weight",
}
_LAYER_MAP = {
    "input_norm/scale": "input_layernorm.weight",
    "post_attn_norm/scale": "post_attention_layernorm.weight",
    "attn/q_proj/kernel": "self_attn.q_proj.weight",
    "attn/k_proj/kernel": "self_attn.k_proj.weight",
    "attn/v_proj/kernel": "self_attn.v_proj.weight",
    "attn/o_proj/kernel": "self_attn.o_proj.weight",
    "attn/q_proj/bias": "self_attn.q_proj.bias",
    "attn/k_proj/bias": "self_attn.k_proj.bias",
    "attn/v_proj/bias": "self_attn.v_proj.bias",
    "attn/o_proj/bias": "self_attn.o_proj.bias",
    "mlp/gate_proj/kernel": "mlp.gate_proj.weight",
    "mlp/up_proj/kernel": "mlp.up_proj.weight",
    "mlp/down_proj/kernel": "mlp.down_proj.weight",
}


def _layer_map(mcfg) -> dict:
    m = dict(_LAYER_MAP)
    if getattr(mcfg, "fused_qkv", False):
        # phi3/4-style fused projections (hf_import reads the same names)
        m["attn/qkv_proj/kernel"] = "self_attn.qkv_proj.weight"
    if getattr(mcfg, "fused_gate_up", False):
        m["mlp/gate_up_proj/kernel"] = "mlp.gate_up_proj.weight"
    if getattr(mcfg, "qk_norm", False):
        m["attn/q_norm/scale"] = "self_attn.q_norm.weight"
        m["attn/k_norm/scale"] = "self_attn.k_norm.weight"
    if getattr(mcfg, "norm_style", "plain") == "gemma":
        m["post_attn_out_norm/scale"] = "post_attention_layernorm.weight"
        m["post_attn_norm/scale"] = "pre_feedforward_layernorm.weight"
        m["post_mlp_out_norm/scale"] = "post_feedforward_layernorm.weight"
    if getattr(mcfg, "attention_type", "mha") == "mla":
        m.update({
            "attn/q_a_proj/kernel": "self_attn.q_a_proj.weight",
            "attn/q_a_norm/scale": "self_attn.q_a_layernorm.weight",
            "attn/q_b_proj/kernel": "self_attn.q_b_proj.weight",
            "attn/kv_a_proj/kernel": "self_attn.kv_a_proj_with_mqa.weight",
            "attn/kv_a_norm/scale": "self_attn.kv_a_layernorm.weight",
            "attn/kv_b_proj/kernel": "self_attn.kv_b_proj.weight",
        })
    if getattr(mcfg, "attention_sinks", False):
        m["attn/sinks"] = "self_attn.sinks"
    if getattr(mcfg, "norm", "rmsnorm") == "layernorm1p":
        m["input_norm/bias"] = "input_layernorm.bias"
        m["post_attn_norm/bias"] = "post_attention_layernorm.bias"
    if getattr(mcfg, "router_score", "") == "llama4":
        # llama4 dense interleave layers live under feed_forward.*
        for proj in ("gate_proj", "up_proj", "down_proj"):
            m[f"mlp/{proj}/kernel"] = f"feed_forward.{proj}.weight"
    return m


def _moe_names(model_type: str):
    """(router_name, expert_fmt, shared_fmt) for the family's MoE naming."""
    if model_type == "mixtral":
        return ("block_sparse_moe.gate.weight",
                "block_sparse_moe.experts.{e}.{w1}.weight", None)
    if model_type == "gpt_oss":
        return ("mlp.router.weight", None, None)
    if model_type.startswith("llama4"):
        return ("feed_forward.router.weight", None,
                "feed_forward.shared_expert.{name}.weight")
    return ("mlp.gate.weight", "mlp.experts.{e}.{name}.weight",
            "mlp.shared_experts.{name}.weight")


_LLAMA_MAP_1P = {**_LLAMA_MAP, "final_norm/bias": "model.norm.bias"}


def _hf_name(path: str, layer_map=None, top_map=None):
    top_map = top_map or _LLAMA_MAP
    layer_map = layer_map if layer_map is not None else _LAYER_MAP
    if path in top_map:
        return top_map[path]
    parts = path.split("/", 1)
    if parts[0].startswith("layers_"):
        i = parts[0].split("_")[1]
        rest = layer_map.get(parts[1])
        if rest:
            return f"model.layers.{i}.{rest}"
    return None


def _np32(x):
    return np.asarray(jax.device_get(x), dtype=np.float32)


def _pack_int4_torch_layout(q: np.ndarray) -> np.ndarray:
    """q int [out, in] in [-8,7] -> uint8 [out/2, in]: two's-complement
    nibbles over output-channel pairs (reference: quant_utils.py:790
    pack_int4_in_uint8 — val0 = out 2j, val1 = out 2j+1)."""
    q = q.astype(np.int8)
    return ((q[0::2] & 0xF) | ((q[1::2] & 0xF) << 4)).astype(np.uint8)


def _export_weight(w_hf: np.ndarray, spec: QuantizerSpec, name: str, amax=None):
    """Return {tensor_name: array} for one quantized weight in torch layout.
    w_hf: [out, in] fp32."""
    out = {}
    base = name.rsplit(".weight", 1)[0]
    if not spec.is_fp and spec.num_bits == 4 and spec.block is not None:
        from .. import csrc

        bs = dict(spec.block.sizes)
        group = bs.get(-2, bs.get(0, 128))  # in-dim blocks: -2 (legacy 0)
        O, I = w_hf.shape
        group = min(group, I)  # tiny dims: one group spans the whole input
        packed, s = csrc.round_and_pack_int4(w_hf, group)
        out[name] = packed
        out[base + ".weight_scale"] = s
    elif not spec.is_fp and spec.num_bits == 8:
        from .. import csrc

        q, s = csrc.quantize_int8_rows(w_hf)
        out[name] = q
        out[base + ".weight_scale"] = s
    elif spec.is_fp and (spec.fp_format.exp_bits, spec.fp_format.man_bits) == (4, 3):
        s = np.float32(max(float(amax) if amax is not None
                           else np.abs(w_hf).max(), 1e-12) / 448.0)
        codes = jnp.clip(jnp.asarray(w_hf / s), -448, 448).astype(jnp.float8_e4m3fn)
        out[name] = np.asarray(jax.device_get(codes))
        out[base + ".weight_scale"] = np.asarray([s], np.float32)
    elif spec.is_fp and (spec.fp_format.exp_bits, spec.fp_format.man_bits) == (2, 1):
        from ..quant.qtensor import _encode_e2m1

        bs = dict(spec.block.sizes)
        group = bs.get(-2, bs.get(0, 16))
        O, I = w_hf.shape
        group = min(group, I)
        wb = w_hf.reshape(O, I // group, group)
        bamax = np.maximum(np.abs(wb).max(-1, keepdims=True), 1e-12)
        # the CALIBRATED per-tensor amax (when given) defines scale_2 so the
        # exported codes match the fake-quant model exactly; per-expert
        # slices of a stacked einsum in particular must share the stacked
        # quantizer's scalar amax or every expert gets a different scale_2
        s2 = np.float32(max(float(amax) if amax is not None
                            else np.abs(w_hf).max(), 1e-12) / (6.0 * 448.0))
        s1 = np.asarray(
            jax.device_get(jnp.asarray(bamax[..., 0] / 6.0 / s2).astype(jnp.float8_e4m3fn))
        )
        eff = s1.astype(np.float32)[..., None] * s2
        codes = np.asarray(jax.device_get(_encode_e2m1(jnp.asarray(
            np.clip(wb / np.maximum(eff, 1e-20), -6, 6)
        )))).reshape(O, I)
        out[name] = (codes[:, 0::2] | (codes[:, 1::2] << 4)).astype(np.uint8)
        out[base + ".weight_scale"] = s1
        out[base + ".weight_scale_2"] = np.asarray([s2], np.float32)
    else:
        out[name] = w_hf.astype(np.float16)
    return out


def _act_divisor(spec: QuantizerSpec) -> float:
    """amax -> input_scale divisor per format (reference get_scaling_factor:
    amax/maxbound; NVFP4 activations use amax/(6*448),
    NVFP4QTensor.get_activation_scaling_factor)."""
    if spec.is_fp and (spec.fp_format.exp_bits, spec.fp_format.man_bits) == (2, 1):
        return 6.0 * 448.0
    return float(spec.maxval)


def _kv_algo(spec: QuantizerSpec) -> str:
    """KV spec -> kv_cache_quant_algo string (reference quant_utils.py:437
    _compute_kv_cache_dtype)."""
    if spec.is_fp:
        em = (spec.fp_format.exp_bits, spec.fp_format.man_bits)
        if em == (4, 3):
            return "FP8"
        if em == (2, 1):
            return "NVFP4_AFFINE" if spec.bias_mode else "NVFP4"
    elif spec.num_bits == 8:
        return "INT8"
    return "NONE"


def _quant_algo(cfg) -> dict:
    """Map the active config to the reference's hf_quant_config fields."""
    specs = cfg.resolve("layers_0/mlp/down_proj/weight_quantizer") or cfg.resolve(
        "layers_0/attn/q_proj/weight_quantizer"
    )
    aspec = cfg.resolve("layers_0/mlp/down_proj/input_quantizer")
    kv = cfg.resolve("layers_0/attn/k_quantizer")
    algo = "NONE"
    group = None
    if specs:
        s = specs[0]
        if s.is_fp and (s.fp_format.exp_bits, s.fp_format.man_bits) == (4, 3):
            algo = "FP8"
        elif s.is_fp and (s.fp_format.exp_bits, s.fp_format.man_bits) == (2, 1):
            algo = "NVFP4"
            group = (dict(s.block.sizes).get(-2, dict(s.block.sizes).get(0, 16))
                     if s.block else 16)
        elif s.num_bits == 4:
            algo = "W4A8_AWQ" if (aspec and aspec[0].enable) else "W4A16_AWQ"
            group = (dict(s.block.sizes).get(-2, dict(s.block.sizes).get(0, 128))
                     if s.block else 128)
        elif s.num_bits == 8:
            algo = "W8A8_SQ_PER_CHANNEL" if (aspec and aspec[0].enable) else "INT8_WO"
    kv_algo = _kv_algo(kv[0]) if (kv and kv[0].enable) else None
    q = {"quant_algo": algo,
         "kv_cache_quant_algo": kv_algo if kv_algo != "NONE" else None}
    if group:
        q["group_size"] = group
    q["exclude_modules"] = ["lm_head"]
    return {"quantization": q}


def _iter_export_tensors(bundle: ModelBundle, cfg):
    """Yield (tensor_name, np.ndarray) one HF-named tensor group at a time —
    each parameter is fetched from device and converted individually, so the
    peak host residency of an export is one layer's tensors regardless of
    model size (the streaming concern of the reference's
    unified_export_hf_streaming.py:445)."""
    quant_vars = bundle.variables.get("quant", {})
    mcfg = bundle.module.cfg
    layer_map = _layer_map(mcfg)
    model_type = (bundle.metadata.get("model_type")
                  or _decoder_config_json(mcfg)["model_type"])
    _w123 = {"gate_proj": "w1", "up_proj": "w3", "down_proj": "w2"}
    get_param = lambda p: get_in(  # noqa: E731
        bundle.variables.get("params", {}), tuple(p.split("/")))

    def _quantized_2d(dense: str, w_hf: np.ndarray, name: str) -> dict:
        """One 2-D kernel in torch [out, in] layout -> {tensor_name: array}:
        packed weight per the active spec + input_scale / pre_quant_scale
        siblings, or plain fp16 when the weight quantizer is off."""
        specs = cfg.resolve(dense + "/weight_quantizer")
        if not (specs and specs[0].enable):
            return {name: w_hf.astype(np.float16)}
        wamax = get_in(quant_vars, tuple(dense.split("/"))
                       + ("weight_quantizer", "amax"))
        tensors = _export_weight(
            w_hf, specs[0], name,
            amax=(float(np.asarray(wamax).reshape(-1)[0])
                  if wamax is not None
                  and np.asarray(wamax).size == 1 else None),
        )
        base = name.rsplit(".weight", 1)[0]
        # input scale from calibrated activation amax if present; divisor
        # is the resolved activation format's maxbound
        a = get_in(quant_vars, tuple(dense.split("/"))
                   + ("input_quantizer", "amax"))
        aspecs = cfg.resolve(dense + "/input_quantizer")
        if a is not None and aspecs and aspecs[0].enable:
            tensors[base + ".input_scale"] = (
                _np32(a).reshape(-1)[:1] / _act_divisor(aspecs[0])
            )
        # AWQ/SmoothQuant activation smoothing: the weights above carry the
        # folded inverse, so the checkpoint MUST ship the activation-side
        # scale or loaded models compute unscaled (reference:
        # quant_utils.py:1157 _pre_quant_scale -> <module>.pre_quant_scale)
        pqs = get_in(quant_vars, tuple(dense.split("/"))
                     + ("input_quantizer", "pre_quant_scale"))
        if pqs is not None:
            tensors[base + ".pre_quant_scale"] = (
                _np32(pqs).reshape(-1).astype(np.float16)
            )
        return tensors

    for path, leaf in flatten_with_paths(bundle.variables.get("params", {})):
        parts = path.split("/")
        if len(parts) >= 3 and parts[1] == "moe":
            i = parts[0].split("_")[1]
            fused = model_type in ("gpt_oss", "llama4", "llama4_text")
            prefix = ("feed_forward" if model_type.startswith("llama4")
                      else "mlp")
            router_name, expert_fmt, shared_fmt = _moe_names(model_type)
            if parts[2] == "router":
                if parts[-1] == "kernel":
                    yield f"model.layers.{i}.{router_name}", _np32(leaf).T.astype(np.float16)
                elif parts[-1] == "bias":
                    yield (f"model.layers.{i}."
                           + router_name.rsplit(".weight", 1)[0] + ".bias",
                           _np32(leaf).astype(np.float16))
                continue
            if parts[2] == "e_score_correction_bias":
                yield (f"model.layers.{i}.mlp.gate.e_score_correction_bias",
                       _np32(leaf))
                continue
            if parts[2] == "shared_experts" and shared_fmt:
                name = f"model.layers.{i}." + shared_fmt.format(name=parts[3])
                if parts[-1] == "bias":
                    yield (name.rsplit(".weight", 1)[0] + ".bias",
                           _np32(leaf).astype(np.float16))
                    continue
                if parts[-1] != "kernel":
                    raise ValueError(
                        f"unexportable shared_experts leaf {path!r}: only "
                        "kernel/bias are mapped")
                # shared experts are plain QuantDense modules: export packed
                # like any 2-D kernel (the reference quantizes them too)
                yield from _quantized_2d(path.rsplit("/kernel", 1)[0],
                                         _np32(leaf).T, name).items()
                continue
            if fused:
                # HF-canonical FUSED stacked expert tensors ([E, in, out]
                # input-major, no transpose): gate_up re-fused (gpt-oss
                # interleaved columns, llama4 chunked halves) + biases.
                # Emitted once, keyed off the gate_proj leaf; quantization
                # metadata doesn't apply to fused-format checkpoints, so
                # experts export in fp16.
                if parts[2] == "up_proj":
                    continue  # folded into the gate_proj emission
                base = f"model.layers.{i}.{prefix}.experts"
                if parts[2] == "gate_proj":
                    gate = _np32(get_param(f"{parts[0]}/moe/gate_proj/kernel"))
                    up = _np32(get_param(f"{parts[0]}/moe/up_proj/kernel"))
                    E_, fin, fout = gate.shape
                    gu = np.empty((E_, fin, 2 * fout), np.float32)
                    if model_type == "gpt_oss":
                        gu[..., 0::2], gu[..., 1::2] = gate, up
                    else:  # llama4: chunked halves
                        gu[..., :fout], gu[..., fout:] = gate, up
                    if parts[-1] == "kernel":
                        yield f"{base}.gate_up_proj", gu.astype(np.float16)
                    else:  # bias [E, I] pairs -> [E, 2I]
                        gb = _np32(get_param(f"{parts[0]}/moe/gate_proj/bias"))
                        ub = _np32(get_param(f"{parts[0]}/moe/up_proj/bias"))
                        gub = np.empty((gb.shape[0], 2 * gb.shape[1]),
                                       np.float32)
                        gub[:, 0::2], gub[:, 1::2] = gb, ub
                        yield (f"{base}.gate_up_proj_bias",
                               gub.astype(np.float16))
                    continue
                if parts[2] == "down_proj":
                    if parts[-1] == "kernel":
                        yield (f"{base}.down_proj",
                               _np32(leaf).astype(np.float16))
                    else:
                        yield (f"{base}.down_proj_bias",
                               _np32(leaf).astype(np.float16))
                    continue
                continue
            if parts[-1] == "kernel" and leaf.ndim == 3:
                # per-expert HF tensors (mixtral / qwen3-moe / deepseek)
                proj = parts[2]
                dense3 = path.rsplit("/kernel", 1)[0]
                specs = cfg.resolve(dense3 + "/weight_quantizer")
                pqs3 = get_in(quant_vars, tuple(dense3.split("/"))
                              + ("input_quantizer", "pre_quant_scale"))
                a3 = get_in(quant_vars, tuple(dense3.split("/"))
                            + ("input_quantizer", "amax"))
                aspecs3 = cfg.resolve(dense3 + "/input_quantizer")
                wamax3 = get_in(quant_vars, tuple(dense3.split("/"))
                                + ("weight_quantizer", "amax"))
                if wamax3 is not None and np.asarray(wamax3).size != 1:
                    wamax3 = None  # per-expert amax: per-slice scales apply
                arr = _np32(leaf)  # [E, in, out]
                for e in range(arr.shape[0]):
                    name = f"model.layers.{i}." + expert_fmt.format(
                        e=e, name=proj, w1=_w123.get(proj, proj))
                    w_hf = arr[e].T  # [out, in]
                    if specs and specs[0].enable:
                        yield from _export_weight(
                            w_hf, specs[0], name,
                            amax=(None if wamax3 is None
                                  else float(np.asarray(wamax3).reshape(-1)[0])),
                        ).items()
                        if a3 is not None and aspecs3 and aspecs3[0].enable:
                            # one input_scale per expert (the stacked einsum
                            # shares a single input quantizer; the reference
                            # exports the same shared activation scale per
                            # expert, quant_utils.py get_activation_scaling)
                            yield (name.rsplit(".weight", 1)[0]
                                   + ".input_scale",
                                   _np32(a3).reshape(-1)[:1]
                                   / _act_divisor(aspecs3[0]))
                        if pqs3 is not None:
                            # one shared smoothing scale per expert group
                            # (our AWQ smooths the folded expert view); the
                            # reference likewise exports the group-averaged
                            # scale per expert (quant_utils.py:159)
                            yield (name.rsplit(".weight", 1)[0]
                                   + ".pre_quant_scale",
                                   _np32(pqs3).reshape(-1).astype(np.float16))
                    else:
                        yield name, w_hf.astype(np.float16)
                continue
            continue
        top_map = (_LLAMA_MAP_1P if mcfg.norm == "layernorm1p"
                   else _LLAMA_MAP)
        name = _hf_name(path, layer_map, top_map)
        if name is None:
            continue
        if path.endswith("/kernel") and leaf.ndim == 2:
            w_hf = _np32(leaf).T  # [out, in]
            if (mcfg.attention_type == "mla"
                    and parts[-2] in ("q_proj", "q_b_proj", "kv_a_proj")):
                # write HF-canonical INTERLEAVED rope rows (inverse of the
                # import-time de-interleave — see _deepseek_params)
                dr = mcfg.qk_rope_head_dim
                perm = np.concatenate(
                    [np.arange(0, dr, 2), np.arange(1, dr, 2)])
                iperm = np.argsort(perm)
                if parts[-2] == "kv_a_proj":
                    r = mcfg.kv_lora_rank
                    w_hf = np.concatenate(
                        [w_hf[:r], w_hf[r:][iperm]], 0)
                else:
                    dn = mcfg.qk_nope_head_dim
                    H = mcfg.num_heads
                    w3 = w_hf.reshape(H, dn + dr, -1)
                    w3 = np.concatenate(
                        [w3[:, :dn], w3[:, dn:][:, iperm]], 1)
                    w_hf = w3.reshape(H * (dn + dr), -1)
            elif (mcfg.router_score == "llama4"
                    and parts[-2] in ("q_proj", "k_proj")):
                # llama4 interleaved complex rope: write HF-canonical
                # interleaved rows (inverse of hf_import._llama4_params
                # deinterleave), per head
                D = mcfg.dims_per_head
                perm = np.concatenate(
                    [np.arange(0, D, 2), np.arange(1, D, 2)])
                iperm = np.argsort(perm)
                nh = w_hf.shape[0] // D
                w_hf = w_hf.reshape(nh, D, -1)[:, iperm].reshape(
                    nh * D, -1)
            dense = path.rsplit("/kernel", 1)[0]
            yield from _quantized_2d(dense, w_hf, name).items()
        else:
            yield name, _np32(leaf).astype(np.float16)

    # KV cache scales (reference: k_scale / v_scale entries; FP8 KV scale is
    # clamped to >= 1.0, quant_utils.py get_kv_cache_scaling_factor)
    for i in range(bundle.module.cfg.num_layers):
        for kv in ("k", "v"):
            a = get_in(quant_vars, (f"layers_{i}", "attn", f"{kv}_quantizer", "amax"))
            kspecs = cfg.resolve(f"layers_{i}/attn/{kv}_quantizer")
            if a is not None and kspecs and kspecs[0].enable:
                s = _np32(a).reshape(1) / _act_divisor(kspecs[0])
                if _kv_algo(kspecs[0]) == "FP8":
                    s = np.maximum(s, np.float32(1.0))
                yield f"model.layers.{i}.self_attn.{kv}_scale", s


def export_hf_checkpoint(bundle: ModelBundle, export_dir: str,
                         max_shard_bytes: int | None = None) -> dict:
    """Export quantized weights + configs.

    max_shard_bytes=None writes one model.safetensors and returns the state
    dict. With a byte budget, shards stream to
    ``model-XXXXX-of-YYYYY.safetensors`` + ``model.safetensors.index.json``
    (HF sharding convention) with at most ~one shard resident on the host —
    returns the index dict (reference: unified_export_hf_streaming.py:445;
    loaders read it back through models/hf_import.py LazyStateDict)."""
    os.makedirs(export_dir, exist_ok=True)
    cfg = active_config(bundle)

    def _write_meta():
        with open(os.path.join(export_dir, "hf_quant_config.json"), "w") as f:
            json.dump(_quant_algo(cfg), f, indent=1)
        hf_cfg = bundle.metadata.get("hf_config", {})
        with open(os.path.join(export_dir, "config.json"), "w") as f:
            json.dump(hf_cfg or _decoder_config_json(bundle.module.cfg), f,
                      indent=1)

    if max_shard_bytes is None:
        # ascontiguousarray: transposed views astype(order='K') stay
        # F-contiguous and safetensors serializes the RAW buffer — without
        # this, fp16 weights land on disk transposed (caught by the
        # round-trip tests)
        state = {k: np.ascontiguousarray(a)
                 for k, a in _iter_export_tensors(bundle, cfg)}
        try:
            from safetensors.numpy import save_file

            save_file(state, os.path.join(export_dir, "model.safetensors"))
        except ImportError:
            np.savez(os.path.join(export_dir, "model.npz"), **state)
        _write_meta()
        return state

    from safetensors.numpy import save_file

    shard: dict[str, np.ndarray] = {}
    shard_bytes = 0
    shard_files: list[str] = []
    weight_map: dict[str, str] = {}
    total = 0

    def _flush():
        nonlocal shard, shard_bytes
        if not shard:
            return
        tmp = os.path.join(export_dir, f"shard-{len(shard_files):05d}.tmp")
        save_file(shard, tmp)
        shard_files.append(tmp)
        for k in shard:
            weight_map[k] = len(shard_files) - 1
        shard, shard_bytes = {}, 0

    for name, arr in _iter_export_tensors(bundle, cfg):
        arr = np.ascontiguousarray(arr)  # see note above: raw-buffer writes
        nbytes = arr.size * arr.dtype.itemsize
        if shard and shard_bytes + nbytes > max_shard_bytes:
            _flush()
        shard[name] = arr
        shard_bytes += nbytes
        total += nbytes
    _flush()

    n = len(shard_files)
    final_names = [f"model-{i + 1:05d}-of-{n:05d}.safetensors" for i in range(n)]
    for tmp, final in zip(shard_files, final_names):
        os.replace(tmp, os.path.join(export_dir, final))
    index = {
        "metadata": {"total_size": total},
        "weight_map": {k: final_names[i] for k, i in weight_map.items()},
    }
    with open(os.path.join(export_dir, "model.safetensors.index.json"), "w") as f:
        json.dump(index, f, indent=1)
    _write_meta()
    return index


def _decoder_config_json(cfg) -> dict:
    if cfg.attention_type == "mla":
        mt = "deepseek_v3" if cfg.router_score == "sigmoid" else "deepseek_v2"
    elif cfg.attention_sinks:
        mt = "gpt_oss"
    elif cfg.router_score == "llama4":
        mt = "llama4_text"
    elif cfg.norm_style == "gemma":
        # gemma2 = softcaps without per-head qk-norm
        mt = "gemma2" if (cfg.attn_logit_softcap and not cfg.qk_norm) \
            else "gemma3_text"
    elif cfg.norm == "layernorm1p":
        mt = "nemotron"
    elif cfg.fused_qkv and cfg.fused_gate_up and not cfg.num_experts:
        mt = "phi3"
    elif cfg.qk_norm:
        mt = "qwen3_moe" if cfg.num_experts else "qwen3"
    elif cfg.num_experts:
        mt = "mixtral"
    else:
        mt = "llama"
    extra = {}
    if cfg.attention_type == "mla":
        extra = {
            "q_lora_rank": cfg.q_lora_rank, "kv_lora_rank": cfg.kv_lora_rank,
            "qk_nope_head_dim": cfg.qk_nope_head_dim,
            "qk_rope_head_dim": cfg.qk_rope_head_dim,
            "v_head_dim": cfg.v_head_dim,
            "n_routed_experts": cfg.num_experts or None,
            "num_experts_per_tok": cfg.experts_per_token,
            "n_shared_experts": cfg.n_shared_experts,
            "moe_intermediate_size": cfg.moe_intermediate_size,
            "first_k_dense_replace": cfg.first_k_dense,
            "scoring_func": cfg.router_score,
            "topk_method": ("noaux_tc" if cfg.router_correction_bias
                            else ("group_limited_greedy" if cfg.n_group
                                  else "greedy")),
            "n_group": cfg.n_group, "topk_group": cfg.topk_group,
            "norm_topk_prob": cfg.norm_topk_prob,
            "routed_scaling_factor": cfg.routed_scaling_factor,
        }
    elif cfg.num_experts:
        if mt in ("mixtral", "gpt_oss"):
            extra = {"num_local_experts": cfg.num_experts,
                     "num_experts_per_tok": cfg.experts_per_token}
        else:
            extra = {"num_experts": cfg.num_experts,
                     "num_experts_per_tok": cfg.experts_per_token,
                     "norm_topk_prob": cfg.norm_topk_prob,
                     "moe_intermediate_size": cfg.moe_intermediate_size}
    if cfg.rope_scaling:
        extra["rope_scaling"] = dict(cfg.rope_scaling)
    if cfg.head_dim:
        extra["head_dim"] = cfg.head_dim
    if cfg.layer_plan is not None:
        # encode the per-layer plan in the family's HF vocabulary
        n = cfg.num_layers
        opts = [cfg.layer_opts(i) for i in range(n)]
        if mt == "llama4_text":
            extra.update({
                "no_rope_layers": [0 if o.get("nope") else 1 for o in opts],
                "layer_types": ["chunked_attention" if "chunk" in o
                                else "full_attention" for o in opts],
                "attention_chunk_size": next(
                    (o["chunk"] for o in opts if "chunk" in o), 8192),
                "moe_layers": [i for i, o in enumerate(opts)
                               if "ffn" not in o],
                "intermediate_size": cfg.moe_intermediate_size,
                "intermediate_size_mlp": cfg.intermediate_size,
                "num_local_experts": cfg.num_experts,
                "use_qk_norm": cfg.qk_l2norm,
                "attn_temperature_tuning": cfg.attn_temperature_tuning,
                "floor_scale": cfg.floor_scale,
                "attn_scale": cfg.attn_scale,
            })
            extra.pop("num_experts", None)
            extra.pop("moe_intermediate_size", None)
        else:
            extra["layer_types"] = [
                "sliding_attention" if "window" in o else "full_attention"
                for o in opts
            ]
            w = next((o["window"] for o in opts if "window" in o), None)
            if w is not None:
                extra["sliding_window"] = w
    if cfg.norm_style == "gemma":
        extra.update({
            "query_pre_attn_scalar": cfg.query_pre_attn_scalar,
            "rope_local_base_freq": cfg.rope_local_base_freq,
            "attn_logit_softcapping": cfg.attn_logit_softcap,
            "final_logit_softcapping": cfg.final_logit_softcap,
        })
    if cfg.norm == "layernorm1p":
        extra["partial_rotary_factor"] = cfg.partial_rotary_factor
        extra["mlp_bias"] = cfg.mlp_bias
    if cfg.attention_sinks:
        extra["attention_bias"] = cfg.attn_bias
    return {
        "model_type": mt,
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "num_key_value_heads": cfg.kv_heads,
        "intermediate_size": cfg.intermediate_size,
        "rope_theta": cfg.rope_theta,
        "max_position_embeddings": cfg.max_position_embeddings,
        "rms_norm_eps": cfg.norm_eps,
        "tie_word_embeddings": cfg.tie_word_embeddings,
        # family-specific keys LAST: llama4 redefines intermediate_size as
        # the MoE width (intermediate_size_mlp is the dense width)
        **extra,
    }
