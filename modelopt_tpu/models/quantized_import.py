"""Pre-quantized HF checkpoint import — the reference's *model_hub*
workload (reference: examples/model_hub — deploying pre-quantized HF-hub
checkpoints into an inference engine). Loads a directory produced by
``export/hf_export.py`` (or any exporter following the reference's unified
HF export conventions: packed ``.weight`` + ``.weight_scale`` [+
``.weight_scale_2``] tensors, ``input_scale``/``k_scale``/``v_scale``
entries, ``hf_quant_config.json``) straight into a servable compressed
``ModelBundle`` — packed weights are re-laid-out BIT-EXACTLY into the
Pallas-friendly qtensor format (no dequantize->requantize round trip), so
the served model computes with precisely the codes on disk.

Layout translation (see export/hf_export.py for the torch-side layout and
quant/qtensor.py for ours):
  * INT4: torch packs two's-complement nibbles over OUTPUT-channel pairs
    (uint8 [out/2, in]); ours packs split-half hybrid nibbles over the
    INPUT dim (uint8 [in/2, out]) — unpack, transpose, repack.
  * NVFP4: torch packs e2m1 codes over INPUT pairs (uint8 [out, in/2]) with
    e4m3 block scales [out, in/group] + fp32 scale_2; ours is split-half
    over the input dim with transposed scales.
  * INT8: per-output-row scales -> per-column scales of the transposed
    kernel. FP8: transposed e4m3 codes + the same scalar scale.
  * MoE expert stacks (mixtral / qwen3-moe / deepseek naming): per-expert
    packed tensors concatenate along the output dim into the FOLDED
    [in, E*out] layout of quant/compress.py.

Activation/KV scales import as quantizer amax (amax = scale * maxbound,
the inverse of export's ``_act_divisor``).
"""

from __future__ import annotations

import json
import os
import warnings
from collections.abc import Mapping

import jax.numpy as jnp
import numpy as np

from ..core.bundle import ModelBundle, ModeRecord
from ..core.tree import set_in
from ..quant.config import get_config

__all__ = ["load_quantized_checkpoint"]


# --------------------------------------------------------------------------
# torch-layout unpackers (inverse of export/hf_export.py packers)
# --------------------------------------------------------------------------
def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    try:  # torch tensor
        import torch

        if isinstance(t, torch.Tensor):
            if t.dtype == torch.float8_e4m3fn:
                return t.view(torch.uint8).numpy()
            return t.numpy()
    except ImportError:
        pass
    return np.asarray(t)


def _unpack_int4_torch(packed: np.ndarray) -> np.ndarray:
    """uint8 [out/2, in] two's-complement nibbles over output pairs ->
    int32 [out, in] in [-8, 7] (inverse of _pack_int4_torch_layout)."""
    p = packed.astype(np.int32)
    lo = ((p & 0xF) ^ 8) - 8
    hi = ((p >> 4) ^ 8) - 8
    q = np.empty((2 * p.shape[0], p.shape[1]), np.int32)
    q[0::2], q[1::2] = lo, hi
    return q


def _unpack_e2m1_torch(packed: np.ndarray) -> np.ndarray:
    """uint8 [out, in/2] e2m1 codes over INPUT pairs -> uint8 [out, in]."""
    c = np.empty((packed.shape[0], 2 * packed.shape[1]), np.uint8)
    c[:, 0::2] = packed & 0xF
    c[:, 1::2] = packed >> 4
    return c


def _pack_int4_ours(q: np.ndarray) -> np.ndarray:
    """int codes [K, N] in [-8, 7] -> our split-half hybrid nibbles
    (quant/qtensor.py pack_int4: low half offset-binary, high half
    two's-complement)."""
    K = q.shape[0]
    lo = (q[: K // 2] + 8).astype(np.uint8)
    hi = (q[K // 2:] & 0xF).astype(np.uint8)
    return lo | (hi << 4)


def _pack_codes_ours(c: np.ndarray) -> np.ndarray:
    """raw 4-bit codes [K, N] -> split-half packed uint8 [K/2, N]."""
    K = c.shape[0]
    return (c[: K // 2] | (c[K // 2:] << 4)).astype(np.uint8)


def _repack_one(fmt: str, sd, base: str, out_perm: np.ndarray | None = None):
    """One torch-layout quantized weight -> our qtensor dict (numpy).

    ``out_perm`` permutes OUTPUT channels (new col j <- old col perm[j] of
    the transposed [K, N] code tensor): quantization blocks run along the
    INPUT dim, so permuting codes and per-output scale columns together is
    bit-exact. Used for MLA rope de-interleaving (see hf_import
    _deepseek_params — the exporter writes HF-canonical interleaved rows)."""
    w = _np(sd[base + ".weight"])
    s = _np(sd[base + ".weight_scale"]).astype(np.float32) \
        if base + ".weight_scale" in sd else None

    def permn(a, axis=1):
        if out_perm is None:
            return a
        return jnp.take(a, jnp.asarray(out_perm), axis=axis) \
            if not isinstance(a, np.ndarray) else np.take(a, out_perm, axis)

    if fmt == "int4":
        q = permn(_unpack_int4_torch(w).T)  # [K, N]
        return {"data": _pack_int4_ours(q),
                "scale": permn(np.ascontiguousarray(s.T))}
    if fmt == "nvfp4":
        c = permn(_unpack_e2m1_torch(w).T)  # [K, N]
        s2 = _np(sd[base + ".weight_scale_2"]).astype(np.float32).reshape(1, 1)
        # weight_scale is e4m3 on disk; safetensors reads it back as uint8
        # bits via _np — reinterpret, keep e4m3
        s1 = _np(sd[base + ".weight_scale"])
        if s1.dtype == np.uint8:
            s1 = jnp.asarray(s1).view(jnp.float8_e4m3fn)
        else:
            s1 = jnp.asarray(s1.astype(np.float32)).astype(jnp.float8_e4m3fn)
        return {"data": _pack_codes_ours(c), "scale": permn(jnp.asarray(s1).T),
                "scale2": s2}
    if fmt == "int8":
        q = permn(_np(sd[base + ".weight"]).astype(np.int8).T)  # [K, N]
        return {"data": q, "scale": permn(s.reshape(1, -1))}
    if fmt == "fp8":
        codes = _np(sd[base + ".weight"])  # uint8 bits of e4m3
        data = permn(jnp.asarray(codes).view(jnp.float8_e4m3fn).T)
        return {"data": data, "scale": s.reshape(1, 1)}
    raise ValueError(f"unsupported packed format {fmt!r}")


def _qt_jnp(qt: dict) -> dict:
    return {k: jnp.asarray(v) for k, v in qt.items()}


def _concat_experts(qts: list[dict], fmt: str) -> dict:
    """Per-expert qtensors -> the folded [K, E*N] layout (expert e occupies
    output columns e*N:(e+1)*N — quant/compress.py's fold)."""
    out = {"data": np.concatenate([_np(q["data"]) for q in qts], axis=1)}
    if fmt == "nvfp4":
        out["scale"] = jnp.concatenate([jnp.asarray(q["scale"]) for q in qts],
                                       axis=1)
        s2 = np.concatenate([_np(q["scale2"]).reshape(1) for q in qts])
        if not np.allclose(s2, s2[0]):
            raise ValueError(
                "per-expert NVFP4 scale_2 values differ — the folded expert "
                "layout shares one per-tensor scale; re-export with a shared "
                "scale_2 or load with requantize"
            )
        out["scale2"] = s2[:1].reshape(1, 1)
    else:
        out["scale"] = np.concatenate([_np(q["scale"]) for q in qts], axis=1)
    return out


# --------------------------------------------------------------------------
# quant-config reconstruction from hf_quant_config.json
# --------------------------------------------------------------------------
_KV_SPEC = {
    "FP8": {"num_bits": (4, 3), "axis": None},
    "INT8": {"num_bits": 8, "axis": None},
    "NVFP4": {"num_bits": (2, 1),
              "block_sizes": {-1: 16, "type": "dynamic",
                              "scale_format": "e4m3", "two_level": True}},
}


def _act_amax_mult(algo: str) -> float:
    """input_scale -> amax multiplier (inverse of export _act_divisor)."""
    return {"FP8": 448.0, "NVFP4": 6.0 * 448.0, "W4A8_AWQ": 127.0,
            "W8A8_SQ_PER_CHANNEL": 127.0}.get(algo, 448.0)


def _config_for(meta: dict, group_overrides: dict[str, int] | None = None) -> dict:
    q = meta.get("quantization", meta)
    algo = q.get("quant_algo", "NONE")
    group = q.get("group_size")
    kv = q.get("kv_cache_quant_algo")

    def w_blocked(g):
        if algo == "NVFP4":
            return {"num_bits": (2, 1),
                    "block_sizes": {-2: int(g), "type": "dynamic",
                                    "scale_format": "e4m3", "two_level": True}}
        return {"num_bits": 4, "block_sizes": {-2: int(g)}}

    a_int8 = {"num_bits": 8, "block_sizes": {-1: 0, "type": "dynamic"}}
    a_fp8 = {"num_bits": (4, 3), "axis": None}
    a_nvfp4 = {"num_bits": (2, 1),
               "block_sizes": {-1: 16, "type": "dynamic",
                               "scale_format": "e4m3", "two_level": True}}
    table = {
        "FP8": (a_fp8, a_fp8),
        "NVFP4": (w_blocked(group or 16), a_nvfp4),
        "W4A16_AWQ": (w_blocked(group or 128), None),
        # the reference's W4A8 deploys fp8 activations on GPU; the TPU
        # serving path is per-token dynamic int8 on the int8 MXU
        "W4A8_AWQ": (w_blocked(group or 128), a_int8),
        "INT8_WO": ({"num_bits": 8, "axis": -1}, None),
        "W8A8_SQ_PER_CHANNEL": ({"num_bits": 8, "axis": -1}, a_int8),
    }
    if algo not in table:
        raise ValueError(f"unsupported quant_algo {algo!r} in hf_quant_config")
    w, a = table[algo]
    cfg: dict = {"quant_cfg": {
        "*weight_quantizer": dict(w, enable=True),
        "*input_quantizer": (dict(a, enable=True) if a else {"enable": False}),
        "*output_quantizer": {"enable": False},
        # mirror the export-side defaults: routers/embeddings stay 16-bit
        "*router*": {"enable": False},
        "*embed*": {"enable": False},
    }, "algorithm": None}
    for mod in q.get("exclude_modules", ["lm_head"]):
        cfg["quant_cfg"][f"*{mod}*"] = {"enable": False}
    # per-module group overrides: small kernels export with
    # group = min(group_size, in_dim) (export _export_weight), so the spec
    # interpreting their packed data must carry the on-disk group
    for suffix, g in (group_overrides or {}).items():
        cfg["quant_cfg"][f"*{suffix}/weight_quantizer"] = dict(
            w_blocked(g), enable=True)
    if kv and kv in _KV_SPEC:
        cfg["quant_cfg"]["*k_quantizer"] = dict(_KV_SPEC[kv], enable=True)
        cfg["quant_cfg"]["*v_quantizer"] = dict(_KV_SPEC[kv], enable=True)
    return cfg


def _fmt_of(algo: str, sd, base: str) -> str | None:
    """Packed format of one on-disk module, from the algo + tensor dtypes."""
    if base + ".weight_scale" not in sd:
        return None
    if algo == "NVFP4":
        return "nvfp4"
    if algo in ("W4A16_AWQ", "W4A8_AWQ"):
        return "int4"
    if algo in ("INT8_WO", "W8A8_SQ_PER_CHANNEL"):
        return "int8"
    if algo == "FP8":
        return "fp8"
    return None


# --------------------------------------------------------------------------
# dequantizing view (drives the plain from_hf import for everything that is
# NOT directly repacked: norms, embeddings, excluded modules — and, for
# repack targets, cheap zero placeholders that are deleted afterwards)
# --------------------------------------------------------------------------
class _DequantView(Mapping):
    def __init__(self, sd, algo: str, repack: set[str]):
        self._sd = sd
        self._algo = algo
        self._repack = repack
        self._qbases = {k[: -len(".weight_scale")] for k in sd
                        if k.endswith(".weight_scale")}
        self._keys = [k for k in sd
                      if not (k.endswith((".weight_scale", ".weight_scale_2",
                                          ".input_scale", ".k_scale",
                                          ".v_scale", ".pre_quant_scale")))]

    def _shape(self, base: str):
        w = _np(self._sd[base + ".weight"])
        if self._algo in ("W4A16_AWQ", "W4A8_AWQ"):
            return (2 * w.shape[0], w.shape[1])
        if self._algo == "NVFP4":
            return (w.shape[0], 2 * w.shape[1])
        return w.shape

    def __getitem__(self, key):
        base = key[: -len(".weight")] if key.endswith(".weight") else None
        if base is not None and base in self._qbases:
            if base in self._repack:
                # placeholder: the packed weight replaces this kernel below
                return np.zeros(self._shape(base), np.float16)
            # dequantize in torch layout for the plain import path
            from ..quant.qspec import QuantizerSpec  # noqa: F401 (doc)
            from ..quant import qtensor as qt

            fmt = _fmt_of(self._algo, self._sd, base)
            ours = _qt_jnp(_repack_one(fmt, self._sd, base))
            group = {"int4": None, "nvfp4": None}.get(fmt)
            if fmt == "int4":
                g = _np(self._sd[base + ".weight_scale"]).shape[1]
                w = qt.dequantize_int4(ours, self._shape(base)[1] // g)
            elif fmt == "nvfp4":
                g = _np(self._sd[base + ".weight_scale"]).shape[1]
                w = qt.dequantize_nvfp4(ours, self._shape(base)[1] // g)
            elif fmt == "int8":
                w = qt.dequantize_int8(ours)
            else:
                w = qt.dequantize_fp8(ours)
            del group
            w = np.asarray(w).T  # back to torch [out, in]
            if base + ".pre_quant_scale" in self._sd:
                # no quantizer will apply the smoothing scale on this
                # fallback path — fold it back into the weight instead:
                # (x * pqs) @ W_folded == x @ (pqs * W_folded) exactly
                pqs = _np(self._sd[base + ".pre_quant_scale"]).astype(
                    np.float32).reshape(-1)
                w = w * pqs[None, :]
            return w
        return self._sd[key]

    def __iter__(self):
        return iter(self._keys)

    def __len__(self):
        return len(self._keys)

    def __contains__(self, key):
        if key in self._sd:
            return True
        base = key[: -len(".weight")] if key.endswith(".weight") else None
        return base is not None and base in self._qbases


# --------------------------------------------------------------------------
# public entry
# --------------------------------------------------------------------------
def load_quantized_checkpoint(path: str, example_len: int = 8,
                              param_dtype=None) -> ModelBundle:
    """Load a pre-quantized checkpoint directory (``config.json`` +
    ``hf_quant_config.json`` + safetensors) into a servable compressed
    bundle. Packed weights repack bit-exactly; calibration scales
    (``input_scale``/``k_scale``/``v_scale``) import as quantizer amax.

    Works for the separate-projection families (llama/mistral/qwen/gemma
    -class naming incl. mixtral/qwen3-moe/deepseek per-expert MoE tensors)
    and deepseek MLA projections (the rope de-interleave is applied as an
    output-column permutation in code space — bit-exact). Fused checkpoint
    layouts exported by hf_export (gpt-oss / llama4 stacked experts) carry
    their experts in fp16 and import through the plain loader; native
    gpt-oss OAI MXFP4 checkpoints repack bit-exactly via
    ``load_oai_mxfp4_checkpoint``. Anything quantized that matches no
    direct repack path imports dequantized with a warning naming the
    tensors (served through fake-quant)."""
    from .hf_import import LazyStateDict, from_hf

    with open(os.path.join(path, "config.json")) as f:
        hf_config = json.load(f)
    with open(os.path.join(path, "hf_quant_config.json")) as f:
        meta = json.load(f)
    q = meta.get("quantization", meta)
    algo = q.get("quant_algo", "NONE")
    dtype = param_dtype or jnp.bfloat16

    sd = LazyStateDict(path)

    # decide which on-disk modules repack directly (everything with a
    # weight_scale whose name maps onto a separate-projection kernel path)
    n_layers = int(hf_config.get("num_hidden_layers"))
    proj_names = {
        # our path suffix -> HF module base (per layer)
        "attn/q_proj": "self_attn.q_proj", "attn/k_proj": "self_attn.k_proj",
        "attn/v_proj": "self_attn.v_proj", "attn/o_proj": "self_attn.o_proj",
        "attn/qkv_proj": "self_attn.qkv_proj",  # phi-style fused
        "mlp/gate_proj": "mlp.gate_proj", "mlp/up_proj": "mlp.up_proj",
        "mlp/down_proj": "mlp.down_proj",
        "mlp/gate_up_proj": "mlp.gate_up_proj",
        # MLA (deepseek) projections + shared experts: packed repack with
        # the rope de-interleave applied as an output-column permutation
        "attn/q_a_proj": "self_attn.q_a_proj",
        "attn/q_b_proj": "self_attn.q_b_proj",
        "attn/kv_a_proj": "self_attn.kv_a_proj_with_mqa",
        "attn/kv_b_proj": "self_attn.kv_b_proj",
        "moe/shared_experts/gate_proj": "mlp.shared_experts.gate_proj",
        "moe/shared_experts/up_proj": "mlp.shared_experts.up_proj",
        "moe/shared_experts/down_proj": "mlp.shared_experts.down_proj",
    }
    if str(hf_config.get("model_type", "")).startswith("llama4"):
        # llama4 names its dense-interleave MLP and (singular) shared
        # expert under feed_forward.* (hf_import._llama4_params)
        proj_names.update({
            "mlp/gate_proj": "feed_forward.gate_proj",
            "mlp/up_proj": "feed_forward.up_proj",
            "mlp/down_proj": "feed_forward.down_proj",
            "moe/shared_experts/gate_proj":
                "feed_forward.shared_expert.gate_proj",
            "moe/shared_experts/up_proj":
                "feed_forward.shared_expert.up_proj",
            "moe/shared_experts/down_proj":
                "feed_forward.shared_expert.down_proj",
        })
    # output-channel permutations for MLA rope de-interleaving (must match
    # hf_import._deepseek_params: new col j <- old 2j, j+dr/2 <- old 2j+1,
    # per head for q, on the trailing rotary-key block for kv_a) — applied
    # in CODE space so the repack stays bit-exact
    perms: dict[str, np.ndarray] = {}
    if str(hf_config.get("model_type", "")).startswith("deepseek") \
            or "kv_lora_rank" in hf_config:
        # same defaults config_from_hf uses (hf_import.py:317-319) so the
        # importer and the model config derive identical dims even when the
        # checkpoint's config.json relies on HF defaults
        dn = int(hf_config.get("qk_nope_head_dim", 128))
        dr = int(hf_config.get("qk_rope_head_dim", 64))
        H = int(hf_config["num_attention_heads"])
        r = int(hf_config.get("kv_lora_rank", 512))
        rope_perm = np.concatenate([np.arange(0, dr, 2), np.arange(1, dr, 2)])
        head = np.concatenate([np.arange(dn), dn + rope_perm])
        qperm = (np.arange(H)[:, None] * (dn + dr) + head[None, :]).reshape(-1)
        perms["attn/q_proj"] = qperm
        perms["attn/q_b_proj"] = qperm
        perms["attn/kv_a_proj"] = np.concatenate([np.arange(r), r + rope_perm])
    if str(hf_config.get("model_type", "")).startswith("llama4"):
        # llama4 uses interleaved complex rope: the native half-split rope
        # needs new col j <- old 2j per head (hf_import._llama4_params
        # deinterleave) — applied in code space on q/k projections
        D = int(hf_config.get("head_dim", 128))
        H = int(hf_config["num_attention_heads"])
        KH = int(hf_config.get("num_key_value_heads", H))
        dperm = np.concatenate([np.arange(0, D, 2), np.arange(1, D, 2)])
        perms["attn/q_proj"] = (
            np.arange(H)[:, None] * D + dperm[None, :]).reshape(-1)
        perms["attn/k_proj"] = (
            np.arange(KH)[:, None] * D + dperm[None, :]).reshape(-1)
    moe_expert_names = [
        ("block_sparse_moe.experts.{e}.w1", "moe/gate_proj"),
        ("block_sparse_moe.experts.{e}.w3", "moe/up_proj"),
        ("block_sparse_moe.experts.{e}.w2", "moe/down_proj"),
        ("mlp.experts.{e}.gate_proj", "moe/gate_proj"),
        ("mlp.experts.{e}.up_proj", "moe/up_proj"),
        ("mlp.experts.{e}.down_proj", "moe/down_proj"),
    ]
    n_experts = int(hf_config.get("num_local_experts")
                    or hf_config.get("num_experts")
                    or hf_config.get("n_routed_experts") or 0)

    def _disk_group(base: str, fmt: str) -> int | None:
        if fmt not in ("int4", "nvfp4"):
            return None
        w = _np(sd[base + ".weight"])
        in_dim = w.shape[1] * (2 if fmt == "nvfp4" else 1)
        return in_dim // _np(sd[base + ".weight_scale"]).shape[1]

    repack: dict[str, tuple] = {}  # hf base -> (our path parts, fmt[, bases])
    repack_perm: dict[str, np.ndarray] = {}  # hf base -> output-col perm
    covered: set[str] = set()
    groups: dict[str, int] = {}  # our-path suffix -> on-disk group
    for i in range(n_layers):
        L = f"model.layers.{i}."
        for ours, hf in proj_names.items():
            fmt = _fmt_of(algo, sd, L + hf)
            if fmt:
                g = _disk_group(L + hf, fmt)
                if g is not None and groups.setdefault(ours, g) != g:
                    continue  # conflicting groups across layers: dequant path
                repack[L + hf] = ((f"layers_{i}",) + tuple(ours.split("/")),
                                  fmt)
                covered.add(L + hf)
                if ours in perms:
                    repack_perm[L + hf] = perms[ours]
        for hf_fmt, ours in moe_expert_names:
            base0 = L + hf_fmt.format(e=0)
            fmt = _fmt_of(algo, sd, base0)
            if fmt and fmt != "fp8" and n_experts:
                bases = [L + hf_fmt.format(e=e) for e in range(n_experts)]
                if all(b + ".weight_scale" in sd for b in bases):
                    g = _disk_group(base0, fmt)
                    if g is not None and groups.setdefault(ours, g) != g:
                        continue
                    if fmt == "nvfp4":
                        # the folded expert layout shares ONE per-tensor
                        # scale_2; checkpoints with per-expert scale_2 fall
                        # back to the dequant path
                        s2 = np.array([
                            _np(sd[b + ".weight_scale_2"]).reshape(())
                            for b in bases], np.float32)
                        if not np.allclose(s2, s2[0]):
                            continue
                    repack[base0] = ((f"layers_{i}",) + tuple(ours.split("/")),
                                     fmt, bases)
                    covered.update(bases)

    cfg_dict = _config_for(meta, group_overrides=groups)
    qcfg = get_config(cfg_dict)
    view = _DequantView(sd, algo, covered)

    def commit(subtree):
        import jax

        return jax.tree.map(lambda a: jnp.asarray(a, dtype=dtype), subtree)

    bundle = from_hf(view, hf_config, example_len=example_len, commit=commit)
    if param_dtype is not None:
        # an explicit dtype also drives COMPUTE dtype (config_from_hf
        # defaults to bf16) — fp32 runs make bit-exactness testable
        import dataclasses

        mod = type(bundle.module)(
            dataclasses.replace(bundle.module.cfg, dtype=param_dtype,
                                param_dtype=param_dtype))
        bundle = bundle.replace(module=mod)

    # replace placeholder kernels with bit-exact repacked qtensors
    params = bundle.variables.get("params", {})
    quant: dict = {}
    from ..core.tree import del_in

    for hf_base, entry in repack.items():
        parts, fmt = entry[0], entry[1]
        if len(entry) == 3:  # expert stack -> folded layout
            qt = _concat_experts(
                [_repack_one(fmt, sd, b) for b in entry[2]], fmt)
        else:
            qt = _repack_one(fmt, sd, hf_base,
                             out_perm=repack_perm.get(hf_base))
        params = del_in(params, parts + ("kernel",))
        quant = set_in(quant, parts + ("qweight",), _qt_jnp(qt))

    # activation / KV scales -> quantizer amax; AWQ/SmoothQuant smoothing
    # scales -> input_quantizer pre_quant_scale (the packed weights carry
    # the folded inverse — without this the loaded model computes unscaled)
    mult = _act_amax_mult(algo)
    # name -> module path for EVERY known module (incl. per-expert names
    # sharing the stacked einsum's single input quantizer): activation
    # scales must import even when the weight itself took the dequant
    # fallback — the fake-quant path needs the amax just the same
    name_map: dict[str, tuple] = {}
    for i in range(n_layers):
        L = f"model.layers.{i}."
        for ours, hf in proj_names.items():
            name_map[L + hf] = (f"layers_{i}",) + tuple(ours.split("/"))
        for hf_fmt, ours in moe_expert_names:
            for e in range(n_experts):
                name_map[L + hf_fmt.format(e=e)] = \
                    (f"layers_{i}",) + tuple(ours.split("/"))
    amax_acc: dict[tuple, float] = {}
    wamax_acc: dict[tuple, float] = {}
    for k in sd:
        if k.endswith(".input_scale"):
            parts = name_map.get(k[: -len(".input_scale")])
            if parts is not None:
                amax = float(_np(sd[k]).astype(np.float32).reshape(())) * mult
                # per-expert scales share one quantizer: keep the max
                amax_acc[parts] = max(amax, amax_acc.get(parts, 0.0))
        elif k.endswith(".weight_scale_2"):
            # NVFP4 per-tensor scale: modules on the dequant-fallback path
            # fake-quant at serve time and need the weight amax (two-level
            # scale_2 = amax / (6*448)); repacked modules carry scale2 in
            # the qtensor and ignore this
            base = k[: -len(".weight_scale_2")]
            parts = name_map.get(base)
            if parts is not None and base not in covered:
                wamax = float(_np(sd[k]).astype(np.float32).reshape(())) \
                    * 6.0 * 448.0
                wamax_acc[parts] = max(wamax, wamax_acc.get(parts, 0.0))
        elif k.endswith(".pre_quant_scale"):
            hf_base = k[: -len(".pre_quant_scale")]
            entry = repack.get(hf_base)
            if entry is None:
                # per-expert names: only expert 0 keys the repack entry
                # (one shared smoothing scale per expert group)
                continue
            parts = entry[0]
            pqs = _np(sd[k]).astype(np.float32).reshape(-1)
            quant = set_in(quant,
                           parts + ("input_quantizer", "pre_quant_scale"),
                           jnp.asarray(pqs))
        elif k.endswith((".k_scale", ".v_scale")):
            # model.layers.{i}.self_attn.{k,v}_scale
            parts = k.split(".")
            i, which = parts[2], parts[-1][0]
            kv_mult = {"FP8": 448.0, "INT8": 127.0,
                       "NVFP4": 6.0 * 448.0}.get(
                           q.get("kv_cache_quant_algo") or "FP8", 448.0)
            amax = _np(sd[k]).astype(np.float32).reshape(()) * kv_mult
            quant = set_in(
                quant, (f"layers_{i}", "attn", f"{which}_quantizer", "amax"),
                jnp.asarray(amax))
    for parts, amax in amax_acc.items():
        quant = set_in(quant, parts + ("input_quantizer", "amax"),
                       jnp.asarray(np.float32(amax)))
    for parts, wamax in wamax_acc.items():
        quant = set_in(quant, parts + ("weight_quantizer", "amax"),
                       jnp.asarray(np.float32(wamax)))

    leftover = {b for b in view._qbases} - covered
    if leftover:
        warnings.warn(
            f"{len(leftover)} quantized tensors had no direct repack path "
            "and were imported dequantized (served through fake-quant): "
            + ", ".join(sorted(leftover)[:4]) + " ...", stacklevel=2)

    variables = {**bundle.variables, "params": params}
    if quant:
        variables["quant"] = quant
    records = (
        ModeRecord("quantize", qcfg, {}),
        ModeRecord("compress", {}, {"compressed": sorted(
            "/".join(e[0]) for e in repack.values())}),
    )
    out = bundle.replace(variables=variables, records=records)
    out.metadata["checkpoint_path"] = path
    out.metadata["hf_quant_config"] = meta
    return out


# --------------------------------------------------------------------------
# native gpt-oss (OpenAI MXFP4 release format): fused stacked experts
# --------------------------------------------------------------------------
class _OaiView(Mapping):
    """Zero placeholders for the stacked expert tensors so the plain
    gpt-oss importer builds the module structure; everything else passes
    through. The placeholders are deleted and replaced by repacked
    qtensors immediately after."""

    def __init__(self, sd, synth: dict):
        self._sd = sd
        self._synth = synth
        self._keys = [k for k in sd
                      if not k.endswith(("_blocks", "_scales"))] \
            + list(synth)

    def __getitem__(self, key):
        if key in self._synth:
            return np.zeros(self._synth[key], np.float16)
        return self._sd[key]

    def __iter__(self):
        return iter(self._keys)

    def __len__(self):
        return len(self._keys)

    def __contains__(self, key):
        return key in self._synth or key in self._sd


_OAI_MX_WSPEC = {
    "enable": True, "num_bits": (2, 1),
    "block_sizes": {-2: 32, "type": "dynamic", "scale_format": "e8m0",
                    "two_level": False},
}


def _oai_unpack_blocks(blocks: np.ndarray) -> np.ndarray:
    """[..., out, in/32, 16] uint8 (2 e2m1 codes per byte, LOW nibble
    first) -> raw codes [..., out, in] uint8."""
    b = blocks.reshape(*blocks.shape[:-2], blocks.shape[-2] * 16)
    c = np.empty((*b.shape[:-1], b.shape[-1] * 2), np.uint8)
    c[..., 0::2] = b & 0xF
    c[..., 1::2] = b >> 4
    return c


def _oai_fold_codes(codes: np.ndarray) -> np.ndarray:
    """Per-expert output-major codes [E, out, in] -> our folded split-half
    packed layout [in/2, E*out] (expert e occupies output columns
    e*out:(e+1)*out — quant/compress.py's fold; quantize_mxfp4's pack)."""
    m = np.transpose(codes, (2, 0, 1)).reshape(codes.shape[2], -1)
    K = m.shape[0]
    return (m[: K // 2] | (m[K // 2:] << 4)).astype(np.uint8)


def _oai_fold_scales(s: np.ndarray) -> np.ndarray:
    """e8m0 scales [E, out, in/32] -> [in/32, E*out]."""
    return np.ascontiguousarray(
        np.transpose(s, (2, 0, 1)).reshape(s.shape[2], -1))


def load_oai_mxfp4_checkpoint(path: str, example_len: int = 8,
                              param_dtype=None) -> ModelBundle:
    """Load a native gpt-oss checkpoint in the OpenAI MXFP4 release format
    into a servable compressed bundle — the fused-stacked-expert layout the
    reference handles through its fused-expert HF plugin classes
    (reference: modelopt/torch/quantization/plugins/huggingface.py gpt-oss
    experts; examples/gpt-oss/).

    On disk each MoE projection is ONE stacked tensor per layer:
    ``mlp.experts.{gate_up,down}_proj_blocks`` [E, out, in/32, 16] uint8
    with two e2m1 codes per byte (low nibble first) and
    ``..._scales`` [E, out, in/32] biased-e8m0 uint8. The repack into the
    folded [in, E*out] MXFP4 qtensor layout is pure byte movement — code
    and scale values are copied verbatim (bit-exact), including the
    gate/up de-interleave (gate = even output rows) which is an output-
    permutation and so commutes with the input-dim quantization blocks.
    Everything dense (attention, router, biases, sinks, norms) imports
    through the plain gpt-oss map."""
    from .hf_import import LazyStateDict, from_hf

    with open(os.path.join(path, "config.json")) as f:
        hf_config = json.load(f)
    dtype = param_dtype or jnp.bfloat16
    sd = LazyStateDict(path)
    n_layers = int(hf_config["num_hidden_layers"])
    E = int(hf_config.get("num_local_experts", 32))
    Hd = int(hf_config["hidden_size"])
    I = int(hf_config["intermediate_size"])

    synth = {}
    for i in range(n_layers):
        L = f"model.layers.{i}.mlp.experts."
        synth[L + "gate_up_proj"] = (E, Hd, 2 * I)
        synth[L + "down_proj"] = (E, I, Hd)
    view = _OaiView(sd, synth)

    def commit(subtree):
        import jax

        return jax.tree.map(lambda a: jnp.asarray(a, dtype=dtype), subtree)

    bundle = from_hf(view, hf_config, example_len=example_len, commit=commit)
    if param_dtype is not None:
        import dataclasses

        mod = type(bundle.module)(
            dataclasses.replace(bundle.module.cfg, dtype=param_dtype,
                                param_dtype=param_dtype))
        bundle = bundle.replace(module=mod)

    from ..core.tree import del_in

    params = bundle.variables.get("params", {})
    quant: dict = {}
    for i in range(n_layers):
        L = f"model.layers.{i}.mlp.experts."
        gu_c = _oai_unpack_blocks(_np(sd[L + "gate_up_proj_blocks"]))
        gu_s = _np(sd[L + "gate_up_proj_scales"])
        d_c = _oai_unpack_blocks(_np(sd[L + "down_proj_blocks"]))
        d_s = _np(sd[L + "down_proj_scales"])
        # OAI interleaves gate/up along the fused output dim (gate even)
        for name, c, s in (("gate_proj", gu_c[:, 0::2], gu_s[:, 0::2]),
                           ("up_proj", gu_c[:, 1::2], gu_s[:, 1::2]),
                           ("down_proj", d_c, d_s)):
            parts = (f"layers_{i}", "moe", name)
            params = del_in(params, parts + ("kernel",))
            quant = set_in(quant, parts + ("qweight",), {
                "data": jnp.asarray(_oai_fold_codes(c)),
                "scale": jnp.asarray(_oai_fold_scales(s)),
            })

    cfg_dict = {
        "quant_cfg": {
            "*": {"enable": False},
            "*moe/gate_proj/weight_quantizer": dict(_OAI_MX_WSPEC),
            "*moe/up_proj/weight_quantizer": dict(_OAI_MX_WSPEC),
            "*moe/down_proj/weight_quantizer": dict(_OAI_MX_WSPEC),
        },
        "algorithm": None,
    }
    qcfg = get_config(cfg_dict)
    records = (
        ModeRecord("quantize", qcfg, {}),
        ModeRecord("compress", {}, {"compressed": sorted(
            f"layers_{i}/moe/{n}" for i in range(n_layers)
            for n in ("gate_proj", "up_proj", "down_proj"))}),
    )
    out = bundle.replace(
        variables={**bundle.variables, "params": params, "quant": quant},
        records=records,
    )
    out.metadata["checkpoint_path"] = path
    return out
