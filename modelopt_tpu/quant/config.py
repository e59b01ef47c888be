"""Quantization config: ordered wildcard rules + named presets.

The JAX equivalent of the reference's ``QuantizeConfig``/
``QuantizerAttributeConfig`` + ~40 named presets
(reference: modelopt/torch/quantization/config.py:329,1621,1729-1826).

A ``QuantizeConfig`` is frozen and hashable so it can live in jit closures /
static args. Rules are applied in order to each quantizer's path (e.g.
``transformer/h_0/mlp/fc1/weight_quantizer``) with fnmatch wildcards; later
matches override earlier ones attribute-by-attribute, matching the reference's
``set_quantizer_by_cfg`` semantics (reference: quantization/conversion.py:244).

Layout convention: JAX Dense kernels are ``[in_features, out_features]``
(transposed vs. torch). Per-output-channel weight quant is therefore
``axis: (-1,)`` and AWQ-style input-dim blocks are ``{-2: 128}`` here, where
the reference writes ``axis: 0`` / ``{-1: 128}`` on ``[out, in]`` weights.
Weight blocks use NEGATIVE axes so the same preset is shape-correct on 3-D
MoE expert kernels ``[E, in, out]`` (axis 0 there is the EXPERT dim).
"""

from __future__ import annotations

import dataclasses
from fnmatch import fnmatch
from functools import lru_cache
from typing import Any, Optional

from .qspec import QuantizerSpec


def _freeze(obj):
    if isinstance(obj, dict):
        # keys may mix ints (block axes) and strs (options); sort by repr
        return tuple(sorted(((k, _freeze(v)) for k, v in obj.items()), key=lambda kv: repr(kv[0])))
    if isinstance(obj, (list, tuple)):
        return tuple(_freeze(v) for v in obj)
    return obj


def _thaw(obj):
    if isinstance(obj, tuple) and all(
        isinstance(i, tuple) and len(i) == 2 and isinstance(i[0], (str, int)) for i in obj
    ):
        return {k: _thaw(v) for k, v in obj}
    if isinstance(obj, tuple):
        return [_thaw(v) for v in obj]
    return obj


@dataclasses.dataclass(frozen=True)
class QuantizeConfig:
    """rules: ordered ``(pattern, frozen-attrs | tuple-of-frozen-attrs | None)``.

    A tuple of attr-dicts for one pattern builds a sequential quantizer chain
    (e.g. W4A8 = INT4 then FP8; reference: tensor_quantizer.py:1797
    SequentialQuantizer). ``None``/``{"enable": False}`` disables.
    """

    rules: tuple = ()
    algorithm: Any = "max"

    @staticmethod
    def from_dict(d: dict) -> "QuantizeConfig":
        quant_cfg = d.get("quant_cfg", d)
        rules = []
        for pattern, attrs in quant_cfg.items():
            if isinstance(attrs, (list, tuple)):
                # sequential quantizer chain: mark explicitly so (de)serialization
                # and resolution don't have to guess the nesting level
                rules.append((pattern, ("__seq__", tuple(_freeze(a) for a in attrs))))
            else:
                rules.append((pattern, _freeze(attrs)))
        alg = d.get("algorithm", "max")
        return QuantizeConfig(rules=tuple(rules), algorithm=_freeze(alg))

    def to_dict(self) -> dict:
        quant_cfg = {}
        for pattern, attrs in self.rules:
            if _is_seq(attrs):
                quant_cfg[pattern] = [_thaw(a) for a in attrs[1]]
            else:
                quant_cfg[pattern] = _thaw(attrs)
        return {"quant_cfg": quant_cfg, "algorithm": _thaw(self.algorithm)}

    def updated(self, extra_rules: dict) -> "QuantizeConfig":
        """Append rules (later rules win) — used by disable_quantizer etc."""
        extra = QuantizeConfig.from_dict({"quant_cfg": extra_rules})
        return dataclasses.replace(self, rules=self.rules + extra.rules)

    def resolve(self, path: str) -> Optional[tuple]:
        return _resolve_cached(self, path)

    @property
    def algorithm_name(self) -> Optional[str]:
        alg = _thaw(self.algorithm)
        if alg is None:
            return None
        return alg if isinstance(alg, str) else alg.get("method")

    @property
    def algorithm_kwargs(self) -> dict:
        alg = _thaw(self.algorithm)
        if isinstance(alg, dict):
            return {k: v for k, v in alg.items() if k != "method"}
        return {}


def _is_seq(attrs) -> bool:
    return isinstance(attrs, tuple) and len(attrs) == 2 and attrs[0] == "__seq__"


@lru_cache(maxsize=16384)
def _resolve_cached(cfg: QuantizeConfig, path: str):
    """Merge all matching rules in order → tuple of QuantizerSpec, or None."""
    merged: list[dict] = []
    matched = False
    for pattern, attrs in cfg.rules:
        if not fnmatch(path, pattern):
            continue
        matched = True
        if attrs is None:
            merged = [{"enable": False}]
        elif _is_seq(attrs):  # sequential chain replaces wholesale
            merged = [dict(_thaw(a)) for a in attrs[1]]
        else:
            thawed = _thaw(attrs)
            if len(merged) == 1:
                merged[0].update(thawed)
            else:
                merged = [dict(thawed)]
    if not matched:
        return None
    specs = tuple(QuantizerSpec.from_dict(a) for a in merged)
    if all(not s.enable for s in specs):
        return None
    return specs


# ---------------------------------------------------------------------------
# Named presets (reference: quantization/config.py:1729-1826 + recipe YAMLs)
# ---------------------------------------------------------------------------
# Default exclusions applied in every preset, mirroring the reference's
# choices of skipping the LM head / router / embeddings for LLM PTQ.
_DEFAULT_DISABLED = {
    "*lm_head*": {"enable": False},
    "*router*": {"enable": False},
    # embeddings excluded by default: deployment engines keep them in
    # 16-bit, and fake-quantizing a 16-bit embedding table every forward
    # costs more HBM traffic than it saves (reference exports leave
    # embeddings unquantized too)
    "*embed*": {"enable": False},
}


def _cfg(weight: dict, act: Optional[dict] = None, extra: Optional[dict] = None,
         algorithm: Any = "max") -> dict:
    qc = {"*weight_quantizer": weight}
    qc["*input_quantizer"] = act if act is not None else {"enable": False}
    qc["*output_quantizer"] = {"enable": False}
    qc.update(_DEFAULT_DISABLED)
    if extra:
        qc.update(extra)
    return {"quant_cfg": qc, "algorithm": algorithm}


_W_INT8_PC = {"num_bits": 8, "axis": (-1,)}            # per-out-channel
_A_INT8_PT = {"num_bits": 8, "axis": None}             # per-tensor
_W_FP8 = {"num_bits": (4, 3), "axis": None}
_A_FP8 = {"num_bits": (4, 3), "axis": None}
_W_INT4_BLOCK = {"num_bits": 4, "block_sizes": {-2: 128}}
_W_NVFP4 = {
    "num_bits": (2, 1),
    "block_sizes": {-2: 16, "type": "dynamic", "scale_format": "e4m3", "two_level": True},
}
_A_NVFP4 = {
    "num_bits": (2, 1),
    "block_sizes": {-1: 16, "type": "dynamic", "scale_format": "e4m3", "two_level": True},
}

INT8_DEFAULT_CFG = _cfg(_W_INT8_PC, _A_INT8_PT)
INT8_SMOOTHQUANT_CFG = _cfg(_W_INT8_PC, _A_INT8_PT, algorithm="smoothquant")
INT8_WEIGHT_ONLY_CFG = _cfg(_W_INT8_PC, None)
FP8_DEFAULT_CFG = _cfg(_W_FP8, _A_FP8)
FP8_WEIGHT_ONLY_CFG = _cfg(_W_FP8, None)
FP8_PER_CHANNEL_PER_TOKEN_CFG = _cfg(
    {"num_bits": (4, 3), "axis": (-1,)},
    # per-token dynamic: one scale per row = a dynamic "block" spanning the
    # whole feature dim (size 0 = full dim)
    {"num_bits": (4, 3), "block_sizes": {-1: 0, "type": "dynamic"}},
)
FP8_2D_BLOCKWISE_WEIGHT_ONLY_CFG = _cfg(
    {"num_bits": (4, 3), "block_sizes": {-2: 128, -1: 128, "type": "dynamic"}}, None
)
INT4_BLOCKWISE_WEIGHT_ONLY_CFG = _cfg(_W_INT4_BLOCK, None)
INT4_AWQ_CFG = _cfg(_W_INT4_BLOCK, None, algorithm={"method": "awq_lite"})
INT4_AWQ_CLIP_CFG = _cfg(_W_INT4_BLOCK, None, algorithm={"method": "awq_clip"})
INT4_AWQ_FULL_CFG = _cfg(_W_INT4_BLOCK, None, algorithm={"method": "awq_full"})
W4A8_AWQ_BETA_CFG = _cfg(
    # sequential: INT4 block-128 then FP8 per-tensor on the same weight
    [ {"num_bits": 4, "block_sizes": {-2: 128}}, {"num_bits": (4, 3), "axis": None} ],
    _A_FP8,
    algorithm={"method": "awq_lite"},
)
# TPU-native W4A8: int4 block-128 weights + per-token dynamic INT8
# activations — v5e has no fp8 MXU, so the int8 MXU (394 TOPS) is the
# 8-bit-activation serving path here (reference intent: the W4A8 family,
# config.py W4A8_AWQ_BETA_CFG; compute path: kernels/quant_gemm.py
# w4a8_gemm). awq_lite preconditions the weights like the reference's.
_A_INT8_PER_TOKEN = {"num_bits": 8, "block_sizes": {-1: 0, "type": "dynamic"}}
W4A8_INT8_DYNAMIC_CFG = _cfg(_W_INT4_BLOCK, _A_INT8_PER_TOKEN,
                             algorithm={"method": "awq_lite"})
NVFP4_DEFAULT_CFG = _cfg(_W_NVFP4, _A_NVFP4)
NVFP4_AWQ_LITE_CFG = _cfg(_W_NVFP4, _A_NVFP4, algorithm={"method": "awq_lite"})
NVFP4_AWQ_CLIP_CFG = _cfg(_W_NVFP4, _A_NVFP4, algorithm={"method": "awq_clip"})
NVFP4_AWQ_FULL_CFG = _cfg(_W_NVFP4, _A_NVFP4, algorithm={"method": "awq_full"})
NVFP4_SVDQUANT_CFG = _cfg(_W_NVFP4, _A_NVFP4, algorithm={"method": "svdquant"})
NVFP4_WEIGHT_ONLY_CFG = _cfg(_W_NVFP4, None)
NVFP4_MLP_ONLY_CFG = _cfg(
    {"enable": False}, {"enable": False},
    extra={
        "*mlp*weight_quantizer": _W_NVFP4,
        "*mlp*input_quantizer": _A_NVFP4,
    },
)
W4A8_NVFP4_FP8_CFG = _cfg(_W_NVFP4, _A_FP8)

# MX blocks run along the contracting dim: axis -2 for [.., in, out] weight
# kernels, the feature (-1) axis for activations
_MX_W = lambda nb: {  # noqa: E731
    "num_bits": nb,
    "block_sizes": {-2: 32, "type": "dynamic", "scale_format": "e8m0", "two_level": False},
}
_MX_A = lambda nb: {  # noqa: E731
    "num_bits": nb,
    "block_sizes": {-1: 32, "type": "dynamic", "scale_format": "e8m0", "two_level": False},
}
MXFP8_DEFAULT_CFG = _cfg(_MX_W((4, 3)), _MX_A((4, 3)))
MXFP6_DEFAULT_CFG = _cfg(_MX_W((3, 2)), _MX_A((3, 2)))
MXFP4_DEFAULT_CFG = _cfg(_MX_W((2, 1)), _MX_A((2, 1)))
MXINT8_DEFAULT_CFG = _cfg(_MX_W(8), _MX_A(8))
W4A8_MXFP4_FP8_CFG = _cfg(_MX_W((2, 1)), _A_FP8)
MXFP4_MLP_WEIGHT_ONLY_CFG = _cfg(
    {"enable": False}, None,
    extra={"*mlp*weight_quantizer": _MX_W((2, 1)),
           "*moe*weight_quantizer": _MX_W((2, 1))},
)

# NVFP4 4/6: per-block MSE choice between scale-to-6 and scale-to-4 grids
# (reference: NVFP4_FOUR_OVER_SIX_CFG, config.py:1771)
_W_NVFP4_46 = {
    "num_bits": (2, 1),
    "block_sizes": {-2: 16, "type": "dynamic", "scale_format": "e4m3",
                    "two_level": True, "four_over_six": True},
}
NVFP4_FOUR_OVER_SIX_CFG = _cfg(_W_NVFP4_46, _A_NVFP4)
W4A16_NVFP4_CFG = _cfg(_W_NVFP4, None)
# expert weights only (MoE PTQ at minimum quality risk; reference:
# NVFP4_EXPERTS_ONLY_CFG, config.py:1820)
NVFP4_EXPERTS_ONLY_CFG = _cfg(
    {"enable": False}, None,
    extra={"*moe*weight_quantizer": _W_NVFP4},
)

# KV-cache quantization add-ons (merge into another config's quant_cfg).
# Reference: FP8_KV_CFG / NVFP4_KV_CFG (config.py) + bmm quantizers
# (plugins/attention.py:45).
KV_CACHE_FP8 = {
    "*k_quantizer": {"num_bits": (4, 3), "axis": None},
    "*v_quantizer": {"num_bits": (4, 3), "axis": None},
}
KV_CACHE_NVFP4 = {"*k_quantizer": dict(_A_NVFP4), "*v_quantizer": dict(_A_NVFP4)}
# affine (asymmetric) KV quantization — keys often carry per-channel offsets
# (reference: FP8_AFFINE_KV_CFG + calib/bias.py)
KV_CACHE_FP8_AFFINE = {
    "*k_quantizer": {"num_bits": (4, 3), "axis": None, "bias_mode": "static"},
    "*v_quantizer": {"num_bits": (4, 3), "axis": None, "bias_mode": "static"},
}
# INT8 KV cache: per-tensor static int8 codes + fp32 scale — the same
# storage/kernel path as FP8_KV with integer codes (requires calibration;
# see transformer.py's trace-time check)
KV_CACHE_INT8 = {
    "*k_quantizer": {"num_bits": 8, "axis": None},
    "*v_quantizer": {"num_bits": 8, "axis": None},
}
FP8_KV_CFG = _cfg(_W_FP8, _A_FP8, extra=KV_CACHE_FP8)
INT8_KV_CFG = _cfg(_W_INT8_PC, _A_INT8_PT, extra=KV_CACHE_INT8,
                   algorithm={"method": "smoothquant"})
# W4A8 serving with an INT8 KV cache: the TPU-fastest full stack — int4
# weights + int8 activations on the int8 MXU AND int8 KV codes consumed
# raw by the int8-MXU decode-attention path (kernels/attention.py; the
# e4m3 cache needs a per-element VPU decode that gates reads at ~230 GB/s
# on v5e vs ~500 for raw int8 codes)
W4A8_INT8KV_CFG = _cfg(_W_INT4_BLOCK, _A_INT8_PER_TOKEN,
                       extra=KV_CACHE_INT8,
                       algorithm={"method": "awq_lite"})
FP8_AFFINE_KV_CFG = _cfg(_W_FP8, _A_FP8, extra=KV_CACHE_FP8_AFFINE)
NVFP4_KV_CFG = _cfg(_W_NVFP4, _A_NVFP4, extra=KV_CACHE_NVFP4)
# Hadamard-rotated NVFP4 KV cache: k/v (and q, so scores stay consistent
# under the same basis change) quantize in the rotated head-dim basis
# (reference: NVFP4_KV_ROTATE_CFG config.py:1802 + RotateConfig :289)
KV_CACHE_NVFP4_ROTATE = {
    "*k_quantizer": dict(_A_NVFP4, rotate=True),
    "*v_quantizer": dict(_A_NVFP4, rotate=True),
    "*q_quantizer": dict(_A_NVFP4, rotate=True),
}
NVFP4_KV_ROTATE_CFG = _cfg(_W_NVFP4, _A_NVFP4, extra=KV_CACHE_NVFP4_ROTATE)

# MiniMax-M3-style MIXED format: MXFP8 base + NVFP4 routed experts
# (reference workload: examples/minimax_m3/hf_ptq_mixed_mxfp8_nvfp4.py —
# routers, shared experts, lm_head and KV stay high precision)
MIXED_MXFP8_NVFP4_EXPERTS_CFG = _cfg(
    _MX_W((4, 3)), _MX_A((4, 3)),
    extra={
        "*moe*weight_quantizer": _W_NVFP4,
        "*moe*input_quantizer": {"enable": False},
        "*moe/shared_experts*weight_quantizer": _MX_W((4, 3)),
        "*moe/shared_experts*input_quantizer": _MX_A((4, 3)),
    },
)

choices = {
    name: obj
    for name, obj in list(globals().items())
    if name.endswith("_CFG") and isinstance(obj, dict)
}


def get_config(cfg) -> QuantizeConfig:
    """Accept a preset name, a raw dict, or an already-built QuantizeConfig."""
    if isinstance(cfg, QuantizeConfig):
        return cfg
    if isinstance(cfg, str):
        if cfg in choices:
            return QuantizeConfig.from_dict(choices[cfg])
        raise KeyError(f"Unknown quant preset {cfg!r}; available: {sorted(choices)}")
    return QuantizeConfig.from_dict(cfg)
