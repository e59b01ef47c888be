"""End-to-end recipe API: validated schemas over YAML presets with dotlist
overrides (reference: modelopt/recipe/config.py:116-420 recipe schemas,
loader.py:74 load_recipe, :122 dotlist overrides, presets.py registry).
"""

from __future__ import annotations

from typing import Any, Optional

from pydantic import BaseModel, Field

from ..core.config_loader import apply_dotlist, load_config


class CalibSpec(BaseModel):
    num_batches: int = 16
    batch_size: int = 4
    seq_len: int = 512


class PTQRecipe(BaseModel):
    """A full PTQ run description: quantization config + calibration spec +
    optional compression/export steps."""

    quant_cfg: dict = Field(default_factory=dict)
    algorithm: Any = "max"
    calib: CalibSpec = Field(default_factory=CalibSpec)
    compress: bool = False
    export_dir: Optional[str] = None
    numerics: Optional[dict] = None  # informational fragment

    def to_quantize_config(self) -> dict:
        return {"quant_cfg": self.quant_cfg, "algorithm": self.algorithm}


PRESETS = {
    "llama_fp8": "ptq/llama_fp8.yaml",
    "llama_int4_awq": "ptq/llama_int4_awq.yaml",
    "llama_nvfp4": "ptq/llama_nvfp4.yaml",
    # per-model serving presets (reference: modelopt_recipes/configs/ptq/
    # presets/model/*.yaml + kv/*.yaml + diffusers/*.yaml)
    "llama_w4a8_int8kv": "ptq/llama_w4a8_int8kv.yaml",
    "qwen3_moe_w4a8": "ptq/qwen3_moe_w4a8.yaml",
    "deepseek_mla_fp8": "ptq/deepseek_mla_fp8.yaml",
    "gpt_oss_mxfp4": "ptq/gpt_oss_mxfp4.yaml",
    "gemma3_int4_awq": "ptq/gemma3_int4_awq.yaml",
    "mixtral_experts_nvfp4": "ptq/mixtral_experts_nvfp4.yaml",
    "mamba_moe_fp8_conservative": "ptq/mamba_moe_fp8_conservative.yaml",
    "mamba_moe_fp8_aggressive": "ptq/mamba_moe_fp8_aggressive.yaml",
    "dit_fp8": "diffusers/dit_fp8.yaml",
    "dit_nvfp4": "diffusers/dit_nvfp4.yaml",
}


def _normalize_quant_cfg(qc: dict) -> dict:
    """Drop ``enable: false`` leaked into rules that specify numerics.

    ``$import`` deep-merges rule dicts, so a preset that overrides
    base.yaml's blanket ``{enable: false}`` with real numerics ends up
    with ``{enable: false, num_bits: ...}`` — a silently-disabled
    quantizer. A rule that carries spec fields means "quantize like
    this"; pure ``{enable: false}`` exclusions are untouched."""
    out = {}
    for pat, rule in qc.items():
        if (isinstance(rule, dict) and rule.get("enable") is False
                and set(rule) - {"enable"}):
            rule = {k: v for k, v in rule.items() if k != "enable"}
        out[pat] = rule
    return out


def load_recipe(name_or_path: str, overrides: Optional[list[str]] = None) -> PTQRecipe:
    """Load a named preset or YAML path, apply ``a.b=c`` dotlist overrides,
    validate against the schema."""
    path = PRESETS.get(name_or_path, name_or_path)
    raw = load_config(path)
    if overrides:
        raw = apply_dotlist(raw, overrides)
    if isinstance(raw.get("quant_cfg"), dict):
        raw["quant_cfg"] = _normalize_quant_cfg(raw["quant_cfg"])
    return PTQRecipe.model_validate(raw)


def run_recipe(bundle, recipe: PTQRecipe, forward_loop=None):
    """Execute a PTQ recipe: quantize (+compress, +export)."""
    import modelopt_tpu.quant as mtq

    if forward_loop is None:
        from ..utils.evaluate import synthetic_token_batches

        batches = synthetic_token_batches(
            bundle.module.cfg.vocab_size,
            recipe.calib.num_batches,
            recipe.calib.batch_size,
            min(recipe.calib.seq_len, bundle.module.cfg.max_position_embeddings),
        )

        def forward_loop(model_fn):
            for b in batches:
                model_fn(b)

    out = mtq.quantize(bundle, recipe.to_quantize_config(), forward_loop)
    if recipe.compress:
        out = mtq.compress(out)
    if recipe.export_dir:
        from ..export import export_hf_checkpoint

        export_hf_checkpoint(out, recipe.export_dir)
    return out
