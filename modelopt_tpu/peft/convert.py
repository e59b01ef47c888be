"""LoRA adapters as a dedicated ``'lora'`` variable collection
(reference: modelopt/torch/peft/convert.py:45 update_model,
lora/layer.py LoRAModule).

Because adapters live in their own collection, "train only the adapters" is
just optimizing ``variables['lora']`` — no parameter filtering machinery.
Composes with the quantize/compress modes for QLoRA (the adapter input is
the raw 16-bit activation, the base GEMM stays quantized).
"""

from __future__ import annotations

import dataclasses
from fnmatch import fnmatch

import jax
import jax.numpy as jnp

from ..core.bundle import ModelBundle, apply_mode
from ..core.mode import ModeDescriptor, ModeRegistry
from ..core.tree import flatten_with_paths, get_in, set_in

PeftModeRegistry = ModeRegistry("peft")


@dataclasses.dataclass
class LoRAConfig:
    rank: int = 16
    alpha: float = 32.0
    patterns: tuple = ("*attn/*_proj", "*mlp/*_proj")
    init_std: float = 0.02
    seed: int = 0

    def to_dict(self):
        return dataclasses.asdict(self) | {"patterns": list(self.patterns)}


@PeftModeRegistry.register
class LoRAMode(ModeDescriptor):
    name = "lora"

    def convert(self, bundle: ModelBundle, config):
        if isinstance(config, dict):
            config = LoRAConfig(**{**config, "patterns": tuple(config.get("patterns", LoRAConfig.patterns))})
        key = jax.random.PRNGKey(config.seed)
        variables = bundle.variables
        lora = dict(variables.get("lora", {}))
        for path, leaf in flatten_with_paths(variables.get("params", {})):
            if not path.endswith("/kernel") or leaf.ndim != 2:
                continue
            dense_path = path.rsplit("/kernel", 1)[0]
            if not any(fnmatch(dense_path, p) for p in config.patterns):
                continue
            key, k1 = jax.random.split(key)
            K, N = leaf.shape
            r = min(config.rank, min(K, N))
            a = jax.random.normal(k1, (K, r), jnp.float32) * config.init_std
            b = jnp.zeros((r, N), jnp.float32)
            dp = tuple(dense_path.split("/"))
            lora = set_in(lora, dp + ("lora_a",), a)
            lora = set_in(lora, dp + ("lora_b",), b)
            lora = set_in(lora, dp + ("lora_scale",), jnp.float32(config.alpha / r))
        return bundle.replace(variables={**variables, "lora": lora}), {}

    def config_from_dict(self, d):
        return LoRAConfig(**{**d, "patterns": tuple(d.get("patterns", LoRAConfig.patterns))})

    def config_to_dict(self, c):
        return c.to_dict() if isinstance(c, LoRAConfig) else dict(c)


def update_model(bundle: ModelBundle, config) -> ModelBundle:
    """(reference: mtpf.update_model)"""
    return apply_mode(bundle, "lora", config)


def disable_adapters(bundle: ModelBundle) -> ModelBundle:
    """Zero out adapter contributions (scale := 0), keeping weights."""
    lora = bundle.variables.get("lora", {})
    lora = jax.tree_util.tree_map_with_path(
        lambda p, x: jnp.zeros_like(x)
        if str(getattr(p[-1], "key", "")) == "lora_scale" else x,
        lora,
    )
    return bundle.replace(variables={**bundle.variables, "lora": lora})


def enable_adapters(bundle: ModelBundle, alpha_over_rank=None) -> ModelBundle:
    records = [r for r in bundle.records if r.mode == "lora"]
    cfg = records[-1].config if records else LoRAConfig()
    scale = alpha_over_rank if alpha_over_rank is not None else cfg.alpha / cfg.rank
    lora = bundle.variables.get("lora", {})
    lora = jax.tree_util.tree_map_with_path(
        lambda p, x: jnp.float32(scale)
        if str(getattr(p[-1], "key", "")) == "lora_scale" else x,
        lora,
    )
    return bundle.replace(variables={**bundle.variables, "lora": lora})


def merge_lora(bundle: ModelBundle) -> ModelBundle:
    """Fold adapters into base kernels and drop the lora collection (only
    valid for non-compressed bases)."""
    variables = bundle.variables
    for path, _ in list(flatten_with_paths(variables.get("lora", {}))):
        if not path.endswith("/lora_a"):
            continue
        dp = tuple(path.rsplit("/lora_a", 1)[0].split("/"))
        a = get_in(variables["lora"], dp + ("lora_a",))
        b = get_in(variables["lora"], dp + ("lora_b",))
        s = get_in(variables["lora"], dp + ("lora_scale",))
        w = get_in(variables["params"], dp + ("kernel",))
        if w is None:
            continue
        variables = {
            **variables,
            "params": set_in(
                variables["params"], dp + ("kernel",),
                (w.astype(jnp.float32) + (a @ b) * s).astype(w.dtype),
            ),
        }
    variables = {k: v for k, v in variables.items() if k != "lora"}
    records = tuple(r for r in bundle.records if r.mode != "lora")
    return bundle.replace(variables=variables, records=records)
