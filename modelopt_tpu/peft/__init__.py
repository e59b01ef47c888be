"""PEFT / LoRA — import as ``mtpf``
(reference: modelopt/torch/peft/)."""

from .convert import (
    LoRAConfig,
    disable_adapters,
    enable_adapters,
    merge_lora,
    update_model,
)

__all__ = [
    "LoRAConfig",
    "disable_adapters",
    "enable_adapters",
    "merge_lora",
    "update_model",
]
