"""Export quantized checkpoints for downstream inference engines
(reference: modelopt/torch/export/)."""

from .hf_export import export_hf_checkpoint

__all__ = ["export_hf_checkpoint"]
