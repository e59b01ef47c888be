"""Quantization-aware linen layers and the TensorQuantizer module."""

from .layers import (
    QuantConv,
    QuantDense,
    QuantEinsum,
    QuantLSTM,
    QuantPool,
    QuantEmbed,
    RMSNorm,
)
from .quantizer import (
    TensorQuantizer,
    active_quant_config,
    current_phase,
    quantization_active,
)

__all__ = [
    "QuantConv",
    "QuantDense",
    "QuantEinsum",
    "QuantLSTM",
    "QuantPool",
    "QuantEmbed",
    "RMSNorm",
    "TensorQuantizer",
    "active_quant_config",
    "current_phase",
    "quantization_active",
]
