"""Quantization mode descriptors (reference: modelopt/torch/quantization/mode.py:82)."""

from __future__ import annotations

from ..core.mode import ModeDescriptor, ModeRegistry
from .config import QuantizeConfig, get_config

QuantizeModeRegistry = ModeRegistry("quantization")


@QuantizeModeRegistry.register
class QuantizeModeDescriptor(ModeDescriptor):
    """Attaching quantization is purely a config matter here: quantizer
    submodules already exist in every Quant* layer and are identity until a
    QuantizeConfig is active. convert() therefore only canonicalizes the
    config; runtime_context() binds it during apply. Calibration populates
    the 'quant' variable collection (reference counterpart:
    convert_to_quantized_model + calibrate, quantization/conversion.py:62,
    model_calib.py:311).
    """

    name = "quantize"

    def canonicalize_config(self, config) -> QuantizeConfig:
        return get_config(config)

    def convert(self, bundle, config):
        return bundle, {}

    def runtime_context(self, config, phase):
        from ..nn.quantizer import quantization_active

        return quantization_active(get_config(config), phase)

    def config_from_dict(self, d):
        return QuantizeConfig.from_dict(d)

    def config_to_dict(self, config):
        return get_config(config).to_dict()
