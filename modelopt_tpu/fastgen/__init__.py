"""fastgen: few-step diffusion distillation
(reference: modelopt/torch/fastgen/)."""

from .dmd import DMDConfig, DMDPipeline

__all__ = ["DMDConfig", "DMDPipeline"]
