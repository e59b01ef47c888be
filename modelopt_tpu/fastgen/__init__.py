"""fastgen: few-step diffusion distillation
(reference: modelopt/torch/fastgen/)."""

from .cache_diffusion import cache_ddim_sample
from .dmd import DMDConfig, DMDPipeline

__all__ = ["DMDConfig", "DMDPipeline", "cache_ddim_sample"]
