"""Model zoo: native quantization-aware decoders + HF checkpoint import."""

from .hf_import import config_from_hf, from_hf
from .transformer import (
    Decoder,
    DecoderConfig,
    gpt2_config,
    llama3_8b_config,
    llama_config,
    make_cache,
    mixtral_config,
    tiny_test_config,
    tinyllama_config,
)

__all__ = [
    "Decoder",
    "DecoderConfig",
    "config_from_hf",
    "from_hf",
    "gpt2_config",
    "llama3_8b_config",
    "llama_config",
    "make_cache",
    "mixtral_config",
    "tiny_test_config",
    "tinyllama_config",
]
