"""Model zoo: native quantization-aware decoders + HF checkpoint import."""

from .dit import DiT, DiTConfig, ddim_sample, dit_config_s
from .hf_import import LazyStateDict, config_from_hf, from_hf, load_hf_checkpoint
from .quantized_import import load_oai_mxfp4_checkpoint, load_quantized_checkpoint
from .vit import ViTConfig, VisionTransformer
from .vlm import VLM, VLMConfig, tiny_vlm_config
from .transformer import (
    Decoder,
    DecoderConfig,
    fuse_for_serving,
    gpt2_config,
    llama3_8b_config,
    llama_config,
    make_cache,
    mistral_config,
    mixtral_config,
    deepseek_v2_lite_config,
    gpt_oss_20b_config,
    gemma3_4b_config,
    tiny_gemma3_test_config,
    qwen3_config,
    qwen3_moe_config,
    tiny_gptoss_test_config,
    deepseek_v3_config,
    tiny_mla_test_config,
    qwen2_config,
    tiny_test_config,
    tinyllama_config,
)

__all__ = [
    "Decoder",
    "VLM",
    "VLMConfig",
    "ViTConfig",
    "VisionTransformer",
    "tiny_vlm_config",
    "DecoderConfig",
    "LazyStateDict",
    "config_from_hf",
    "from_hf",
    "load_hf_checkpoint",
    "load_oai_mxfp4_checkpoint",
    "load_quantized_checkpoint",
    "gpt2_config",
    "llama3_8b_config",
    "llama_config",
    "make_cache",
    "mixtral_config",
    "deepseek_v2_lite_config",
    "gpt_oss_20b_config",
    "gemma3_4b_config",
    "tiny_gemma3_test_config",
    "qwen3_config",
    "qwen3_moe_config",
    "tiny_gptoss_test_config",
    "deepseek_v3_config",
    "tiny_mla_test_config",
    "tiny_test_config",
    "tinyllama_config",
]
