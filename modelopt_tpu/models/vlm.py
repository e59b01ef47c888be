"""LLaVA-style vision-language model: ViT tower + MLP projector + decoder.

The reference treats VLMs as HF models whose language (and optionally
vision) linears get quantized in place (reference: examples/vlm_ptq/,
plugins/huggingface.py); here the VLM is a native composition of the
quantized ViT (models/vit.py) and Decoder (models/transformer.py), so the
whole quantization/sparsity/LoRA stack applies to both towers through the
ordinary pattern configs.

Layout: image features are projected into the text embedding space and
PREPENDED to the token embeddings (image-first prompt, the llava deployment
layout). ``__call__(input_ids, pixel_values)`` returns logits over the
num_patches + T positions; generation steps after prefill pass
``pixel_values=None`` and use the KV cache as usual.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from ..nn.layers import QuantDense
from .transformer import Decoder, DecoderConfig
from .vit import ViTConfig, VisionTransformer


@dataclasses.dataclass(frozen=True)
class VLMConfig:
    vision: ViTConfig
    text: DecoderConfig
    projector_hidden: int = 0  # 0 -> text.hidden_size (llava uses 2-layer MLP)

    def to_dict(self):
        return {
            "vision": self.vision.to_dict(),
            "text": self.text.to_dict(),
            "projector_hidden": self.projector_hidden,
        }


class VLM(nn.Module):
    cfg: VLMConfig

    def setup(self):
        tc = self.cfg.text
        ph = self.cfg.projector_hidden or tc.hidden_size
        self.vision_tower = VisionTransformer(self.cfg.vision)
        self.linear_1 = QuantDense(ph, use_bias=True, dtype=tc.dtype,
                                   param_dtype=tc.param_dtype, name="linear_1")
        self.linear_2 = QuantDense(tc.hidden_size, use_bias=True,
                                   dtype=tc.dtype, param_dtype=tc.param_dtype,
                                   name="linear_2")
        self.language_model = Decoder(tc)

    def encode_image(self, pixel_values):
        """pixel_values [B, H, W, 3] -> prefix embeddings [B, P, text_H]
        (llava multi_modal_projector: linear-GELU-linear)."""
        feats = self.vision_tower(pixel_values)
        return self.linear_2(nn.gelu(self.linear_1(feats), approximate=False))

    def __call__(self, input_ids, pixel_values=None, cache=None,
                 positions=None, output_hidden=False):
        prefix = None
        if pixel_values is not None:
            prefix = self.encode_image(pixel_values)
        return self.language_model(
            input_ids, cache=cache, positions=positions,
            output_hidden=output_hidden, prefix_embeds=prefix,
        )

    @property
    def num_image_tokens(self) -> int:
        return self.cfg.vision.num_patches


def tiny_vlm_config(**overrides) -> VLMConfig:
    """Small VLM for tests: 2-layer ViT on 16x16 images + 2-layer decoder."""
    from .transformer import tiny_test_config

    vision = ViTConfig(
        image_size=16, patch_size=8, hidden_size=32, num_layers=2,
        num_heads=2, intermediate_size=64, select_layer=-2,
        dtype=overrides.pop("dtype", jnp.float32),
        param_dtype=jnp.float32,
    )
    text = tiny_test_config(dtype=vision.dtype)
    base = dict(vision=vision, text=text)
    base.update(overrides)
    return VLMConfig(**base)
