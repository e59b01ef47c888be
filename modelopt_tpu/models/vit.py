"""Vision transformer (CLIP-flavor) — the vision tower for VLM support.

The reference quantizes HF VLMs in place (reference: examples/vlm_ptq,
modelopt/torch/quantization/plugins/huggingface.py covers the CLIP/SigLIP
vision towers through the generic nn.Linear/Conv registry); here the tower
is a native module built from the same quantized layers as the decoder, so
every quantization mode (PTQ/QAT/AWQ/compress) applies to it unchanged.

Architecture (CLIP ViT): conv patch embed, CLS token, learned positions,
pre-norm blocks with full bidirectional attention, GELU MLP. ``select_layer``
picks which block's output feeds the multimodal projector (llava uses -2).
TPU notes: patch conv = one big implicit GEMM; attention over ~(image/patch)²
tokens is small, XLA's fused softmax path is already optimal here — Pallas
flash attention only pays off at decoder prefill lengths.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..nn.layers import QuantConv, QuantDense


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    norm_eps: float = 1e-5
    # block index whose OUTPUT becomes the image features (negative ok;
    # llava convention: -2). None -> post-layernormed final output.
    select_layer: Optional[int] = -2
    dtype: object = jnp.bfloat16
    param_dtype: object = jnp.float32

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    def to_dict(self):
        d = dataclasses.asdict(self)
        d["dtype"] = jnp.dtype(self.dtype).name
        d["param_dtype"] = jnp.dtype(self.param_dtype).name
        return d


class ViTBlock(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        B, N, H = x.shape
        nh = cfg.num_heads
        D = H // nh
        dense = lambda f, name: QuantDense(  # noqa: E731
            f, use_bias=True, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            name=name,
        )
        h = nn.LayerNorm(epsilon=cfg.norm_eps, dtype=cfg.dtype,
                         param_dtype=cfg.param_dtype, name="layer_norm1")(x)
        q = dense(H, "q_proj")(h).reshape(B, N, nh, D)
        k = dense(H, "k_proj")(h).reshape(B, N, nh, D)
        v = dense(H, "v_proj")(h).reshape(B, N, nh, D)
        s = jnp.einsum("bthd,bshd->bhts", q, k,
                       preferred_element_type=jnp.float32)
        s = s / jnp.sqrt(jnp.float32(D))
        p = nn.softmax(s, axis=-1).astype(cfg.dtype)
        o = jnp.einsum("bhts,bshd->bthd", p, v).reshape(B, N, H)
        x = x + dense(H, "out_proj")(o)

        h2 = nn.LayerNorm(epsilon=cfg.norm_eps, dtype=cfg.dtype,
                          param_dtype=cfg.param_dtype, name="layer_norm2")(x)
        h2 = dense(cfg.intermediate_size, "fc1")(h2)
        h2 = nn.gelu(h2, approximate=False)
        return x + dense(H, "fc2")(h2)


class VisionTransformer(nn.Module):
    """pixel_values [B, H, W, 3] (feature-last) -> patch features
    [B, num_patches, hidden] at ``select_layer`` (CLS dropped — the llava
    projector consumes patch tokens only)."""

    cfg: ViTConfig

    @nn.compact
    def __call__(self, pixel_values):
        cfg = self.cfg
        B = pixel_values.shape[0]
        p = cfg.patch_size
        x = QuantConv(
            cfg.hidden_size, kernel_size=(p, p), strides=(p, p),
            padding="VALID", use_bias=False, dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, name="patch_embedding",
        )(pixel_values.astype(cfg.dtype))
        x = x.reshape(B, -1, cfg.hidden_size)  # [B, N, H]
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02),
            (cfg.hidden_size,), cfg.param_dtype,
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(cfg.dtype)[None, None],
                              (B, 1, cfg.hidden_size)), x], axis=1,
        )
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (cfg.num_patches + 1, cfg.hidden_size), cfg.param_dtype,
        )
        x = x + pos.astype(cfg.dtype)[None]
        x = nn.LayerNorm(epsilon=cfg.norm_eps, dtype=cfg.dtype,
                         param_dtype=cfg.param_dtype, name="pre_layernorm")(x)

        sel = cfg.select_layer
        if sel is not None and sel < 0:
            sel = cfg.num_layers + sel
        feats = None
        for i in range(cfg.num_layers):
            x = ViTBlock(cfg, name=f"layers_{i}")(x)
            if sel is not None and i == sel:
                feats = x
                break  # blocks past the tap are dead compute (llava -2)
        if feats is None:  # select_layer=None: post-layernormed final
            feats = nn.LayerNorm(epsilon=cfg.norm_eps, dtype=cfg.dtype,
                                 param_dtype=cfg.param_dtype,
                                 name="post_layernorm")(x)
        return feats[:, 1:]  # drop CLS
