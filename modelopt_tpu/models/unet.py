"""UNet diffusion family (SDXL-class) — the conv/UNet half of the
diffusion surface next to models/dit.py (reference counterpart: the
diffusers UNet2DConditionModel pipelines the reference quantizes in
examples/diffusers/quantization, and the SDXL INT8/FP8 rows of
examples/benchmark.md:47-51; re-built here as a native, quantization-aware
linen module).

Design:
  * feature-last NHWC everywhere (TPU conv layout); every conv/linear is
    a Quant* layer so the full stack (PTQ presets, calibration, compress,
    QAT) applies unchanged;
  * config-driven: ``block_out_channels``/``transformer_layers_per_block``
    reproduce the SDXL base topology (320/640/1280, depth 0/2/10) or any
    smaller test instance;
  * cross-attention conditioning on a text-context sequence + pooled
    time/label embeddings;
  * DeepCache-style split for fastgen/cache_diffusion.py: the full pass
    can also emit the DEEP feature (input of the last up-block); a cached
    pass recomputes only conv_in + the top down/up level and splices the
    cached deep feature in — two compiled programs, no traced-and-skipped
    branches.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..nn.layers import QuantConv, QuantDense
from .dit import timestep_embedding


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    image_size: int = 64              # latent spatial size
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280)
    layers_per_block: int = 2
    # transformer depth per level (0 = plain resnet level, SDXL: 0/2/10)
    transformer_layers_per_block: Tuple[int, ...] = (0, 2, 10)
    attention_head_dim: int = 64
    context_dim: int = 2048           # text-encoder width (SDXL: 2048)
    context_len: int = 77
    num_classes: int = 0              # optional class conditioning
    groups: int = 32
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @property
    def temb_dim(self) -> int:
        return self.block_out_channels[0] * 4


def sdxl_base_config(**overrides) -> UNetConfig:
    """SDXL-base UNet topology (2.6B params)."""
    base = dict(
        image_size=128, block_out_channels=(320, 640, 1280),
        layers_per_block=2, transformer_layers_per_block=(0, 2, 10),
        attention_head_dim=64, context_dim=2048,
    )
    base.update(overrides)
    return UNetConfig(**base)


def tiny_unet_test_config(**overrides) -> UNetConfig:
    base = dict(
        image_size=16, block_out_channels=(32, 64),
        layers_per_block=1, transformer_layers_per_block=(0, 1),
        attention_head_dim=16, context_dim=32, context_len=8, groups=8,
        dtype=jnp.float32, param_dtype=jnp.float32,
    )
    base.update(overrides)
    return UNetConfig(**base)


class ResBlock(nn.Module):
    cfg: UNetConfig
    out_ch: int

    @nn.compact
    def __call__(self, x, temb):
        cfg = self.cfg
        g = min(cfg.groups, x.shape[-1])
        h = nn.GroupNorm(num_groups=g, dtype=jnp.float32,
                         name="norm1")(x.astype(jnp.float32))
        h = QuantConv(self.out_ch, (3, 3), dtype=cfg.dtype,
                      param_dtype=cfg.param_dtype,
                      name="conv1")(nn.silu(h).astype(cfg.dtype))
        t = QuantDense(self.out_ch, dtype=cfg.dtype,
                       param_dtype=cfg.param_dtype,
                       name="time_emb_proj")(nn.silu(temb))
        h = h + t[:, None, None, :]
        g2 = min(cfg.groups, self.out_ch)
        h = nn.GroupNorm(num_groups=g2, dtype=jnp.float32,
                         name="norm2")(h.astype(jnp.float32))
        h = QuantConv(self.out_ch, (3, 3), dtype=cfg.dtype,
                      param_dtype=cfg.param_dtype,
                      name="conv2")(nn.silu(h).astype(cfg.dtype))
        if x.shape[-1] != self.out_ch:
            x = QuantConv(self.out_ch, (1, 1), dtype=cfg.dtype,
                          param_dtype=cfg.param_dtype,
                          name="conv_shortcut")(x.astype(cfg.dtype))
        return x.astype(cfg.dtype) + h


class _MHA(nn.Module):
    cfg: UNetConfig
    width: int

    @nn.compact
    def __call__(self, x, kv):
        cfg = self.cfg
        D = cfg.attention_head_dim
        H = self.width // D
        B, T, _ = x.shape
        dense = lambda w, name: QuantDense(  # noqa: E731
            w, use_bias=False, dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, name=name)
        q = dense(H * D, "to_q")(x).reshape(B, T, H, D)
        k = dense(H * D, "to_k")(kv).reshape(B, kv.shape[1], H, D)
        v = dense(H * D, "to_v")(kv).reshape(B, kv.shape[1], H, D)
        s = jnp.einsum("bthd,bshd->bhts", q, k,
                       preferred_element_type=jnp.float32) / (D ** 0.5)
        p = nn.softmax(s, axis=-1).astype(cfg.dtype)
        o = jnp.einsum("bhts,bshd->bthd", p, v).reshape(B, T, H * D)
        return dense(self.width, "to_out")(o)


class TransformerBlock(nn.Module):
    """Spatial transformer: 1x1 in/out proj around depth x (self-attn,
    cross-attn on the text context, geglu FF) — the SDXL block shape."""

    cfg: UNetConfig
    depth: int

    @nn.compact
    def __call__(self, x, context):
        cfg = self.cfg
        B, Hh, Ww, C = x.shape
        g = min(cfg.groups, C)
        h = nn.GroupNorm(num_groups=g, dtype=jnp.float32,
                         name="norm")(x.astype(jnp.float32))
        h = QuantDense(C, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                       name="proj_in")(h.astype(cfg.dtype))
        h = h.reshape(B, Hh * Ww, C)
        ln = lambda name: nn.LayerNorm(dtype=jnp.float32, name=name)  # noqa: E731
        for i in range(self.depth):
            hn = ln(f"blocks_{i}_norm1")(h.astype(jnp.float32)).astype(cfg.dtype)
            h = h + _MHA(cfg, C, name=f"blocks_{i}_attn1")(hn, hn)
            hn = ln(f"blocks_{i}_norm2")(h.astype(jnp.float32)).astype(cfg.dtype)
            h = h + _MHA(cfg, C, name=f"blocks_{i}_attn2")(hn, context)
            hn = ln(f"blocks_{i}_norm3")(h.astype(jnp.float32)).astype(cfg.dtype)
            gate_up = QuantDense(8 * C, dtype=cfg.dtype,
                                 param_dtype=cfg.param_dtype,
                                 name=f"blocks_{i}_ff_in")(hn)
            a, b = jnp.split(gate_up, 2, axis=-1)
            h = h + QuantDense(C, dtype=cfg.dtype,
                               param_dtype=cfg.param_dtype,
                               name=f"blocks_{i}_ff_out")(a * nn.gelu(b))
        h = h.reshape(B, Hh, Ww, C)
        h = QuantDense(C, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                       name="proj_out")(h)
        return x + h


class UNet(nn.Module):
    """__call__(x [B,H,W,C], t [B], y [B] | None, context [B,L,Cd] | None,
    deep_feats=None, shallow=None) -> eps [B,H,W,C] (or (eps, deep) when
    ``shallow`` is not None — the cache_diffusion refresh contract)."""

    cfg: UNetConfig

    @nn.compact
    def __call__(self, x, t, y=None, context=None, deep_feats=None,
                 shallow=None, deep_delta=None):
        cfg = self.cfg
        if deep_feats is None and deep_delta is not None:
            deep_feats = deep_delta  # DiT-compatible kwarg name
        chans = cfg.block_out_channels
        L = len(chans)
        if context is None:
            context = jnp.zeros((x.shape[0], cfg.context_len,
                                 cfg.context_dim), cfg.dtype)
        context = QuantDense(chans[-1], use_bias=False, dtype=cfg.dtype,
                             param_dtype=cfg.param_dtype,
                             name="context_proj")(context.astype(cfg.dtype))

        temb = timestep_embedding(t, chans[0]).astype(cfg.dtype)
        temb = QuantDense(cfg.temb_dim, dtype=cfg.dtype,
                          param_dtype=cfg.param_dtype,
                          name="time_fc1")(temb)
        temb = QuantDense(cfg.temb_dim, dtype=cfg.dtype,
                          param_dtype=cfg.param_dtype,
                          name="time_fc2")(nn.silu(temb))
        if cfg.num_classes and y is not None:
            yemb = nn.Embed(cfg.num_classes, cfg.temb_dim,
                            param_dtype=cfg.param_dtype,
                            name="class_emb")(y)
            temb = temb + yemb.astype(cfg.dtype)

        h = QuantConv(chans[0], (3, 3), dtype=cfg.dtype,
                      param_dtype=cfg.param_dtype, name="conv_in")(
            x.astype(cfg.dtype))

        # ---- down path (level 0 always runs; deeper levels skipped on
        # cached passes) ------------------------------------------------
        skips0 = [h]
        for j in range(cfg.layers_per_block):
            h = ResBlock(cfg, chans[0], name=f"down_0_res_{j}")(h, temb)
            if cfg.transformer_layers_per_block[0]:
                h = TransformerBlock(
                    cfg, cfg.transformer_layers_per_block[0],
                    name=f"down_0_tf_{j}")(h, context)
            skips0.append(h)
        top_feat = h

        if deep_feats is None:
            skips = list(skips0)
            for lvl in range(1, L):
                h = QuantConv(chans[lvl - 1], (3, 3), strides=(2, 2),
                              dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                              name=f"down_{lvl}_sample")(h)
                skips.append(h)
                for j in range(cfg.layers_per_block):
                    h = ResBlock(cfg, chans[lvl],
                                 name=f"down_{lvl}_res_{j}")(h, temb)
                    if cfg.transformer_layers_per_block[lvl]:
                        h = TransformerBlock(
                            cfg, cfg.transformer_layers_per_block[lvl],
                            name=f"down_{lvl}_tf_{j}")(h, context)
                    skips.append(h)

            # ---- mid ---------------------------------------------------
            h = ResBlock(cfg, chans[-1], name="mid_res_0")(h, temb)
            if cfg.transformer_layers_per_block[-1]:
                h = TransformerBlock(cfg, cfg.transformer_layers_per_block[-1],
                                     name="mid_tf")(h, context)
            h = ResBlock(cfg, chans[-1], name="mid_res_1")(h, temb)

            # ---- up path, deeper levels --------------------------------
            for lvl in range(L - 1, 0, -1):
                for j in range(cfg.layers_per_block + 1):
                    h = jnp.concatenate([h, skips.pop()], axis=-1)
                    h = ResBlock(cfg, chans[lvl],
                                 name=f"up_{lvl}_res_{j}")(h, temb)
                    if cfg.transformer_layers_per_block[lvl]:
                        h = TransformerBlock(
                            cfg, cfg.transformer_layers_per_block[lvl],
                            name=f"up_{lvl}_tf_{j}")(h, context)
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                h = QuantConv(chans[lvl], (3, 3), dtype=cfg.dtype,
                              param_dtype=cfg.param_dtype,
                              name=f"up_{lvl}_sample")(h)
            deep = h  # input of the top up-level: the DeepCache boundary
        else:
            deep = deep_feats
            h = deep

        # ---- top up-level (always runs) --------------------------------
        for j in range(cfg.layers_per_block + 1):
            h = jnp.concatenate([h, skips0.pop()], axis=-1)
            h = ResBlock(cfg, chans[0], name=f"up_0_res_{j}")(h, temb)
            if cfg.transformer_layers_per_block[0]:
                h = TransformerBlock(
                    cfg, cfg.transformer_layers_per_block[0],
                    name=f"up_0_tf_{j}")(h, context)

        g = min(cfg.groups, h.shape[-1])
        h = nn.GroupNorm(num_groups=g, dtype=jnp.float32,
                         name="norm_out")(h.astype(jnp.float32))
        eps = QuantConv(cfg.out_channels, (3, 3), dtype=cfg.dtype,
                        param_dtype=cfg.param_dtype,
                        name="conv_out")(nn.silu(h).astype(cfg.dtype))
        del top_feat
        if shallow is not None:
            return eps, deep
        return eps
