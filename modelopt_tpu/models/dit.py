"""Diffusion transformer (DiT) family — the diffusion-model surface of the
framework (reference counterpart: examples/diffusers + the diffusion paths
of unified_export_hf.py:1199; the reference quantizes HF UNet/DiT pipelines,
here the architecture is native and quantization-aware from the start).

A DiT is a transformer over image patches with adaLN-Zero conditioning on
(timestep, class); every projection is a Quant* layer so the whole
quantization stack (PTQ presets, calibration algorithms, compress, QAT)
applies unchanged. A minimal DDIM sampler is included for end-to-end tests.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.layers import QuantDense
from ..nn.quantizer import TensorQuantizer
from ..sparsity.vsa import VSAConfig, video_sparse_attention


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    image_size: int = 32
    patch_size: int = 4
    in_channels: int = 4
    hidden_size: int = 256
    num_layers: int = 6
    num_heads: int = 8
    mlp_ratio: float = 4.0
    num_classes: int = 10
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    # VSA (video sparse attention, T=1 for images): replaces the dense
    # self-attention in every block with the two-branch top-K tile form +
    # a learned per-channel compression gate (sparsity/vsa.py; reference:
    # sparsity/attention_sparsity/methods/vsa.py)
    vsa: Optional[VSAConfig] = None

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def timestep_embedding(t, dim: int):
    half = dim // 2
    freqs = jnp.exp(-jnp.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class DiTBlock(nn.Module):
    cfg: DiTConfig

    @nn.compact
    def __call__(self, x, c):
        """x [B, N, H]; c [B, H] conditioning."""
        cfg = self.cfg
        H = cfg.hidden_size
        # adaLN-Zero: 6 modulation vectors from the conditioning
        mod = QuantDense(6 * H, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                         name="adaLN")(nn.silu(c))
        sh1, sc1, g1, sh2, sc2, g2 = jnp.split(mod[:, None, :], 6, axis=-1)

        h = nn.LayerNorm(use_bias=False, use_scale=False, dtype=cfg.dtype)(x)
        h = h * (1 + sc1) + sh1
        # self-attention
        nh, hd = cfg.num_heads, H // cfg.num_heads
        qkv = QuantDense(3 * H, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                         name="qkv_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        B, N, _ = h.shape
        q = TensorQuantizer(name="q_quantizer")(q.reshape(B, N, nh, hd))
        k = TensorQuantizer(name="k_quantizer")(k.reshape(B, N, nh, hd))
        v = TensorQuantizer(name="v_quantizer")(v.reshape(B, N, nh, hd))
        if cfg.vsa is not None:
            side = cfg.image_size // cfg.patch_size
            gate = self.param(
                "gate_compress",
                nn.initializers.constant(cfg.vsa.gate_init), (nh, hd),
                cfg.param_dtype)
            o = video_sparse_attention(
                q, k, v, video_shape=(1, side, side), config=cfg.vsa,
                gate_compress=jnp.broadcast_to(
                    gate.astype(jnp.float32), (B, N, nh, hd)),
            ).reshape(B, N, H)
        else:
            attn = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                              preferred_element_type=jnp.float32) / jnp.sqrt(hd)
            p = jax.nn.softmax(attn, axis=-1).astype(cfg.dtype)
            o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, N, H)
        o = QuantDense(H, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="o_proj")(o)
        x = x + g1 * o

        h = nn.LayerNorm(use_bias=False, use_scale=False, dtype=cfg.dtype)(x)
        h = h * (1 + sc2) + sh2
        inner = int(H * cfg.mlp_ratio)
        h = QuantDense(inner, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="fc_in")(h)
        h = nn.gelu(h)
        h = QuantDense(H, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="fc_out")(h)
        return x + g2 * h


class DiT(nn.Module):
    """__call__(x [B, Hs, Ws, C], t [B], y [B]) -> predicted noise [B, Hs, Ws, C].

    Cache-diffusion hooks (reference: examples/diffusers/cache_diffusion —
    DeepCache-style reuse of deep-block outputs across sampler steps):
    ``shallow=k`` splits the block stack after block k. With
    ``deep_delta=None`` the full stack runs and the call ALSO returns the
    deep-stack residual (h_full - h_shallow) for caching; with a cached
    ``deep_delta`` the deep blocks are skipped entirely (the jitted partial
    program never traces them) and the delta is spliced in."""

    cfg: DiTConfig

    @nn.compact
    def __call__(self, x, t, y, deep_delta=None, shallow: Optional[int] = None):
        cfg = self.cfg
        B, Hs, Ws, C = x.shape
        P = cfg.patch_size
        H = cfg.hidden_size
        # patchify
        xp = x.reshape(B, Hs // P, P, Ws // P, P, C).transpose(0, 1, 3, 2, 4, 5)
        xp = xp.reshape(B, cfg.num_patches, P * P * C)
        h = QuantDense(H, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="patch_embed")(xp)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, cfg.num_patches, H), cfg.param_dtype)
        h = h + pos.astype(h.dtype)

        temb = QuantDense(H, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="t_embed")(
            timestep_embedding(t, 256).astype(cfg.dtype)
        )
        yemb = nn.Embed(cfg.num_classes + 1, H, param_dtype=cfg.param_dtype,
                        name="y_embed")(y).astype(cfg.dtype)
        c = temb + yemb

        n_shallow = cfg.num_layers if shallow is None else int(shallow)
        for i in range(n_shallow):
            h = DiTBlock(cfg, name=f"blocks_{i}")(h, c)
        delta = None
        if shallow is not None and deep_delta is not None:
            h = h + deep_delta.astype(h.dtype)  # cached deep-stack residual
        else:
            h_shallow = h
            for i in range(n_shallow, cfg.num_layers):
                h = DiTBlock(cfg, name=f"blocks_{i}")(h, c)
            if shallow is not None:
                delta = h - h_shallow

        h = nn.LayerNorm(use_bias=False, use_scale=False, dtype=cfg.dtype)(h)
        out = QuantDense(P * P * C, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                         name="final_proj")(h)
        out = out.reshape(B, Hs // P, Ws // P, P, P, C).transpose(0, 1, 3, 2, 4, 5)
        out = out.reshape(B, Hs, Ws, C)
        return (out, delta) if delta is not None else out


def ddim_sample(bundle, key, num_steps: int = 8, batch: int = 2,
                y: Optional[jnp.ndarray] = None, guidance: float = 0.0):
    """Minimal DDIM sampler over a (possibly quantized) DiT bundle."""
    cfg = bundle.module.cfg
    shape = (batch, cfg.image_size, cfg.image_size, cfg.in_channels)
    x = jax.random.normal(key, shape, jnp.float32)
    if y is None:
        y = jnp.zeros((batch,), jnp.int32)
    fn = jax.jit(bundle.make_fn())
    ts = jnp.linspace(999, 0, num_steps).astype(jnp.int32)
    alphas = jnp.linspace(0.999, 0.01, 1000)
    for i in range(num_steps):
        t = jnp.full((batch,), ts[i], jnp.int32)
        eps = fn(bundle.variables, x.astype(cfg.dtype), t, y).astype(jnp.float32)
        a_t = alphas[ts[i]]
        a_prev = alphas[ts[i + 1]] if i + 1 < num_steps else jnp.float32(1.0)
        x0 = (x - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
        x = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1 - a_prev) * eps
    return x


def dit_config_s(**overrides) -> DiTConfig:
    """DiT-S-ish test config."""
    base = dict(image_size=16, patch_size=4, in_channels=4, hidden_size=128,
                num_layers=3, num_heads=4)
    base.update(overrides)
    return DiTConfig(**base)
