"""Generic quantization-aware decoder-only transformer.

One implementation covers the reference's main LLM model families via config:
GPT-2 (LayerNorm / learned positions / GELU), Llama & TinyLlama & Qwen-style
(RMSNorm / RoPE / SwiGLU / GQA), and Mixtral-style MoE. The reference
operates on HF torch models in place; here the architectures are native
linen modules built from Quant* layers, and HF checkpoints are imported into
them (models/hf_import.py).

TPU-first choices:
  * static-shape KV cache (decode updates via dynamic_update_slice) so the
    whole decode step jits to one XLA program;
  * attention in einsum form with fp32 softmax — XLA maps the matmuls to the
    MXU; a Pallas flash/quantized-KV kernel can be swapped in via
    ``attn_impl`` (kernels/fp8_attention.py);
  * KV quantization points named ``k_quantizer``/``v_quantizer`` on the
    attention (reference: plugins/attention.py:45 KV bmm quantizers).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..nn.layers import LayerNorm1p, QuantDense, QuantEmbed, RMSNorm
from ..nn.quantizer import TensorQuantizer  # noqa: F401 (re-export for models)


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    vocab_size: int = 32000
    hidden_size: int = 2048
    num_layers: int = 16
    num_heads: int = 16
    num_kv_heads: Optional[int] = None  # None = MHA
    head_dim: Optional[int] = None
    intermediate_size: int = 5632
    activation: str = "silu_glu"  # "silu_glu" | "gelu_glu" | "gelu" | "relu2"
    norm: str = "rmsnorm"  # "rmsnorm" | "layernorm" | "layernorm1p"
    # rotary applied to the first fraction of head_dim (Nemotron: 0.5)
    partial_rotary_factor: float = 1.0
    positions: str = "rope"  # "rope" | "learned"
    rope_theta: float = 10000.0
    max_position_embeddings: int = 4096
    attn_bias: bool = False
    mlp_bias: bool = False
    # Qwen3-style per-head RMSNorm on q/k (over head_dim, before RoPE)
    qk_norm: bool = False
    # Llama-4 knobs: weightless L2 q/k norm (after RoPE, rope layers only),
    # NoPE-layer temperature tuning, chunked-causal attention (per layer
    # via layer_plan {"nope": True} / {"chunk": N}), and input-scaled
    # sigmoid routing (router_score="llama4")
    qk_l2norm: bool = False
    attn_temperature_tuning: bool = False
    floor_scale: float = 8192.0
    attn_scale: float = 0.1
    attention_chunk: Optional[int] = None
    # Gemma-family knobs: (1+w) RMSNorm + sandwich (post-attn/post-mlp)
    # norms, sqrt(hidden) embedding scale, fixed query pre-scale, tanh
    # softcaps (gemma2), and the local-attention rope base for sliding
    # layers (layer_plan opts {"local_rope": True})
    norm_style: str = "plain"  # "plain" | "gemma"
    scale_embeddings: bool = False
    query_pre_attn_scalar: Optional[float] = None
    attn_logit_softcap: Optional[float] = None
    final_logit_softcap: Optional[float] = None
    rope_local_base_freq: float = 10000.0
    tie_word_embeddings: bool = False
    norm_eps: float = 1e-5
    # MoE (Mixtral-style); 0 experts = dense MLP
    num_experts: int = 0
    experts_per_token: int = 2
    # DeepSeek-style MoE extensions: always-on shared experts (their own
    # intermediate size = n_shared_experts * moe_intermediate_size), sigmoid
    # router scoring (V3), and dense MLPs for the first k layers
    n_shared_experts: int = 0
    router_score: str = "softmax"  # "softmax" | "sigmoid" (DeepSeek-V3)
    first_k_dense: int = 0
    moe_intermediate_size: Optional[int] = None  # None = intermediate_size
    # DeepSeek routing fidelity knobs (HF DeepseekV2MoEGate/V3TopkRouter):
    # group-limited top-k (n_group/topk_group), weight renormalization over
    # the selected set, post-scale, and the V3 selection-only bias
    n_group: Optional[int] = None
    topk_group: int = 1
    norm_topk_prob: bool = True
    routed_scaling_factor: float = 1.0
    router_correction_bias: bool = False
    # gpt-oss-style MoE: clamped swiglu (alpha=1.702, limit=7), expert and
    # router biases
    moe_activation: str = "silu_glu"  # "silu_glu" | "swiglu_oai"
    moe_bias: bool = False
    router_bias: bool = False
    # gpt-oss learned attention sinks: one trainable logit per q head joins
    # every softmax (an always-available "attend to nothing" slot)
    attention_sinks: bool = False
    # RoPE frequency scaling, as a hashable tuple of (key, value) pairs,
    # e.g. (("rope_type","yarn"),("factor",32.0),
    #       ("original_max_position_embeddings",4096)); None = plain RoPE
    rope_scaling: Optional[tuple] = None
    # Multi-head Latent Attention (DeepSeek V2/V3, models/mla.py): the KV
    # cache stores one shared latent row [kv_lora_rank + qk_rope_head_dim]
    # per token instead of per-head K/V
    attention_type: str = "mha"  # "mha" | "mla"
    q_lora_rank: Optional[int] = None  # None = direct q projection
    kv_lora_rank: int = 0
    qk_nope_head_dim: int = 0
    qk_rope_head_dim: int = 0
    v_head_dim: Optional[int] = None
    # sliding-window attention sparsity (None = full causal); with
    # ``attention_sink`` initial positions always attended
    # (reference analogue: sparsity/attention_sparsity sliding-block methods)
    attention_window: Optional[int] = None
    attention_sink: int = 0
    # serving-oriented fusions: single qkv_proj / gate_up_proj GEMMs — fewer,
    # larger MXU calls (the reference's deployment engines fuse these too;
    # its resmoothing exists exactly to enable it, quant_utils.py:1339)
    fused_qkv: bool = False
    fused_gate_up: bool = False
    # EAGLE-3-style feature taps: layer indices whose post-block hidden
    # states are concatenated (with the final hidden) into the
    # ``output_hidden`` return — consumed by speculative/eagle.py
    hidden_taps: Optional[tuple] = None
    # heterogeneous per-layer plan (Puzzletron-style): tuple with one entry
    # per layer, each a tuple of (key, value) pairs from
    # {("no_attn", True), ("ffn", <int>)}; () keeps the layer unchanged
    # (reference analogue: puzzletron anymodel block descriptors)
    layer_plan: Optional[tuple] = None
    # data-dependent attention sparsity (calibrated skip-softmax): a frozen
    # sparsity.skip_softmax.SkipSoftmaxConfig, or None. Decode steps then
    # attend only KV blocks whose Quest-style score upper bound survives the
    # calibrated threshold (kernels/block_sparse_attention.py)
    skip_softmax: Optional[Any] = None
    # Hybrid Mamba2/attention pattern (Nemotron-H / Mamba-MoE class;
    # reference: megatron hybrid_override_pattern in
    # prune/plugins/mcore_minitron.py:215): one char per layer, "M" =
    # Mamba2 mixer (models/ssm.py), anything else = attention. Combine
    # with layer_plan {"no_mlp": True} for mixer-only (pure-Mamba2)
    # blocks. None = all-attention.
    hybrid_pattern: Optional[str] = None
    mamba_num_heads: int = 0
    mamba_head_dim: int = 64
    mamba_state_dim: int = 64
    mamba_groups: int = 1
    mamba_conv_width: int = 4
    mamba_chunk: int = 64
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    def layer_opts(self, i: int) -> dict:
        if self.layer_plan is None or i >= len(self.layer_plan):
            return {}
        return dict(self.layer_plan[i])

    def is_mamba(self, i: int) -> bool:
        return (self.hybrid_pattern is not None
                and i < len(self.hybrid_pattern)
                and self.hybrid_pattern[i] == "M")

    @property
    def kv_heads(self) -> int:
        return self.num_kv_heads or self.num_heads

    @property
    def dims_per_head(self) -> int:
        return self.head_dim or self.hidden_size // self.num_heads


def make_cache(cfg: DecoderConfig, batch: int, max_len: int, dtype=None):
    """Allocate a static-shape KV cache pytree.

    ``lengths`` tracks each slot's sequence length independently so a
    continuous-batching engine can run slots at different positions in one
    jitted decode step. ``dtype`` may be ``jnp.float8_e4m3fn`` for a real
    quantized KV cache (pair with a *k/v_quantizer fp8 config).

    Layout: per-layer TUPLES of [batch, max_len, kv_heads * head_dim]
    arrays rather than one stacked [L, ...] array — a stacked cache forces
    XLA to re-materialize the whole cache every step when the per-layer
    updates are re-stacked (measured ~1.6 ms/step at 8B bs16). Heads are
    MERGED into the minor (lane) dim: Mosaic tiles the last two dims, and
    1-byte dtypes tile (32, 128), so a [.., kv_heads, head_dim] layout puts
    kv_heads (typically 8) on the sublane axis and every fp8/int8 DMA moves
    4x the bytes (73 GB/s effective vs 698 measured on v5e). With the merge,
    cache rows are dense full tiles for every storage dtype, per-token
    writes are leading-dim DMA slices, and the decode-attention kernels
    read the cache in place (kernels/attention.py).

    Pass the cache through jitted decode steps with ``donate_argnums`` —
    otherwise XLA keeps the input cache alive and the update copies the
    entire cache every step (~6 ms at 8B bs64)."""
    dtype = dtype or cfg.dtype

    if cfg.attention_type == "mla":
        # one shared latent row per token (models/mla.py), padded to full
        # 128-lane tiles so cache writes stay dense leading-dim DMAs; the
        # "v" slot is an empty placeholder keeping the cache pytree uniform
        dc = cfg.kv_lora_rank + cfg.qk_rope_head_dim
        dc_pad = -(-dc // 128) * 128
        return {
            "k": tuple(jnp.zeros((batch, max_len, dc_pad), dtype)
                       for _ in range(cfg.num_layers)),
            "v": tuple(jnp.zeros((batch, max_len, 0), dtype)
                       for _ in range(cfg.num_layers)),
            "lengths": jnp.zeros((batch,), jnp.int32),
        }

    def shape_for(i):
        # heterogeneous plans may reduce a layer's KV heads or drop its
        # attention entirely (1 dummy head keeps the pytree uniform)
        opts = cfg.layer_opts(i)
        kv = 1 if "no_attn" in opts else int(opts.get("kv", cfg.kv_heads))
        return (batch, max_len, kv * cfg.dims_per_head)

    def slot(i, which):
        # Mamba2 layers keep O(1) state instead of a KV cache: the "k"
        # slot holds the rolling conv window (model dtype — raw pre-conv
        # activations), the "v" slot the f32 [nh, N*P] SSM state. KV
        # dtype overrides (fp8/int8 caches) never touch them.
        if cfg.is_mamba(i):
            from .ssm import mamba_cache_shapes

            conv_sh, ssm_sh = mamba_cache_shapes(cfg, batch)
            if which == "k":
                return jnp.zeros(conv_sh, cfg.dtype)
            return jnp.zeros(ssm_sh, jnp.float32)
        return jnp.zeros(shape_for(i), dtype)

    cache = {
        "k": tuple(slot(i, "k") for i in range(cfg.num_layers)),
        "v": tuple(slot(i, "v") for i in range(cfg.num_layers)),
        "lengths": jnp.zeros((batch,), jnp.int32),
    }
    if cfg.skip_softmax is not None:
        from ..sparsity.skip_softmax import init_block_summaries

        bs = cfg.skip_softmax.block_size
        if max_len % bs != 0:
            raise ValueError(f"max_len {max_len} not divisible by "
                             f"skip_softmax block_size {bs}")
        kmax, kmin = init_block_summaries(
            batch, max_len, cfg.kv_heads, cfg.dims_per_head, bs
        )
        cache["kmax"] = tuple(kmax for _ in range(cfg.num_layers))
        cache["kmin"] = tuple(kmin for _ in range(cfg.num_layers))
    return cache


def _yarn_get_mscale(scale: float, mscale: float = 1.0) -> float:
    """YaRN attention-magnitude correction (arXiv:2309.00071 eq. 22)."""
    import math

    if scale <= 1:
        return 1.0
    return 0.1 * mscale * math.log(scale) + 1.0


def _yarn_inv_freq(d: int, theta: float, scaling: dict):
    """YaRN-scaled inverse frequencies + cos/sin attention factor
    (public formula, arXiv:2309.00071; matches HF _compute_yarn_parameters
    with truncate=True). Returns (inv_freq [d//2] numpy, attention_factor)."""
    import math

    factor = float(scaling["factor"])
    original_max = int(scaling.get("original_max_position_embeddings", 4096))
    beta_fast = float(scaling.get("beta_fast", 32))
    beta_slow = float(scaling.get("beta_slow", 1))
    truncate = bool(scaling.get("truncate", True))
    attention_factor = scaling.get("attention_factor")
    if attention_factor is None:
        mscale = scaling.get("mscale")
        mscale_all = scaling.get("mscale_all_dim")
        if mscale and mscale_all:
            attention_factor = (_yarn_get_mscale(factor, mscale)
                                / _yarn_get_mscale(factor, mscale_all))
        else:
            attention_factor = _yarn_get_mscale(factor)

    pos_freqs = theta ** (np.arange(0, d, 2, dtype=np.float64) / d)
    inv_extra = 1.0 / pos_freqs
    inv_inter = 1.0 / (factor * pos_freqs)

    def corr_dim(rot):
        return d * math.log(original_max / (rot * 2 * math.pi)) / (2 * math.log(theta))

    low, high = corr_dim(beta_fast), corr_dim(beta_slow)
    if truncate:
        low, high = math.floor(low), math.ceil(high)
    low, high = max(low, 0), min(high, d - 1)
    ramp = np.clip((np.arange(d // 2, dtype=np.float64) - low) / max(high - low, 1e-3), 0, 1)
    extra_factor = 1.0 - ramp
    inv_freq = inv_inter * (1 - extra_factor) + inv_extra * extra_factor
    return inv_freq.astype(np.float32), float(attention_factor)


def _rope(x, positions, theta, scaling=None):
    """Rotary embeddings, interleaved-pair convention (Llama); ``scaling``
    is an optional (key, value)-pair tuple for YaRN context extension."""
    d = x.shape[-1]
    half = d // 2
    mscale = 1.0
    if scaling is not None:
        sdict = dict(scaling)
        if sdict.get("rope_type") == "yarn":
            inv, mscale = _yarn_inv_freq(d, theta, sdict)
            freq = jnp.asarray(inv)
        elif sdict.get("rope_type") == "linear":
            freq = 1.0 / (float(sdict["factor"])
                          * theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
        elif sdict.get("rope_type") == "llama3":
            # Llama-3.1+ context extension (public formula, HF
            # _compute_llama3_parameters): low-frequency bands divide by
            # factor, high-frequency bands keep, smooth ramp between
            import math

            factor = float(sdict["factor"])
            lowf = float(sdict.get("low_freq_factor", 1.0))
            highf = float(sdict.get("high_freq_factor", 4.0))
            old_ctx = float(sdict.get("original_max_position_embeddings", 8192))
            base_freq = 1.0 / (theta ** (np.arange(0, half, dtype=np.float64) / half))
            wavelen = 2 * math.pi / base_freq
            smooth = (old_ctx / wavelen - lowf) / (highf - lowf)
            smoothed = (1 - smooth) * base_freq / factor + smooth * base_freq
            out_f = np.where(wavelen > old_ctx / lowf, base_freq / factor,
                             np.where(wavelen < old_ctx / highf, base_freq,
                                      smoothed))
            freq = jnp.asarray(out_f.astype(np.float32))
        elif sdict.get("rope_type") == "longrope":
            # Phi-3/4: per-dim extension factors; the factor set is a
            # STATIC choice here (long iff the config's max position
            # exceeds the original pretraining length) — jitted decode
            # cannot switch on runtime sequence length
            import math

            orig = int(sdict.get("original_max_position_embeddings", 4096))
            use_long = bool(sdict.get("use_long_factors", False))
            ext = jnp.asarray(
                sdict["long_factor"] if use_long else sdict["short_factor"],
                jnp.float32,
            )
            freq = 1.0 / (ext * theta ** (jnp.arange(0, half, dtype=jnp.float32) * 2 / d))
            f = float(sdict.get("factor") or 1.0)
            mscale = float(sdict.get("attention_factor") or (
                1.0 if f <= 1.0 else math.sqrt(1 + math.log(f) / math.log(orig))
            ))
        else:
            freq = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    else:
        freq = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    angles = positions[..., None].astype(jnp.float32) * freq  # [B,T,half]
    cos = jnp.cos(angles)[:, :, None, :] * mscale  # [B,T,1,half]
    sin = jnp.sin(angles)[:, :, None, :] * mscale
    x1, x2 = x[..., :half], x[..., half:]
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


class Attention(nn.Module):
    cfg: DecoderConfig

    @nn.compact
    def __call__(self, x, positions, mask, cache_kv=None, flash_ok=True):
        """cache_kv: None or (k_cache, v_cache, index) with static shapes.
        Returns (out, new_kv) where new_kv is None without cache.
        ``flash_ok=False`` forces the einsum path for cached T>1 forwards
        whose mask is NOT plain position-causal (tree verify)."""
        cfg = self.cfg
        H, KH, D = cfg.num_heads, cfg.kv_heads, cfg.dims_per_head
        B, T, _ = x.shape
        dense = lambda feats, name: QuantDense(  # noqa: E731
            feats, use_bias=cfg.attn_bias, dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, name=name,
        )
        if cfg.fused_qkv:
            qkv = dense((H + 2 * KH) * D, "qkv_proj")(x)
            q, k, v = jnp.split(qkv, [H * D, (H + KH) * D], axis=-1)
            q = q.reshape(B, T, H, D)
            k = k.reshape(B, T, KH, D)
            v = v.reshape(B, T, KH, D)
        else:
            q = dense(H * D, "q_proj")(x).reshape(B, T, H, D)
            k = dense(KH * D, "k_proj")(x).reshape(B, T, KH, D)
            v = dense(KH * D, "v_proj")(x).reshape(B, T, KH, D)

        sinks = (
            # gpt-oss learned sinks: one per-head logit joins every softmax
            # (its probability mass is then dropped — an "attend to
            # nothing" slot that damps low-information heads)
            self.param("sinks", nn.initializers.zeros_init(), (H,),
                       cfg.param_dtype)
            if cfg.attention_sinks else None
        )
        if cfg.qk_norm:
            # Qwen3/Gemma3: RMSNorm over head_dim on q/k, before RoPE
            off = 1.0 if cfg.norm_style == "gemma" else 0.0
            q = RMSNorm(epsilon=cfg.norm_eps, dtype=cfg.dtype,
                        scale_offset=off, name="q_norm")(q)
            k = RMSNorm(epsilon=cfg.norm_eps, dtype=cfg.dtype,
                        scale_offset=off, name="k_norm")(k)
        if cfg.positions == "rope":
            if cfg.partial_rotary_factor < 1.0:
                rd = int(D * cfg.partial_rotary_factor)
                q = jnp.concatenate(
                    [_rope(q[..., :rd], positions, cfg.rope_theta,
                           cfg.rope_scaling), q[..., rd:]], -1)
                k = jnp.concatenate(
                    [_rope(k[..., :rd], positions, cfg.rope_theta,
                           cfg.rope_scaling), k[..., rd:]], -1)
            else:
                q = _rope(q, positions, cfg.rope_theta, cfg.rope_scaling)
                k = _rope(k, positions, cfg.rope_theta, cfg.rope_scaling)
            if cfg.qk_l2norm:
                # Llama-4: weightless L2 norm after RoPE (rope layers only)
                def _l2(x):
                    xf = x.astype(jnp.float32)
                    ms = jnp.mean(jnp.square(xf), -1, keepdims=True)
                    return (xf * jax.lax.rsqrt(ms + 1e-6)).astype(x.dtype)

                q, k = _l2(q), _l2(k)
        elif cfg.positions == "none" and cfg.attn_temperature_tuning:
            # Llama-4 NoPE layers: scale q by a log-position temperature
            # (arXiv:2501.19399) so long-context attention keeps contrast
            ts = jnp.log1p(
                jnp.floor((positions.astype(jnp.float32) + 1.0)
                          / cfg.floor_scale)
            ) * cfg.attn_scale + 1.0
            q = q * ts[:, :, None, None].astype(q.dtype)
        if cfg.query_pre_attn_scalar is not None:
            # Gemma: scores scale by query_pre_attn_scalar**-0.5 instead of
            # head_dim**-0.5 — fold the RATIO into q so every downstream
            # path (Pallas kernels and the einsum, which all divide by
            # sqrt(D)) computes the right scale without plumbing
            q = q * jnp.asarray(
                (D ** 0.5) * (cfg.query_pre_attn_scalar ** -0.5), cfg.dtype
            )

        # KV-cache quantization points: quantize before the cache / BMMs.
        # With an fp8 cache, the quantizers hand back (codes, scale) and the
        # cache stores real e4m3 codes (reference: FP8 KV cache, config
        # FP8_KV_CFG + plugins/attention.py bmm quantizers).
        q = TensorQuantizer(name="q_quantizer")(q)
        kq_mod = TensorQuantizer(name="k_quantizer")
        vq_mod = TensorQuantizer(name="v_quantizer")

        new_kv = None
        page_table = None
        kmax = kmin = None
        if cache_kv is not None:
            if len(cache_kv) == 5:
                # skip-softmax: per-block K summaries ride with the cache
                ck, cv, positions_kv, kmax, kmin = cache_kv
            elif len(cache_kv) == 4:
                # paged: ck/cv are GLOBAL page pools [n_pages, ps, KH, D]
                ck, cv, positions_kv, page_table = cache_kv
            else:
                ck, cv, positions_kv = cache_kv  # ck/cv [B, S_max, KH*D]
            real_fp8 = ck.dtype in (jnp.float8_e4m3fn, jnp.int8)
            if real_fp8:
                k_codes, k_scale = kq_mod(k, with_scale=True)
                v_codes, v_scale = vq_mod(v, with_scale=True)
                if ck.dtype == jnp.int8 and (k_scale is None or v_scale is None):
                    raise ValueError(
                        "an int8 KV cache needs CALIBRATED per-tensor int8 "
                        "k/v quantizers (INT8_KV_CFG) — a scale-1 cast "
                        "would round O(1) keys to {-1, 0, 1}"
                    )
                # no calibrated fp8 KV quantizer (or calib phase): store a
                # direct e4m3 cast (scale 1) — |k| is O(1) so this is safe
                k_scale = jnp.float32(1.0) if k_scale is None else k_scale
                v_scale = jnp.float32(1.0) if v_scale is None else v_scale
            else:
                k_codes, k_scale = kq_mod(k).astype(ck.dtype), None
                v_codes, v_scale = vq_mod(v).astype(cv.dtype), None
            # cache rows merge heads into the lane dim (see make_cache)
            k_rows = k_codes.reshape(B, T, KH * D)
            v_rows = v_codes.reshape(B, T, KH * D)
            if page_table is not None:
                # route each token's KV through the page table: page id +
                # in-page offset are data, so one compiled program serves
                # every page assignment
                from ..kernels.paged_attention import paged_kv_write

                ps = ck.shape[1]
                rows = jnp.arange(B)[:, None]
                pids = page_table[rows, positions_kv // ps]  # [B, T]
                offs = positions_kv % ps
                ck = paged_kv_write(ck, k_rows, pids, offs)
                cv = paged_kv_write(cv, v_rows, pids, offs)
            else:
                from ..kernels.attention import (
                    dense_kv_write,
                    fused_decode_attention,
                    fused_decode_ok,
                )

                start = positions_kv[:, 0]
                Gq = H // KH
                if (T == 1 and cfg.attention_window is None
                        and kmax is None
                        and cfg.attention_chunk is None
                        and fused_decode_ok((B, KH, Gq, D), ck.shape[1],
                                            ck.dtype)):
                    # Fused decode step: the cache write DMA rides behind the
                    # attention compute in ONE kernel (the separate
                    # write+attend pair costs ~0.2 ms/layer of serialized
                    # DMA latency, measured on v5e).
                    qg = q[:, 0].reshape(B, KH, Gq, D)
                    out, ck, cv = fused_decode_attention(
                        qg, k_rows, v_rows, ck, cv, start,
                        k_scale=(k_scale if real_fp8 else None),
                        v_scale=(v_scale if real_fp8 else None),
                        out_dtype=cfg.dtype,
                        sinks=(sinks.reshape(KH, Gq).astype(jnp.float32)
                               if cfg.attention_sinks else None),
                        softcap=cfg.attn_logit_softcap,
                    )
                    out = out.reshape(B, 1, H * D)
                    out = dense(cfg.hidden_size, "o_proj")(out)
                    return out, (ck, cv)
                # per-slot contiguous write at the slot's length, via an
                # explicit Pallas DMA (kernels/attention.py dense_kv_write —
                # XLA scatters compile pathologically for this pattern).
                # Cache positions are always contiguous per slot.
                ck = dense_kv_write(ck, k_rows, start)
                cv = dense_kv_write(cv, v_rows, start)
            new_kv = (ck, cv)
            if kmax is not None:
                # skip-softmax bookkeeping: fold the just-written tokens into
                # their blocks' min/max summaries (real values, so the bound
                # holds regardless of the cache's storage dtype)
                from ..sparsity.skip_softmax import update_block_summaries

                sscfg = cfg.skip_softmax
                k_real = k_codes.astype(jnp.float32)
                if real_fp8:
                    k_real = k_real * k_scale.astype(jnp.float32)
                kmax, kmin = update_block_summaries(
                    kmax, kmin, k_real, positions_kv[:, 0], sscfg.block_size
                )
                new_kv = (ck, cv, kmax, kmin)
                if (T == 1 and cfg.attention_window is None
                        and not cfg.attention_sinks
                        and not cfg.attn_logit_softcap
                        and cfg.attention_chunk is None):
                    from ..kernels.block_sparse_attention import (
                        block_sparse_decode_attention,
                        block_sparse_decode_attention_xla,
                        block_sparse_ok,
                    )
                    from ..sparsity.skip_softmax import select_blocks

                    qg = q[:, 0].reshape(B, KH, H // KH, D)
                    lengths = positions_kv[:, 0] + 1
                    sel, nvalid = select_blocks(qg, kmax, kmin, lengths, sscfg)
                    attend = (
                        block_sparse_decode_attention
                        if block_sparse_ok(B, KH, H // KH, D, sscfg.block_size)
                        else block_sparse_decode_attention_xla
                    )
                    out = attend(
                        qg, ck, cv, sel, nvalid, lengths,
                        k_scale=(k_scale if real_fp8 else None),
                        v_scale=(v_scale if real_fp8 else None),
                        block_size=sscfg.block_size, out_dtype=cfg.dtype,
                    )
                    out = out.reshape(B, 1, H * D)
                    out = dense(cfg.hidden_size, "o_proj")(out)
                    return out, new_kv
        else:
            k = kq_mod(k)
            v = vq_mod(v)

        G = H // KH
        if (cache_kv is not None and page_table is None and T > 1
                and flash_ok and kmax is None
                and cfg.attention_window is None
                and cfg.attention_chunk is None
                and not cfg.attention_sinks and not cfg.attn_logit_softcap):
            # Cached-prefill flash: chunk queries against the whole cache
            # slab without ever materializing [B, KH, G, T, S] scores in
            # HBM (578 MB/layer f32 at bs48/T2176 — the einsum path OOMs
            # the serving prefill and taxes its bandwidth).
            from ..kernels.flash_attention import (
                flash_prefill_attention,
                flash_prefill_ok,
            )

            S_c = new_kv[0].shape[1]
            if flash_prefill_ok(T, S_c, D, new_kv[0].dtype):
                qg5 = q.reshape(B, T, KH, G, D)
                out = flash_prefill_attention(
                    qg5, new_kv[0], new_kv[1], positions_kv[:, 0],
                    k_scale=(k_scale if real_fp8 else None),
                    v_scale=(v_scale if real_fp8 else None),
                    out_dtype=cfg.dtype,
                )
                out = out.reshape(B, T, H * D)
                return dense(cfg.hidden_size, "o_proj")(out), new_kv
        if page_table is not None:
            # Paged decode: Pallas kernel routes DMAs through the page table
            # (no gather); fallback/prefill gathers the pages dense.
            from ..kernels.paged_attention import (
                paged_attention_ok,
                paged_decode_attention,
                paged_gather_dense,
            )

            ps = ck.shape[1]
            if (T == 1 and cfg.attention_window is None
                    and not cfg.attention_sinks
                    and not cfg.attn_logit_softcap
                    and cfg.attention_chunk is None
                    and paged_attention_ok(B, KH, G, D, ps)):
                qg = q[:, 0].reshape(B, KH, G, D)
                lengths = positions[:, 0] + 1
                out = paged_decode_attention(
                    qg, ck, cv, page_table, lengths,
                    k_scale=(k_scale if real_fp8 else None),
                    v_scale=(v_scale if real_fp8 else None),
                    out_dtype=cfg.dtype,
                )
                out = out.reshape(B, 1, H * D)
                out = dense(cfg.hidden_size, "o_proj")(out)
                return out, new_kv
            kg = paged_gather_dense(ck, page_table).reshape(B, -1, KH, D)
            vg = paged_gather_dense(cv, page_table).reshape(B, -1, KH, D)
            if real_fp8:
                k = kg.astype(cfg.dtype) * k_scale.astype(cfg.dtype)
                v = vg.astype(cfg.dtype) * v_scale.astype(cfg.dtype)
            else:
                k, v = kg, vg  # [B, PMAX*ps, KH, D]
        elif cache_kv is not None:
            # einsum fallback wants the per-head 4D view; the lane-merged
            # cache rows reshape back without reordering
            k4 = ck.reshape(B, -1, KH, D)
            v4 = cv.reshape(B, -1, KH, D)
            if real_fp8:
                k = k4.astype(cfg.dtype) * k_scale.astype(cfg.dtype)
                v = v4.astype(cfg.dtype) * v_scale.astype(cfg.dtype)
            else:
                k, v = k4, v4  # [B, S_max, KH, D]

        # Fused decode-attention kernel: reads (possibly fp8) KV straight
        # from the cache without materializing a dequantized copy in HBM.
        if (new_kv is not None and page_table is None and T == 1
                and cfg.attention_window is None
                and cfg.attention_chunk is None):
            from ..kernels.attention import decode_attention, decode_attention_ok

            S_c = new_kv[0].shape[1]
            if decode_attention_ok((B, KH, G, D), S_c, new_kv[0].dtype):
                qg = q[:, 0].reshape(B, KH, G, D)
                lengths = positions[:, 0] + 1
                out = decode_attention(
                    qg, new_kv[0], new_kv[1], lengths,
                    k_scale=(k_scale if cache_kv is not None and new_kv[0].dtype == jnp.float8_e4m3fn else None),
                    v_scale=(v_scale if cache_kv is not None and new_kv[1].dtype == jnp.float8_e4m3fn else None),
                    out_dtype=cfg.dtype,
                    sinks=(sinks.reshape(KH, G).astype(jnp.float32)
                           if cfg.attention_sinks else None),
                    softcap=cfg.attn_logit_softcap,
                )
                out = out.reshape(B, 1, H * D)
                out = dense(cfg.hidden_size, "o_proj")(out)
                return out, new_kv

        # Prefill/training flash attention: tiled scores never hit HBM —
        # required at long context where the einsum path materializes
        # [B, H, T, S] (kernels/flash_attention.py).
        if (cache_kv is None and T >= 256 and not cfg.attention_sinks
                and not cfg.attn_logit_softcap and cfg.attention_chunk is None):
            from ..kernels.flash_attention import flash_attention, flash_attention_ok

            if flash_attention_ok(T, k.shape[1], D):
                out = flash_attention(
                    q.reshape(B, T, KH, G, D), k, v,
                    causal=True, window=cfg.attention_window, sink=cfg.attention_sink,
                )
                out = out.reshape(B, T, H * D)
                return dense(cfg.hidden_size, "o_proj")(out), new_kv

        qg = q.reshape(B, T, KH, G, D)
        # cached and uncached paths share the [B, S, KH, D] key/value layout
        S = k.shape[1]
        scores = jnp.einsum(
            "btkgd,bskd->bkgts", qg, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(D).astype(jnp.float32)
        if cfg.attn_logit_softcap:
            cap = jnp.float32(cfg.attn_logit_softcap)
            scores = jnp.tanh(scores / cap) * cap
        scores = scores + mask[:, None, None, :, :S]
        if cfg.attention_sinks:
            sk = sinks.reshape(KH, G).astype(jnp.float32)
            sk = jnp.broadcast_to(sk[None, :, :, None, None], (B, KH, G, T, 1))
            combined = jnp.concatenate([scores.astype(jnp.float32), sk], -1)
            probs = jax.nn.softmax(combined, axis=-1)[..., :-1].astype(cfg.dtype)
        else:
            probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(cfg.dtype)
        out = jnp.einsum("bkgts,bskd->btkgd", probs, v.astype(cfg.dtype))
        out = out.reshape(B, T, H * D)
        out = dense(cfg.hidden_size, "o_proj")(out)
        return out, new_kv


class MLP(nn.Module):
    cfg: DecoderConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dense = lambda feats, name: QuantDense(  # noqa: E731
            feats, use_bias=cfg.mlp_bias, dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, name=name,
        )
        if cfg.activation in ("silu_glu", "gelu_glu"):
            if cfg.fused_gate_up:
                gu = dense(2 * cfg.intermediate_size, "gate_up_proj")(x)
                gate, up = jnp.split(gu, 2, axis=-1)
            else:
                gate = dense(cfg.intermediate_size, "gate_proj")(x)
                up = dense(cfg.intermediate_size, "up_proj")(x)
            act = nn.silu if cfg.activation == "silu_glu" else nn.gelu
            return dense(cfg.hidden_size, "down_proj")(act(gate) * up)
        if cfg.activation == "relu2":
            # Nemotron: squared ReLU, no gating
            h = dense(cfg.intermediate_size, "up_proj")(x)
            return dense(cfg.hidden_size, "down_proj")(jnp.square(nn.relu(h)))
        h = dense(cfg.intermediate_size, "fc_in")(x)
        return dense(cfg.hidden_size, "fc_out")(nn.gelu(h))


class MoEBlock(nn.Module):
    """Mixtral-style sparse MoE. Router stays unquantized (reference skips
    routers too). Compute is dense-over-experts, masked by top-k routing —
    the XLA-friendly formulation for small/medium expert counts; the serving
    engine uses a gathered/sharded path for scale."""

    cfg: DecoderConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        B, T, Hd = x.shape
        E, K = cfg.num_experts, cfg.experts_per_token
        router = nn.Dense(E, use_bias=cfg.router_bias, dtype=jnp.float32,
                          param_dtype=cfg.param_dtype, name="router")
        logits = router(x.astype(jnp.float32))  # [B,T,E]
        # Routing follows the HF reference semantics exactly
        # (DeepseekV2MoEGate / DeepseekV3TopkRouter / MixtralTopKGate):
        # affinities over ALL experts, optional selection-only correction
        # bias + group limiting, weights gathered from the ORIGINAL
        # affinities, optional renormalization, post-scale.
        if cfg.router_score == "llama4":
            # Llama-4: sigmoid of the top-k logits scales the expert INPUT
            # (not the output — the swiglu nonlinearity makes these differ);
            # unselected experts see a zero input and contribute nothing
            _, sel = jax.lax.top_k(logits, K)
            selmask = jnp.sum(jax.nn.one_hot(sel, E, dtype=logits.dtype),
                              axis=-2) > 0  # [B,T,E], no TPU scatter
            sel_logits = jnp.where(selmask, logits, -jnp.inf)
            s_in = jax.nn.sigmoid(sel_logits).astype(cfg.dtype)  # [B,T,E]
            gates = jnp.ones_like(logits)
        elif cfg.router_score == "sigmoid":
            scores = jax.nn.sigmoid(logits)
        else:
            scores = jax.nn.softmax(logits, axis=-1)
        select = scores if cfg.router_score != "llama4" else None
        if cfg.router_score != "llama4" and cfg.router_correction_bias:
            # V3 "noaux_tc": bias steers SELECTION only, never the weights.
            # A load-balancing buffer in HF (not trained by gradient).
            cb = self.param("e_score_correction_bias",
                            nn.initializers.zeros_init(), (E,), jnp.float32)
            select = scores + jax.lax.stop_gradient(cb)
        if cfg.router_score != "llama4" and cfg.n_group and cfg.n_group > 1:
            Gn = cfg.n_group
            gsel = select.reshape(B, T, Gn, E // Gn)
            if cfg.router_score == "sigmoid":  # V3: sum of top-2 per group
                group_scores = jnp.sum(jax.lax.top_k(gsel, 2)[0], axis=-1)
            else:  # V2 group_limited_greedy: per-group max
                group_scores = jnp.max(gsel, axis=-1)
            _, gidx = jax.lax.top_k(group_scores, cfg.topk_group)
            gmask = jnp.sum(jax.nn.one_hot(gidx, Gn, dtype=select.dtype), -2)
            select = jnp.where(
                jnp.repeat(gmask, E // Gn, axis=-1) > 0, select, 0.0
            )
        if cfg.router_score != "llama4":
            _, sel = jax.lax.top_k(select, K)
            weights = jnp.take_along_axis(scores, sel, axis=-1)  # [B,T,K]
            if cfg.norm_topk_prob:
                weights = weights / (jnp.sum(weights, -1, keepdims=True)
                                     + 1e-20)
            weights = weights * cfg.routed_scaling_factor
            # compare-and-sum, NOT .at[].set (TPU scatter cost ~54 us/layer
            # at Qwen3-MoE decode shapes) and NOT a one-hot einsum (XLA
            # lowers the tiny K-dim contraction as a convolution fusion,
            # ~39 us/layer): pure VPU elementwise over [B,T,K,E]
            eids = jnp.arange(E, dtype=sel.dtype)
            gates = jnp.sum(
                jnp.where(sel[..., None] == eids, weights[..., None], 0.0),
                axis=-2,
            )  # [B,T,E] sparse gate matrix

        from ..nn.layers import QuantEinsum

        def expert_einsum(shape, name, bias_shape=None):
            return QuantEinsum(
                einsum_str="btd,edf->btef" if shape[1] == Hd else "btef,efd->bted",
                kernel_shape=shape, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                use_bias=cfg.moe_bias, bias_shape=bias_shape, name=name,
            )

        I = cfg.moe_intermediate_size or cfg.intermediate_size
        gate_out = expert_einsum((E, Hd, I), "gate_proj", (E, I))(x)
        up_out = expert_einsum((E, Hd, I), "up_proj", (E, I))(x)
        if cfg.router_score == "llama4":
            # fold the input scaling through the (bias-free) linears
            gate_out = gate_out * s_in[..., None]
            up_out = up_out * s_in[..., None]
        if cfg.moe_activation == "swiglu_oai":
            # gpt-oss clamped swiglu: glu = min(gate, 7) * sigmoid(1.702 *
            # gate); h = (clip(up, +-7) + 1) * glu
            gate = jnp.minimum(gate_out, 7.0)
            up = jnp.clip(up_out, -7.0, 7.0)
            h = (up + 1.0) * (gate * jax.nn.sigmoid(1.702 * gate))
        else:
            h = nn.silu(gate_out) * up_out  # [B,T,E,I]
        # down-projection + routed combine fused into the layer (one
        # int8-MXU kernel on the compressed path — the [B,T,E,Hd]
        # per-expert output never materializes; see backends.moe_down_qgemm)
        out = QuantEinsum(
            einsum_str="bteo,eod->bted", kernel_shape=(E, I, Hd),
            use_bias=cfg.moe_bias, bias_shape=(E, Hd),
            dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="down_proj",
        )(h, gates=gates.astype(cfg.dtype))  # [B,T,Hd]
        if cfg.n_shared_experts:
            # DeepSeek shared experts: one always-on MLP of width
            # n_shared * I added to the routed output
            shared_cfg = dataclasses.replace(
                cfg, intermediate_size=cfg.n_shared_experts * I
            )
            out = out + MLP(shared_cfg, name="shared_experts")(x)
        return out


class Block(nn.Module):
    cfg: DecoderConfig
    layer_index: int = 0

    @nn.compact
    def __call__(self, x, positions, mask, cache_kv=None, valid=None,
                 flash_ok=True):
        cfg = self.cfg
        opts = cfg.layer_opts(self.layer_index)
        off = 1.0 if cfg.norm_style == "gemma" else 0.0
        if cfg.norm == "rmsnorm":
            norm = lambda name: RMSNorm(  # noqa: E731
                epsilon=cfg.norm_eps, dtype=cfg.dtype, scale_offset=off,
                name=name)
        elif cfg.norm == "layernorm1p":
            norm = lambda name: LayerNorm1p(  # noqa: E731
                epsilon=cfg.norm_eps, dtype=cfg.dtype,
                param_dtype=cfg.param_dtype, name=name)
        else:
            norm = lambda name: nn.LayerNorm(  # noqa: E731
                epsilon=cfg.norm_eps, dtype=cfg.dtype,
                param_dtype=cfg.param_dtype, name=name)
        new_kv = None
        if cfg.is_mamba(self.layer_index):
            from .ssm import Mamba2Mixer

            h, new_kv = Mamba2Mixer(cfg, name="mixer")(
                norm("input_norm")(x),
                cache_kv[:2] if cache_kv is not None else None,
                positions=positions, valid=valid,
            )
            if cfg.norm_style == "gemma":
                h = norm("post_attn_out_norm")(h)
            x = x + h
        elif "no_attn" not in opts:
            attn_cfg = cfg
            if "kv" in opts:
                # per-layer KV-head count (puzzletron heterogeneous plans);
                # head_dim pinned so q/o widths shrink with the groups
                G = cfg.num_heads // cfg.kv_heads
                attn_cfg = dataclasses.replace(
                    cfg, num_kv_heads=int(opts["kv"]),
                    num_heads=int(opts["kv"]) * G,
                    head_dim=cfg.dims_per_head,
                )
            if "window" in opts:
                attn_cfg = dataclasses.replace(
                    attn_cfg, attention_window=int(opts["window"])
                )
            if opts.get("local_rope"):
                # Gemma3: sliding layers rope at the local base, unscaled
                attn_cfg = dataclasses.replace(
                    attn_cfg, rope_theta=cfg.rope_local_base_freq,
                    rope_scaling=None,
                )
            if opts.get("nope"):
                # Llama-4 NoPE layers: no rotary at all
                attn_cfg = dataclasses.replace(attn_cfg, positions="none")
            if "chunk" in opts:
                attn_cfg = dataclasses.replace(
                    attn_cfg, attention_chunk=int(opts["chunk"])
                )
            if cfg.attention_type == "mla":
                from .mla import MLAttention

                attn_cls = MLAttention
            else:
                attn_cls = Attention
            attn_kw = {} if attn_cls is not Attention else {
                "flash_ok": flash_ok}
            h, new_kv = attn_cls(attn_cfg, name="attn")(
                norm("input_norm")(x), positions, mask, cache_kv, **attn_kw
            )
            if cfg.norm_style == "gemma":
                # Gemma sandwich: normalize the block OUTPUT before the
                # residual add (post_attention_layernorm)
                h = norm("post_attn_out_norm")(h)
            x = x + h
        elif cache_kv is not None:
            new_kv = (cache_kv[0], cache_kv[1])  # untouched cache slots
            if len(cache_kv) == 5:  # skip-softmax summaries ride along
                new_kv = new_kv + (cache_kv[3], cache_kv[4])
        if "no_mlp" in opts:
            return x, new_kv
        mlp_in = norm("post_attn_norm")(x)
        if (cfg.num_experts > 0 and self.layer_index >= cfg.first_k_dense
                and "ffn" not in opts):
            h = MoEBlock(cfg, name="moe")(mlp_in)
        else:
            mlp_cfg = cfg
            if "ffn" in opts:
                mlp_cfg = dataclasses.replace(cfg, intermediate_size=int(opts["ffn"]))
            h = MLP(mlp_cfg, name="mlp")(mlp_in)
        if cfg.norm_style == "gemma":
            h = norm("post_mlp_out_norm")(h)
        return x + h, new_kv


class Decoder(nn.Module):
    """Full causal LM. __call__(ids, cache=None, positions=None) ->
    (logits, new_cache). ``prefix_embeds`` [B, P, H] are prepended before
    the token embeddings (multimodal prefix, models/vlm.py — logits then
    cover P+T positions)."""

    cfg: DecoderConfig

    @nn.compact
    def __call__(self, input_ids, cache=None, positions=None, output_hidden=False,
                 prefix_embeds=None, logits_index=None):
        """``logits_index`` [B] (optional): compute logits ONLY at that
        position per row — returns [B, V] instead of [B, T, V]. A serving
        prefill needs one row; the full-chunk lm_head on a 2176-token
        bucket costs ~2.3 TFLOP + a 558 MB logits tensor per request."""
        cfg = self.cfg
        B, T = input_ids.shape

        embed = QuantEmbed(cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype,
                           param_dtype=cfg.param_dtype, name="embed_tokens")
        x = embed(input_ids)
        if cfg.scale_embeddings:
            x = x * jnp.asarray(cfg.hidden_size ** 0.5, x.dtype)
        if prefix_embeds is not None:
            x = jnp.concatenate([prefix_embeds.astype(x.dtype), x], axis=1)
            T = x.shape[1]
        if positions is None:
            if cache is not None:
                positions = cache["lengths"][:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
            else:
                positions = jnp.broadcast_to(
                    jnp.arange(T, dtype=jnp.int32)[None, :], (B, T)
                )
        if cfg.positions == "learned":
            pos_emb = QuantEmbed(cfg.max_position_embeddings, cfg.hidden_size,
                                 dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                                 name="embed_positions")(positions)
            x = x + pos_emb

        paged = cache is not None and "page_table" in cache
        # hybrid models: the max-len / mask geometry comes from the first
        # ATTENTION layer's KV slot (mamba slots hold conv/SSM state)
        attn_idx = next((i for i in range(cfg.num_layers)
                         if not cfg.is_mamba(i)), None)
        if cache is not None:
            if paged:
                # virtual dense length = page-table capacity
                S = cache["page_table"].shape[1] * cache["k"][0].shape[1]
            elif attn_idx is not None:
                S = cache["k"][attn_idx].shape[1]
            else:
                S = cfg.max_position_embeddings  # pure-Mamba: no KV at all
            key_pos = jnp.arange(S, dtype=jnp.int32)[None, None, :]  # [1,1,S]
            if "tree" in cache:
                # tree-verify forward (speculative/tree.py): the T new
                # tokens are DRAFT-TREE nodes written at cache rows
                # [lengths, lengths+T). Query node q attends the whole
                # prefix plus exactly its tree ancestors — positions here
                # carry rope depths (siblings share one), so the usual
                # position-causal rule would leak other branches.
                tm = cache["tree"]                       # [T, T] bool
                L0 = cache["lengths"][:, None, None]
                rel = key_pos - L0
                Mn = tm.shape[0]
                t_ok = jnp.take_along_axis(
                    jnp.broadcast_to(tm[None], (B, T, Mn)),
                    jnp.clip(rel, 0, Mn - 1), axis=2)
                causal = (key_pos < L0) | ((rel >= 0) & (rel < Mn) & t_ok)
            else:
                causal = key_pos <= positions[:, :, None]
        else:
            key_pos = positions[:, None, :]
            causal = key_pos <= positions[:, :, None]

        _masks: dict = {}

        def mask_for(window, chunk=None):
            # per-layer sliding windows / chunked attention (gpt-oss,
            # gemma3, llama4 alternate via layer_plan); masks built once per
            # distinct (window, chunk)
            key = (window, chunk)
            if key not in _masks:
                valid = causal
                if window is not None:
                    in_window = key_pos > positions[:, :, None] - window
                    sink = key_pos < cfg.attention_sink
                    valid = valid & (in_window | sink)
                if chunk is not None:
                    valid = valid & (key_pos // chunk
                                     == positions[:, :, None] // chunk)
                _masks[key] = jnp.where(valid, 0.0, -1e9).astype(jnp.float32)
            return _masks[key]  # [B,T,S]

        # prefix-validity bound for stateful (Mamba) layers: a serving
        # engine sets cache["valid_to"] [B] to the absolute position past
        # which this chunk's tokens are bucket padding / inactive fillers
        valid = None
        if cache is not None and "valid_to" in cache:
            valid = positions < cache["valid_to"][:, None]

        new_cache = None
        ks, vs = [], []
        kmaxs, kmins = [], []
        taps = []
        skip = cache is not None and "kmax" in cache
        for i in range(cfg.num_layers):
            cache_kv = None
            if cache is not None:
                cache_kv = (cache["k"][i], cache["v"][i], positions)
                if paged:
                    cache_kv = cache_kv + (cache["page_table"],)
                elif skip:
                    cache_kv = cache_kv + (cache["kmax"][i], cache["kmin"][i])
            opts_i = cfg.layer_opts(i)
            w_i = opts_i.get("window", cfg.attention_window)
            c_i = opts_i.get("chunk", cfg.attention_chunk)
            x, new_kv = Block(cfg, layer_index=i, name=f"layers_{i}")(
                x, positions, mask_for(w_i, c_i), cache_kv, valid=valid,
                flash_ok=(cache is None or "tree" not in cache),
            )
            if new_kv is not None:
                ks.append(new_kv[0])
                vs.append(new_kv[1])
                if skip:
                    kmaxs.append(new_kv[2])
                    kmins.append(new_kv[3])
            if cfg.hidden_taps is not None and i in cfg.hidden_taps:
                taps.append(x)
        if cache is not None:
            new_cache = {
                "k": tuple(ks),
                "v": tuple(vs),
                "lengths": cache["lengths"] + T,
            }
            if paged:
                new_cache["page_table"] = cache["page_table"]
            if skip:
                new_cache["kmax"] = tuple(kmaxs)
                new_cache["kmin"] = tuple(kmins)

        if cfg.norm == "rmsnorm":
            x = RMSNorm(epsilon=cfg.norm_eps, dtype=cfg.dtype,
                        scale_offset=(1.0 if cfg.norm_style == "gemma"
                                      else 0.0),
                        name="final_norm")(x)
        elif cfg.norm == "layernorm1p":
            x = LayerNorm1p(epsilon=cfg.norm_eps, dtype=cfg.dtype,
                            param_dtype=cfg.param_dtype,
                            name="final_norm")(x)
        else:
            x = nn.LayerNorm(epsilon=cfg.norm_eps, dtype=cfg.dtype,
                             param_dtype=cfg.param_dtype,
                             name="final_norm")(x)
        hidden = x  # post-final-norm hidden states (EAGLE draft input)
        if cfg.hidden_taps is not None:
            # EAGLE-3 feature vector: tapped mid-layer states + final hidden
            hidden = jnp.concatenate([*taps, x], axis=-1)
        if logits_index is not None:
            x = x[jnp.arange(B), logits_index]  # [B, H]
        if cfg.tie_word_embeddings:
            logits = embed.attend(x)
        else:
            logits = QuantDense(cfg.vocab_size, use_bias=False, dtype=cfg.dtype,
                                param_dtype=cfg.param_dtype, name="lm_head")(x)
        if cfg.final_logit_softcap:
            cap = jnp.asarray(cfg.final_logit_softcap, logits.dtype)
            logits = jnp.tanh(logits / cap) * cap
        if output_hidden:
            return logits, new_cache, hidden
        return logits, new_cache


# ---------------------------------------------------------------------------
# Named configurations (model zoo entries; weights come from hf_import)
# ---------------------------------------------------------------------------
def fuse_for_serving(bundle):
    """Rewrite an (unquantized) bundle to fused qkv/gate_up projections —
    call BEFORE quantize() so calibration sees the fused layout. Quantizer
    state is dropped; shared pre-quant scales across fused siblings are
    guaranteed by the calibration algorithms' fusion groups, so re-running
    calibrate on the fused model reproduces deployable scales."""
    import numpy as np


    cfg = bundle.module.cfg
    new_cfg = dataclasses.replace(cfg, fused_qkv=True, fused_gate_up=True)
    params = bundle.variables["params"]
    for i in range(cfg.num_layers):
        attn = params[f"layers_{i}"]["attn"]
        if "q_proj" in attn:
            fused = {"kernel": jnp.concatenate(
                [attn["q_proj"]["kernel"], attn["k_proj"]["kernel"], attn["v_proj"]["kernel"]],
                axis=1,
            )}
            if "bias" in attn["q_proj"]:
                fused["bias"] = jnp.concatenate(
                    [attn["q_proj"]["bias"], attn["k_proj"]["bias"], attn["v_proj"]["bias"]]
                )
            attn = {k: v for k, v in attn.items() if k not in ("q_proj", "k_proj", "v_proj")}
            attn["qkv_proj"] = fused
        layer = dict(params[f"layers_{i}"])
        layer["attn"] = attn
        mlp = layer.get("mlp")
        if mlp is not None and "gate_proj" in mlp:
            gu = {"kernel": jnp.concatenate(
                [mlp["gate_proj"]["kernel"], mlp["up_proj"]["kernel"]], axis=1
            )}
            mlp = {k: v for k, v in mlp.items() if k not in ("gate_proj", "up_proj")}
            mlp["gate_up_proj"] = gu
            layer["mlp"] = mlp
        params = {**params, f"layers_{i}": layer}
    variables = {k: v for k, v in bundle.variables.items() if k not in ("quant",)}
    variables["params"] = params
    return bundle.replace(
        module=type(bundle.module)(new_cfg), variables=variables
    )


def gpt2_config(**overrides) -> DecoderConfig:
    base = dict(
        vocab_size=50257, hidden_size=768, num_layers=12, num_heads=12,
        intermediate_size=3072, activation="gelu", norm="layernorm",
        positions="learned", max_position_embeddings=1024, attn_bias=True,
        mlp_bias=True, tie_word_embeddings=True, num_kv_heads=None,
    )
    base.update(overrides)
    return DecoderConfig(**base)


def llama_config(**overrides) -> DecoderConfig:
    base = dict(
        vocab_size=32000, hidden_size=4096, num_layers=32, num_heads=32,
        num_kv_heads=8, intermediate_size=11008, activation="silu_glu",
        norm="rmsnorm", positions="rope", rope_theta=10000.0,
    )
    base.update(overrides)
    return DecoderConfig(**base)


def llama3_8b_config(**overrides) -> DecoderConfig:
    base = dict(
        vocab_size=128256, hidden_size=4096, num_layers=32, num_heads=32,
        num_kv_heads=8, intermediate_size=14336, rope_theta=500000.0,
        max_position_embeddings=8192,
    )
    base.update(overrides)
    return llama_config(**base)


def tinyllama_config(**overrides) -> DecoderConfig:
    base = dict(
        vocab_size=32000, hidden_size=2048, num_layers=22, num_heads=32,
        num_kv_heads=4, intermediate_size=5632,
    )
    base.update(overrides)
    return llama_config(**base)


def qwen2_config(**overrides) -> DecoderConfig:
    base = dict(
        vocab_size=151936, hidden_size=3584, num_layers=28, num_heads=28,
        num_kv_heads=4, intermediate_size=18944, activation="silu_glu",
        norm="rmsnorm", positions="rope", rope_theta=1e6, attn_bias=True,
        max_position_embeddings=32768,
    )
    base.update(overrides)
    return DecoderConfig(**base)


def mistral_config(**overrides) -> DecoderConfig:
    base = dict(
        vocab_size=32000, hidden_size=4096, num_layers=32, num_heads=32,
        num_kv_heads=8, intermediate_size=14336, activation="silu_glu",
        norm="rmsnorm", positions="rope", rope_theta=10000.0,
        attention_window=4096,  # Mistral's sliding-window attention
        max_position_embeddings=8192,
    )
    base.update(overrides)
    return DecoderConfig(**base)


def mixtral_config(**overrides) -> DecoderConfig:
    base = dict(
        vocab_size=32000, hidden_size=4096, num_layers=32, num_heads=32,
        num_kv_heads=8, intermediate_size=14336, activation="silu_glu",
        norm="rmsnorm", positions="rope", rope_theta=1e6,
        num_experts=8, experts_per_token=2,
    )
    base.update(overrides)
    return DecoderConfig(**base)


def tiny_test_config(**overrides) -> DecoderConfig:
    """Small config for tests: 2 layers, GQA, RoPE."""
    base = dict(
        vocab_size=256, hidden_size=64, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=128, max_position_embeddings=128,
    )
    base.update(overrides)
    return DecoderConfig(**base)


def deepseek_v2_lite_config(**overrides) -> DecoderConfig:
    """DeepSeek-V2-Lite: MLA (r=512, no q compression) + routed MoE with
    shared experts (reference workload: examples/deepseek/)."""
    base = dict(
        vocab_size=102400, hidden_size=2048, num_layers=27, num_heads=16,
        intermediate_size=10944, moe_intermediate_size=1408,
        num_experts=64, experts_per_token=6, n_shared_experts=2,
        norm_topk_prob=False,  # V2 greedy: softmax-over-all weights, no renorm
        first_k_dense=1, rope_theta=10000.0,
        rope_scaling=(("rope_type", "yarn"), ("factor", 40.0),
                      ("original_max_position_embeddings", 4096),
                      ("beta_fast", 32.0), ("beta_slow", 1.0),
                      ("mscale", 0.707), ("mscale_all_dim", 0.707)),
        max_position_embeddings=163840,
        attention_type="mla", q_lora_rank=None, kv_lora_rank=512,
        qk_nope_head_dim=128, qk_rope_head_dim=64, v_head_dim=128,
    )
    base.update(overrides)
    return DecoderConfig(**base)


def deepseek_v3_config(**overrides) -> DecoderConfig:
    """DeepSeek-V3/R1 geometry: full MLA (q_lora 1536) + sigmoid-routed
    MoE. 671B total — realistic single-host use is the *shape* for bench/
    sharding work, not full weights."""
    base = dict(
        vocab_size=129280, hidden_size=7168, num_layers=61, num_heads=128,
        intermediate_size=18432, moe_intermediate_size=2048,
        num_experts=256, experts_per_token=8, n_shared_experts=1,
        router_score="sigmoid", router_correction_bias=True,
        n_group=8, topk_group=4, norm_topk_prob=True,
        routed_scaling_factor=2.5,
        first_k_dense=3, rope_theta=10000.0,
        rope_scaling=(("rope_type", "yarn"), ("factor", 40.0),
                      ("original_max_position_embeddings", 4096),
                      ("beta_fast", 32.0), ("beta_slow", 1.0),
                      ("mscale", 1.0), ("mscale_all_dim", 1.0)),
        max_position_embeddings=163840,
        attention_type="mla", q_lora_rank=1536, kv_lora_rank=512,
        qk_nope_head_dim=128, qk_rope_head_dim=64, v_head_dim=128,
    )
    base.update(overrides)
    return DecoderConfig(**base)


def gemma3_4b_config(**overrides) -> DecoderConfig:
    """Gemma-3-4B text tower: sandwich norms, (1+w) RMSNorm, qk-norm,
    5:1 sliding:full attention with local rope base, linear-scaled global
    rope, scaled embeddings, tied head."""
    n_layers = int(overrides.pop("num_layers", 34))
    plan = tuple(
        () if (i + 1) % 6 == 0 else (("window", 1024), ("local_rope", True))
        for i in range(n_layers)
    )
    base = dict(
        vocab_size=262208, hidden_size=2560, num_layers=n_layers,
        num_heads=8, num_kv_heads=4, head_dim=256,
        intermediate_size=10240, activation="gelu_glu",
        norm_style="gemma", scale_embeddings=True, qk_norm=True,
        query_pre_attn_scalar=256.0, tie_word_embeddings=True,
        rope_theta=1e6, rope_local_base_freq=10000.0,
        rope_scaling=(("rope_type", "linear"), ("factor", 8.0)),
        layer_plan=plan, norm_eps=1e-6, max_position_embeddings=131072,
    )
    base.update(overrides)
    return DecoderConfig(**base)


def tiny_gemma3_test_config(**overrides) -> DecoderConfig:
    base = dict(
        vocab_size=256, hidden_size=64, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=16, intermediate_size=96,
        activation="gelu_glu", norm_style="gemma", scale_embeddings=True,
        qk_norm=True, query_pre_attn_scalar=64.0, tie_word_embeddings=True,
        rope_theta=1e6, rope_local_base_freq=10000.0,
        rope_scaling=(("rope_type", "linear"), ("factor", 2.0)),
        layer_plan=((("window", 8), ("local_rope", True)), ()),
        norm_eps=1e-6, max_position_embeddings=128,
    )
    base.update(overrides)
    return DecoderConfig(**base)


def qwen3_config(**overrides) -> DecoderConfig:
    """Qwen3 dense (e.g. 8B): GQA + per-head q/k RMSNorm."""
    base = dict(
        vocab_size=151936, hidden_size=4096, num_layers=36, num_heads=32,
        num_kv_heads=8, head_dim=128, intermediate_size=12288,
        qk_norm=True, rope_theta=1e6, norm_eps=1e-6,
        max_position_embeddings=40960,
    )
    base.update(overrides)
    return DecoderConfig(**base)


def qwen3_moe_config(**overrides) -> DecoderConfig:
    """Qwen3-MoE (e.g. 30B-A3B): qk-norm + softmax top-k routed experts."""
    base = dict(
        vocab_size=151936, hidden_size=2048, num_layers=48, num_heads=32,
        num_kv_heads=4, head_dim=128, intermediate_size=6144,
        moe_intermediate_size=768, num_experts=128, experts_per_token=8,
        norm_topk_prob=True, qk_norm=True, rope_theta=1e6, norm_eps=1e-6,
        max_position_embeddings=40960,
    )
    base.update(overrides)
    return DecoderConfig(**base)


def gpt_oss_20b_config(**overrides) -> DecoderConfig:
    """gpt-oss-20B: GQA with learned sinks, alternating sliding/full
    attention, clamped-swiglu MoE with biases, YaRN rope (reference
    workload: examples/gpt-oss/)."""
    n_layers = int(overrides.pop("num_layers", 24))
    plan = tuple(
        (("window", 128),) if i % 2 == 0 else () for i in range(n_layers)
    )
    base = dict(
        vocab_size=201088, hidden_size=2880, num_layers=n_layers,
        num_heads=64, num_kv_heads=8, head_dim=64,
        intermediate_size=2880, num_experts=32, experts_per_token=4,
        moe_activation="swiglu_oai", moe_bias=True, router_bias=True,
        attn_bias=True, attention_sinks=True, layer_plan=plan,
        rope_theta=150000.0,
        rope_scaling=(("rope_type", "yarn"), ("factor", 32.0),
                      ("original_max_position_embeddings", 4096),
                      ("beta_fast", 32.0), ("beta_slow", 1.0)),
        max_position_embeddings=131072,
    )
    base.update(overrides)
    return DecoderConfig(**base)


def nemotron_h_config(**overrides) -> DecoderConfig:
    """Nemotron-H-8B-class hybrid: Mamba2 mixers with sparse attention
    layers (public arch shape: 52 blocks, ~1:8 attention ratio, d_inner
    2x hidden, state 128, GQA-grouped B/C). The reference operates on
    these models through its Megatron plugins (mcore_minitron mamba
    pruning, mamba_moe presets); here they are a native family."""
    n_layers = 52
    pattern = "".join("*" if i % 8 == 4 else "M" for i in range(n_layers))
    base = dict(
        vocab_size=131072, hidden_size=4096, num_layers=n_layers,
        num_heads=32, num_kv_heads=8, head_dim=128,
        intermediate_size=21504, activation="relu2", norm="rmsnorm",
        hybrid_pattern=pattern, mamba_num_heads=128, mamba_head_dim=64,
        mamba_state_dim=128, mamba_groups=8, positions="none",
        max_position_embeddings=8192,
    )
    base.update(overrides)
    return DecoderConfig(**base)


def tiny_hybrid_test_config(**overrides) -> DecoderConfig:
    """Small Mamba2/attention hybrid for tests (3 layers: M, attn, M)."""
    base = dict(
        vocab_size=256, hidden_size=64, num_layers=3, num_heads=4,
        num_kv_heads=2, head_dim=16, intermediate_size=128,
        hybrid_pattern="M*M", mamba_num_heads=4, mamba_head_dim=16,
        mamba_state_dim=16, mamba_groups=2, mamba_chunk=8,
        max_position_embeddings=64,
    )
    base.update(overrides)
    return DecoderConfig(**base)


def tiny_gptoss_test_config(**overrides) -> DecoderConfig:
    """Small gpt-oss-style config: sinks, alternating windows, oai MoE."""
    base = dict(
        vocab_size=256, hidden_size=64, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=16, intermediate_size=64,
        num_experts=4, experts_per_token=2,
        moe_activation="swiglu_oai", moe_bias=True, router_bias=True,
        attn_bias=True, attention_sinks=True,
        layer_plan=((("window", 8),), ()),
        rope_scaling=(("rope_type", "yarn"), ("factor", 4.0),
                      ("original_max_position_embeddings", 32)),
        max_position_embeddings=128,
    )
    base.update(overrides)
    return DecoderConfig(**base)


def tiny_mla_test_config(**overrides) -> DecoderConfig:
    """Small MLA config for tests: latent cache, shared+routed experts."""
    base = dict(
        vocab_size=256, hidden_size=64, num_layers=2, num_heads=2,
        intermediate_size=128, moe_intermediate_size=64,
        num_experts=4, experts_per_token=2, n_shared_experts=1,
        first_k_dense=1, max_position_embeddings=128,
        attention_type="mla", q_lora_rank=32, kv_lora_rank=32,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
    )
    base.update(overrides)
    return DecoderConfig(**base)
