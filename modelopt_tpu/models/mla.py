"""Multi-head Latent Attention (DeepSeek V2/V3 family).

Reference counterpart: examples/deepseek/ quantizes DeepSeek's MLA +
routed-MoE checkpoints (FP4/NVFP4); the modeling lives in DeepSeek's own
inference code. Here MLA is a first-class native module so the whole
technique stack (PTQ/QAT/AutoQuantize/compress/serving) applies to
DeepSeek-shaped models the same way it does to Llama-shaped ones.

MLA, TPU-first:
  * Projections: ``kv_a_proj`` compresses each token to a latent
    ``c_kv [kv_lora_rank]`` plus a SHARED single-head rotary key
    ``k_pe [qk_rope_head_dim]``; ``kv_b_proj`` would expand the latent to
    per-head K_nope/V. Queries optionally low-rank (``q_lora_rank``) with
    per-head nope+rope parts.
  * The KV cache stores ONLY the latent row ``[B, S, r + dr]`` (padded to
    128-lane tiles — see transformer.make_cache): ~9x smaller than a
    Llama-8B-shaped K/V cache at equal depth. Cache rows follow the
    lane-merged layout, so writes are dense leading-dim DMAs.
  * Attention runs ABSORBED, in latent space (the DeepSeek inference
    trick, recast as einsums XLA maps straight onto the MXU):
        q_lat  = q_nope @ W_kb_k           [B,T,H,r]
        scores = q_lat · c_kv + q_pe · k_pe
        o_lat  = softmax(scores) · c_kv    [B,T,H,r]
        out    = o_lat @ W_kb_v            [B,T,H,dv]
    The per-head K/V are never materialized — decode reads one shared
    [B, S, r+dr] stream per layer instead of [B, S, 2*KH*D].

Quantization points: every projection is a QuantDense (weight/input/output
quantizers); the latent cache row has its own ``k_quantizer`` point so
FP8_KV-class configs produce a real e4m3 LATENT cache (the MLA analogue of
KV-cache quantization; V is implicit in the latent).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import QuantDense, RMSNorm, default_kernel_init
from ..nn.quantizer import TensorQuantizer
from .transformer import _rope


class AbsorbedKernel(nn.Module):
    """A linear layer consumed ABSORBED: the (fake-)quantized kernel is
    read directly instead of being applied to activations. Param/quantizer
    naming matches QuantDense (kernel + weight_quantizer) so import/export
    maps and weight-quantization configs treat it like any linear; input/
    output quantizer points don't exist because no activation ever flows
    through it."""

    in_features: int
    features: int
    param_dtype: any = jnp.float32

    @nn.compact
    def __call__(self):
        if self.has_variable("quant", "qweight"):
            # compressed: packed codes dequantize on read (the kernel is
            # consumed absorbed inside einsums — XLA fuses the dequant into
            # the consumer, so HBM sees only the packed bytes)
            from ..nn.quantizer import active_quant_config
            from ..quant.qtensor import dequantize_qtensor

            cfg = active_quant_config()
            specs = (cfg.resolve("/".join(self.path) + "/weight_quantizer")
                     if cfg else None)
            # a resolved-but-disabled spec (enable=False, e.g. an exclude
            # pattern matched while a qweight variable is present) must hit
            # the same descriptive error, not a downstream dequant failure
            if not (specs and specs[0].enable):
                raise ValueError(
                    f"{'/'.join(self.path)}: qweight present but no active "
                    "weight-quantizer spec to interpret it"
                )
            qt = self.get_variable("quant", "qweight")
            return dequantize_qtensor(
                qt, specs[0], (self.in_features, self.features)
            ).astype(self.param_dtype)
        kernel = self.param("kernel", default_kernel_init,
                            (self.in_features, self.features),
                            self.param_dtype)
        return TensorQuantizer(name="weight_quantizer")(kernel)


class MLAttention(nn.Module):
    """DeepSeek-style Multi-head Latent Attention.

    cache_kv: None or (latent_cache [B, S, pad128(r+dr)], v_placeholder,
    positions) — the standard Attention cache tuple; the v slot is an
    empty [B, S, 0] array kept for pytree uniformity.
    """

    cfg: any

    @nn.compact
    def __call__(self, x, positions, mask, cache_kv=None):
        cfg = self.cfg
        B, T, _ = x.shape
        H = cfg.num_heads
        r = cfg.kv_lora_rank
        dn = cfg.qk_nope_head_dim
        dr = cfg.qk_rope_head_dim
        dv = cfg.v_head_dim or dn
        dense = lambda feats, name: QuantDense(  # noqa: E731
            feats, use_bias=cfg.attn_bias, dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, name=name,
        )

        # --- queries: optional low-rank, per-head nope + rope parts ---
        if cfg.q_lora_rank:
            cq = dense(cfg.q_lora_rank, "q_a_proj")(x)
            cq = RMSNorm(epsilon=cfg.norm_eps, dtype=cfg.dtype,
                         name="q_a_norm")(cq)
            q = dense(H * (dn + dr), "q_b_proj")(cq)
        else:
            q = dense(H * (dn + dr), "q_proj")(x)
        q = q.reshape(B, T, H, dn + dr)
        q_nope, q_pe = q[..., :dn], q[..., dn:]
        q_pe = _rope(q_pe, positions, cfg.rope_theta, cfg.rope_scaling)
        q_nope = TensorQuantizer(name="q_quantizer")(q_nope)

        # --- latent + shared rotary key ---
        ckv = dense(r + dr, "kv_a_proj")(x)  # [B, T, r + dr]
        c_kv, k_pe = ckv[..., :r], ckv[..., r:]
        c_kv = RMSNorm(epsilon=cfg.norm_eps, dtype=cfg.dtype,
                       name="kv_a_norm")(c_kv)
        k_pe = _rope(k_pe[:, :, None, :], positions, cfg.rope_theta,
                     cfg.rope_scaling)[:, :, 0]

        # kv_b expansion weights, consumed ABSORBED (never materializing
        # per-head K/V); param/quantizer naming matches a QuantDense
        w_kb = AbsorbedKernel(r, H * (dn + dv), param_dtype=cfg.param_dtype,
                              name="kv_b_proj")()
        w_kb = w_kb.reshape(r, H, dn + dv)
        w_k, w_v = w_kb[..., :dn], w_kb[..., dn:]

        # --- latent cache row: quantize + write ---
        rows = jnp.concatenate([c_kv, k_pe], axis=-1)  # [B, T, r+dr]
        kq_mod = TensorQuantizer(name="k_quantizer")
        new_kv = None
        page_table = None
        if cache_kv is not None:
            assert len(cache_kv) in (3, 4), (
                "MLA supports dense or paged caches (skip-softmax summaries "
                "are an MHA feature)"
            )
            if len(cache_kv) == 4:
                ck, cv_ph, positions_kv, page_table = cache_kv
            else:
                ck, cv_ph, positions_kv = cache_kv
            real_fp8 = ck.dtype in (jnp.float8_e4m3fn, jnp.int8)
            if real_fp8:
                row_codes, row_scale = kq_mod(rows, with_scale=True)
                if ck.dtype == jnp.int8 and row_scale is None:
                    raise ValueError(
                        "an int8 latent cache needs a CALIBRATED per-tensor "
                        "int8 k_quantizer (INT8_KV_CFG-style)"
                    )
                row_scale = (jnp.float32(1.0) if row_scale is None
                             else row_scale)
            else:
                row_codes, row_scale = kq_mod(rows).astype(ck.dtype), None
            pad = ck.shape[-1] - (r + dr)
            if pad:
                row_codes = jnp.pad(row_codes, ((0, 0), (0, 0), (0, pad)))
            if page_table is not None:
                from ..kernels.paged_attention import (
                    paged_gather_dense, paged_kv_write,
                )

                ps = ck.shape[1]
                rows_idx = jnp.arange(B)[:, None]
                pids = page_table[rows_idx, positions_kv // ps]  # [B, T]
                offs = positions_kv % ps
                ck = paged_kv_write(ck, row_codes, pids, offs)
                new_kv = (ck, cv_ph)
                lat = paged_gather_dense(ck, page_table)[..., : r + dr]
            else:
                from ..kernels.attention import dense_kv_write

                ck = dense_kv_write(ck, row_codes, positions_kv[:, 0])
                new_kv = (ck, cv_ph)
                lat = ck[..., : r + dr]
            if real_fp8:
                lat = lat.astype(cfg.dtype) * row_scale.astype(cfg.dtype)
            else:
                lat = lat.astype(cfg.dtype)
            c_all, kpe_all = lat[..., :r], lat[..., r:]  # [B, S, r], [B, S, dr]
        else:
            rows_q = kq_mod(rows)  # fake-quant path (calibration/QAT)
            c_all, kpe_all = rows_q[..., :r], rows_q[..., r:]

        # --- absorbed attention in latent space ---
        scale = 1.0 / jnp.sqrt(jnp.float32(dn + dr))
        if cfg.rope_scaling:
            sd = dict(cfg.rope_scaling)
            if sd.get("rope_type") == "yarn" and sd.get("mscale_all_dim"):
                # DeepSeek applies the YaRN magnitude correction to the
                # softmax scale (HF DeepseekV3Attention: scaling *= mscale^2)
                from .transformer import _yarn_get_mscale

                ms = _yarn_get_mscale(float(sd["factor"]),
                                      float(sd["mscale_all_dim"]))
                scale = scale * ms * ms
        q_lat = jnp.einsum("bthd,rhd->bthr", q_nope.astype(cfg.dtype),
                           w_k.astype(cfg.dtype))

        # Decode fast path: MLA's absorbed attention is EXACTLY a
        # single-shared-KV-head decode over the latent rows — q_eff =
        # [q_lat ; q_pe ; 0-pad] against the (padded) cache rows, with the
        # value projection commuting out of the PV product (o_lat =
        # p @ rows[:, :r]). The Pallas decode kernel reads the (fp8) cache
        # in place; the XLA path below dequantizes the whole cache in HBM
        # every step.
        if cache_kv is not None and T == 1:
            from ..kernels.attention import decode_attention, decode_attention_ok
            from ..kernels.paged_attention import (
                paged_attention_ok, paged_decode_attention,
            )

            Dc = ck.shape[-1]  # padded row width
            use_paged_kernel = (
                page_table is not None
                and ck.dtype in (jnp.float8_e4m3fn, jnp.int8)
                and paged_attention_ok(B, 1, H, Dc, ck.shape[1])
                and Dc % 128 == 0
            )
            if use_paged_kernel:
                pad = Dc - (r + dr)
                q_eff = jnp.concatenate(
                    [q_lat[:, 0], q_pe[:, 0].astype(cfg.dtype)]
                    + ([jnp.zeros((B, H, pad), cfg.dtype)] if pad else []),
                    axis=-1,
                )[:, None] * jnp.asarray(scale * (Dc ** 0.5), cfg.dtype)
                lengths = positions[:, 0] + 1
                o_lat_pad = paged_decode_attention(
                    q_eff, ck, ck, page_table, lengths,
                    k_scale=row_scale, v_scale=row_scale,
                    out_dtype=cfg.dtype,
                )
                o_lat = o_lat_pad[:, 0][..., :r][:, None]
                out = jnp.einsum("bthr,rhd->bthd", o_lat,
                                 w_v.astype(cfg.dtype))
                out = out.reshape(B, 1, H * dv)
                return dense(cfg.hidden_size, "o_proj")(out), new_kv
            if page_table is None and decode_attention_ok(
                    (B, 1, H, Dc), ck.shape[1], ck.dtype):
                pad = Dc - (r + dr)
                q_eff = jnp.concatenate(
                    [q_lat[:, 0], q_pe[:, 0].astype(cfg.dtype)]
                    + ([jnp.zeros((B, H, pad), cfg.dtype)] if pad else []),
                    axis=-1,
                )[:, None]  # [B, KH=1, G=H, Dc]
                # neutralize the kernel's 1/sqrt(Dc) and apply the MLA scale
                q_eff = q_eff * jnp.asarray(scale * (Dc ** 0.5), cfg.dtype)
                lengths = positions[:, 0] + 1
                o_lat_pad = decode_attention(
                    q_eff, ck, ck, lengths,
                    k_scale=(row_scale if real_fp8 else None),
                    v_scale=(row_scale if real_fp8 else None),
                    out_dtype=cfg.dtype,
                )  # [B, 1, H, Dc]
                o_lat = o_lat_pad[:, 0][..., :r][:, None]  # [B, T=1, H, r]
                out = jnp.einsum("bthr,rhd->bthd", o_lat,
                                 w_v.astype(cfg.dtype))
                out = out.reshape(B, 1, H * dv)
                return dense(cfg.hidden_size, "o_proj")(out), new_kv

        s = jnp.einsum("bthr,bsr->bhts", q_lat.astype(cfg.dtype),
                       c_all, preferred_element_type=jnp.float32)
        s = s + jnp.einsum("bthd,bsd->bhts", q_pe.astype(cfg.dtype),
                           kpe_all.astype(cfg.dtype),
                           preferred_element_type=jnp.float32)
        S = c_all.shape[1]
        s = s * scale + mask[:, None, :, :S]
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(cfg.dtype)
        o_lat = jnp.einsum("bhts,bsr->bthr", p, c_all)
        out = jnp.einsum("bthr,rhd->bthd", o_lat, w_v.astype(cfg.dtype))
        out = out.reshape(B, T, H * dv)
        out = dense(cfg.hidden_size, "o_proj")(out)
        return out, new_kv
