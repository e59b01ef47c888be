"""Mamba2 (selective state space) mixer — the SSM half of hybrid
Nemotron-H / Mamba-MoE-class models.

The reference supports Mamba through its Megatron plugins (pruning of
mamba heads/head_dim: modelopt/torch/prune/plugins/mcore_minitron.py,
NAS hparams mamba_num_heads/mamba_head_dim: nas/plugins/megatron.py) and
ships Mamba-MoE PTQ presets (modelopt_recipes/configs/ptq/presets/model/
mamba_moe_fp8_*.yaml — attention/latent projections excluded, linear
mamba projections quantized). This module is the TPU-native model family
those features act on.

TPU-first design:
  * prefill runs the SSD (state space dual) CHUNKED MATMUL form — all
    einsums lower to MXU dot_generals; the only sequential piece is a
    tiny lax.scan over chunk-level [nh, N, P] states (T/Q steps);
  * decode (T == 1) is the exact recurrence — one rank-1 state update
    per layer, no KV cache: hybrid models keep O(1) memory per token on
    the mamba layers;
  * the per-layer state rides the SAME cache pytree slots the attention
    layers use ("k" slot = rolling conv window, "v" slot = [nh, N*P]
    SSM state, f32), so bundle.make_fn / donation / continuous decode
    all work unchanged;
  * in_proj/out_proj are QuantDense — the entire quantization stack
    (PTQ presets, AWQ/GPTQ, compress to packed kernels, QAT) applies.
    A/dt/D/conv params are the non-linear SSM internals the reference
    also keeps out of quantization (huggingface.py:1839 "bypass linear
    layers").

The SSD math is the public Mamba2 formulation (arXiv:2405.21060):
h_t = exp(dt_t A) h_{t-1} + dt_t B_t x_t ; y_t = C_t h_t + D x_t, with
scalar per-head A < 0, GQA-style shared B/C groups, causal depthwise
conv on (x, B, C), and a gated RMSNorm before out_proj. Implemented
from the paper for JAX; no reference code involved.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..nn.layers import QuantDense


def ssd_scan(x, dt, A, B, C, init_state, chunk: int):
    """Chunked SSD: x [Bz, T, nh, P]; dt [Bz, T, nh] (>= 0); A [nh] (< 0);
    B, C [Bz, T, nh, N] (already head-expanded); init_state
    [Bz, nh, N, P]. Returns (y [Bz, T, nh, P], final_state).

    Within a chunk everything is dense matmuls against the lower-
    triangular decay matrix; across chunks a lax.scan carries the
    [nh, N, P] state. Padding a sequence with dt == 0, x == 0 tokens is
    a no-op on both y and the state (exp(0)=1 decay, zero input)."""
    Bz, T, nh, P = x.shape
    N = B.shape[-1]
    Q = min(chunk, T)
    pad = (-T) % Q
    if pad:
        zpad = lambda a: jnp.pad(a, [(0, 0), (0, pad)] +  # noqa: E731
                                 [(0, 0)] * (a.ndim - 2))
        x, dt, B, C = zpad(x), zpad(dt), zpad(B), zpad(C)
    Tp = T + pad
    nc = Tp // Q

    f32 = jnp.float32
    xc = x.astype(f32).reshape(Bz, nc, Q, nh, P)
    dtc = dt.astype(f32).reshape(Bz, nc, Q, nh)
    Bc = B.astype(f32).reshape(Bz, nc, Q, nh, N)
    Cc = C.astype(f32).reshape(Bz, nc, Q, nh, N)

    alog = dtc * A.astype(f32)                      # [Bz,nc,Q,nh], <= 0
    cums = jnp.cumsum(alog, axis=2)                 # L_t within chunk
    csum = cums[:, :, -1:]                          # full-chunk decay log

    # ---- intra-chunk: y[t] += sum_{s<=t} (C_t.B_s) e^{L_t-L_s} dt_s x_s
    cb = jnp.einsum("bcthn,bcshn->bchts", Cc, Bc)
    # mask in LOG domain before exponentiating: for s > t the exponent
    # L_t - L_s is positive and can overflow f32 to inf; a post-exp
    # jnp.where keeps the forward finite but the 0-cotangent * inf
    # product NaNs gradients of dt/A/x (breaks QAT on hybrid models)
    diff = cums[:, :, :, None] - cums[:, :, None]       # [b,c,t,s,h]
    tri = jnp.tril(jnp.ones((Q, Q), bool))
    diff = jnp.where(tri[None, None, :, :, None], diff, -jnp.inf)
    scores = cb * (jnp.exp(diff) * dtc[:, :, None]).transpose(
        0, 1, 4, 2, 3)
    y = jnp.einsum("bchts,bcshp->bcthp", scores, xc)

    # ---- chunk states: S_c = sum_t e^{Lq - L_t} dt_t B_t (x) x_t
    w = jnp.exp(csum - cums) * dtc                  # [Bz,nc,Q,nh]
    states = jnp.einsum("bcth,bcthn,bcthp->bchnp", w, Bc, xc)

    # ---- carry across chunks
    gammas = jnp.exp(csum[:, :, 0])                 # [Bz,nc,nh]

    def step(h, inp):
        g, s = inp                                  # [Bz,nh], [Bz,nh,N,P]
        h_new = g[..., None, None] * h + s
        return h_new, h                             # emit PRE-chunk state

    final, h_prev = jax.lax.scan(
        step, init_state.astype(f32),
        (gammas.transpose(1, 0, 2), states.transpose(1, 0, 2, 3, 4)))
    h_prev = h_prev.transpose(1, 0, 2, 3, 4)        # [Bz,nc,nh,N,P]

    # ---- inter-chunk: y[t] += C_t . (e^{L_t} h_prev)
    y = y + jnp.einsum("bcthn,bcth,bchnp->bcthp", Cc, jnp.exp(cums), h_prev)
    y = y.reshape(Bz, Tp, nh, P)[:, :T]
    return y, final


def ssd_step(x, dt, A, B, C, state):
    """Exact single-token recurrence (decode): x [Bz, nh, P]; dt [Bz, nh];
    B, C [Bz, nh, N]; state [Bz, nh, N, P] -> (y, state')."""
    f32 = jnp.float32
    x, dt, B, C = (a.astype(f32) for a in (x, dt, B, C))
    a = jnp.exp(dt * A.astype(f32))[..., None, None]
    state = a * state + jnp.einsum(
        "bh,bhn,bhp->bhnp", dt, B, x)
    y = jnp.einsum("bhn,bhnp->bhp", C, state)
    return y, state


class Mamba2Mixer(nn.Module):
    """One Mamba2 mixer. __call__(x [B,T,H], cache=None) ->
    (out [B,T,H], new_cache). cache = (conv_state [B, dc-1, conv_dim_pad],
    ssm_state [B, nh, N*P] f32) — the decoder's "k"/"v" slots."""

    cfg: "DecoderConfig"  # noqa: F821 - transformer.DecoderConfig

    @nn.compact
    def __call__(self, x, cache=None, positions=None, valid=None):
        """``positions`` [B, T]: absolute positions — a chunk starting at
        position 0 RESETS the slot's state (a serving engine reusing a
        cache slot for a new request must not inherit the previous
        request's SSM/conv state; attention gets this for free from
        position masking). ``valid`` [B, T] bool: prefix validity mask for
        bucket-padded prefill — invalid tokens contribute nothing to the
        state (dt -> 0) and never enter the conv window."""
        cfg = self.cfg
        nh = cfg.mamba_num_heads
        P = cfg.mamba_head_dim
        N = cfg.mamba_state_dim
        ng = cfg.mamba_groups
        dc = cfg.mamba_conv_width
        d_in = nh * P
        conv_dim = d_in + 2 * ng * N
        Bz, T, _ = x.shape
        dt_f = cfg.dtype

        zxbcdt = QuantDense(2 * d_in + 2 * ng * N + nh, use_bias=False,
                            dtype=dt_f, param_dtype=cfg.param_dtype,
                            name="in_proj")(x)
        z, xBC, dt = jnp.split(zxbcdt, [d_in, d_in + conv_dim], axis=-1)

        # causal depthwise conv over (x, B, C) with a rolling cache window
        conv_w = self.param("conv_kernel", nn.initializers.lecun_normal(),
                            (dc, conv_dim), cfg.param_dtype).astype(dt_f)
        conv_b = self.param("conv_bias", nn.initializers.zeros,
                            (conv_dim,), cfg.param_dtype).astype(dt_f)
        keep = None
        if cache is not None and positions is not None:
            # new-request reset: chunk starting at absolute position 0
            keep = (positions[:, 0] > 0).astype(dt_f)
        if cache is not None:
            conv_state = cache[0][:, :, :conv_dim].astype(dt_f)
            if keep is not None:
                conv_state = conv_state * keep[:, None, None]
            full = jnp.concatenate([conv_state, xBC], axis=1)
        else:
            full = jnp.pad(xBC, ((0, 0), (dc - 1, 0), (0, 0)))
        conv = sum(conv_w[j] * full[:, j:j + T] for j in range(dc)) + conv_b
        xBC = nn.silu(conv)
        if valid is not None:
            # bucket-padded prefill: the conv window slides only over the
            # VALID prefix (padding rows never become conv state)
            vend = jnp.sum(valid.astype(jnp.int32), axis=1)       # [B]
            idx = vend[:, None] + jnp.arange(dc - 1)[None]        # [B,dc-1]
            new_conv = jnp.take_along_axis(full, idx[..., None], axis=1)
        else:
            new_conv = full[:, T:]  # last dc-1 rows

        xs, Bg, Cg = jnp.split(xBC, [d_in, d_in + ng * N], axis=-1)
        xs = xs.reshape(Bz, T, nh, P)
        hpg = nh // ng
        expand = lambda g: jnp.repeat(  # noqa: E731 - group -> heads
            g.reshape(Bz, T, ng, N), hpg, axis=2)
        Bm, Cm = expand(Bg), expand(Cg)

        dt_bias = self.param(
            "dt_bias",
            lambda key, shape: jnp.asarray(np.log(np.expm1(
                np.exp(np.random.default_rng(0).uniform(
                    np.log(1e-3), np.log(0.1), shape)))), jnp.float32),
            (nh,))
        A_log = self.param(
            "A_log",
            lambda key, shape: jnp.asarray(np.log(
                np.random.default_rng(1).uniform(1.0, 16.0, shape)),
                jnp.float32),
            (nh,))
        Dp = self.param("D", nn.initializers.ones, (nh,), jnp.float32)
        dtv = jax.nn.softplus(dt.astype(jnp.float32) + dt_bias)
        if valid is not None:
            # dt == 0 makes a token a state no-op (decay exp(0)=1, zero
            # input contribution) — exactly how padding must behave
            dtv = dtv * valid[..., None].astype(jnp.float32)
        A = -jnp.exp(A_log)

        if cache is not None:
            state0 = cache[1].astype(jnp.float32).reshape(Bz, nh, N, P)
            if keep is not None:
                state0 = state0 * keep[:, None, None, None].astype(
                    jnp.float32)
        else:
            state0 = jnp.zeros((Bz, nh, N, P), jnp.float32)
        if T == 1 and cache is not None:
            y, state = ssd_step(xs[:, 0], dtv[:, 0], A, Bm[:, 0], Cm[:, 0],
                                state0)
            y = y[:, None]
        else:
            y, state = ssd_scan(xs, dtv, A, Bm, Cm, state0,
                                chunk=cfg.mamba_chunk)
        y = y + Dp[None, None, :, None] * xs.astype(jnp.float32)
        y = y.reshape(Bz, T, d_in).astype(dt_f)

        # gated RMSNorm (Mamba2 norm_before_gate=False convention)
        g = y * nn.silu(z)
        scale = self.param("norm_scale", nn.initializers.ones,
                           (d_in,), cfg.param_dtype)
        var = jnp.mean(jnp.square(g.astype(jnp.float32)), axis=-1,
                       keepdims=True)
        g = (g.astype(jnp.float32) * jax.lax.rsqrt(var + cfg.norm_eps)
             ).astype(dt_f) * scale.astype(dt_f)

        out = QuantDense(cfg.hidden_size, use_bias=False, dtype=dt_f,
                         param_dtype=cfg.param_dtype, name="out_proj")(g)
        new_cache = None
        if cache is not None:
            pad = cache[0].shape[-1] - conv_dim
            if pad:
                new_conv = jnp.pad(new_conv, ((0, 0), (0, 0), (0, pad)))
            new_cache = (new_conv.astype(cache[0].dtype),
                         state.reshape(Bz, nh, N * P).astype(jnp.float32))
        return out, new_cache


def mamba_cache_shapes(cfg, batch: int):
    """(conv_state shape/dtype, ssm_state shape/dtype) for make_cache."""
    nh, P, N = cfg.mamba_num_heads, cfg.mamba_head_dim, cfg.mamba_state_dim
    conv_dim = nh * P + 2 * cfg.mamba_groups * N
    conv_pad = -(-conv_dim // 128) * 128
    return ((batch, cfg.mamba_conv_width - 1, conv_pad),
            (batch, nh, N * P))
