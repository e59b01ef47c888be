"""Pallas prefill/training flash attention (causal, GQA, sliding window).

Replaces the reference's Triton flash attention
(reference: modelopt/torch/kernels/common/attention/triton_fa.py) for the
prefill/training path: scores live only as a [BQ, S] VMEM tile per program,
never as a [T, S] HBM tensor — the memory blowup that rules out the XLA
einsum formulation at long context.

Shape strategy: queries are flattened to rows (t, g) -> t*G + g per
(batch, kv-head) so one kernel handles GQA; the causal position of a row is
row // G. Whole-S key/value tiles sit in VMEM (fine to S=8k at D=64);
single-pass masked softmax per q-tile (no online rescan needed when S fits).

Backward: jax.custom_vjp recomputes through the XLA reference formulation —
forward gets flash memory behavior, gradients stay exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, G: int, BQ: int, causal: bool,
                  window, sink: int, scale: float):
    qt = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)  # [BQ, D]
    k = k_ref[0].astype(jnp.float32)  # [S, D]
    v = v_ref[0].astype(jnp.float32)
    S = k.shape[0]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [BQ, S]
    row = jax.lax.broadcasted_iota(jnp.int32, (BQ, S), 0)
    qpos = (qt * BQ + row) // G
    kpos = jax.lax.broadcasted_iota(jnp.int32, (BQ, S), 1)
    valid = jnp.ones((BQ, S), jnp.bool_)
    if causal:
        valid = valid & (kpos <= qpos)
    if window is not None:
        valid = valid & ((kpos > qpos - window) | (kpos < sink))
    scores = jnp.where(valid, scores, -1e9)
    m = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-30)
    o_ref[0] = jnp.dot(p, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _xla_reference(q, k, v, causal, window, sink):
    """[B, T, KH, G, D] x [B, S, KH, D] einsum attention (ground truth)."""
    B, T, KH, G, D = q.shape
    S = k.shape[1]
    scores = jnp.einsum("btkgd,bskd->bkgts", q.astype(jnp.float32),
                        k.astype(jnp.float32)) / jnp.sqrt(D)
    qpos = jnp.arange(T)[:, None]
    kpos = jnp.arange(S)[None, :]
    valid = jnp.ones((T, S), bool)
    if causal:
        valid = valid & (kpos <= qpos)
    if window is not None:
        valid = valid & ((kpos > qpos - window) | (kpos < sink))
    scores = jnp.where(valid[None, None, None], scores, -1e9)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bkgts,bskd->btkgd", p, v.astype(jnp.float32)).astype(q.dtype)


def _flash_forward(q, k, v, causal, window, sink, block_q):
    B, T, KH, G, D = q.shape
    S = k.shape[1]
    BQ = max(G, (block_q // G) * G)
    rows = T * G
    qm = q.transpose(0, 2, 1, 3, 4).reshape(B * KH, rows, D)
    pad = (-rows) % BQ
    if pad:
        qm = jnp.pad(qm, ((0, 0), (0, pad), (0, 0)))
    rows_p = qm.shape[1]
    km = k.transpose(0, 2, 1, 3).reshape(B * KH, S, D)
    vm = v.transpose(0, 2, 1, 3).reshape(B * KH, S, D)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, G=G, BQ=BQ, causal=causal, window=window,
            sink=sink, scale=1.0 / (D ** 0.5),
        ),
        grid=(B * KH, rows_p // BQ),
        in_specs=[
            pl.BlockSpec((1, BQ, D), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BQ, D), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * KH, rows_p, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * KH * rows_p * S * D,
            bytes_accessed=(2 * B * KH * S * D + B * KH * rows_p * D * 2) * 2,
            transcendentals=B * KH * rows_p * S,
        ),
    )(qm, km, vm)
    out = out[:, :rows].reshape(B, KH, T, G, D).transpose(0, 2, 1, 3, 4)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention(q, k, v, causal=True, window=None, sink=0, block_q=256):
    """q [B, T, KH, G, D]; k, v [B, S, KH, D] -> [B, T, KH, G, D]."""
    return _flash_forward(q, k, v, causal, window, sink, block_q)


def _fa_fwd(q, k, v, causal, window, sink, block_q):
    return _flash_forward(q, k, v, causal, window, sink, block_q), (q, k, v)


def _fa_bwd(causal, window, sink, block_q, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: _xla_reference(q, k, v, causal, window, sink),
                     q, k, v)
    return vjp(g)


flash_attention.defvjp(_fa_fwd, _fa_bwd)


def flash_attention_ok(T: int, S: int, D: int) -> bool:
    if jax.default_backend() != "tpu":
        return False
    if D % 64 != 0 or S % 128 != 0:
        return False
    if S > 8192:
        return False  # whole-S VMEM tiles; chunked variant is future work
    return True


# ---------------------------------------------------------------------------
# Cached-prefill flash attention: queries of one chunk against the KV cache
# ---------------------------------------------------------------------------
def _flash_prefill_kernel(start_ref, scale_ref, q_ref, k_ref, v_ref, o_ref,
                          *, G: int, BQ: int, scale: float, dequant: bool):
    """One (batch*kv-head, q-tile) program: the chunk's q rows against the
    slot's WHOLE cache slab (which already holds the chunk's keys — the
    engine writes before attending). Query t sits at absolute position
    start + t and attends kv positions <= that; garbage rows past the
    chunk are masked by the same rule. Dots run in bf16 on the MXU
    (softmax in f32) — the f32-dot variant halves prefill attention
    throughput for no accuracy we need."""
    qt = pl.program_id(1)
    start = start_ref[pl.program_id(0)]
    k = k_ref[0]
    v = v_ref[0]
    if dequant:  # int8 / fp8 cache codes -> bf16 once, per-tensor scales
        k = (k.astype(jnp.float32) * scale_ref[0]).astype(jnp.bfloat16)
        v = (v.astype(jnp.float32) * scale_ref[1]).astype(jnp.bfloat16)
    else:
        k = k.astype(jnp.bfloat16)
        v = v.astype(jnp.bfloat16)
    S = k.shape[0]
    q = q_ref[0].astype(jnp.bfloat16)  # [BQ, D]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [BQ, S]
    row = jax.lax.broadcasted_iota(jnp.int32, (BQ, S), 0)
    qpos = start + (qt * BQ + row) // G
    kpos = jax.lax.broadcasted_iota(jnp.int32, (BQ, S), 1)
    scores = jnp.where(kpos <= qpos, scores, -1e9)
    m = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - m)
    p = (e / jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-30))
    o_ref[0] = jnp.dot(p.astype(jnp.bfloat16), v,
                       preferred_element_type=jnp.float32).astype(o_ref.dtype)


def flash_prefill_attention(q, ck, cv, start, k_scale=None, v_scale=None,
                            out_dtype=jnp.bfloat16, block_q=256):
    """q [B, T, KH, G, D] chunk queries; ck/cv [B, S, KH*D] cache slabs
    (bf16, or int8/e4m3 codes with scalar k_scale/v_scale) that ALREADY
    contain the chunk's keys at rows [start, start+T); start [B] the
    chunk's first absolute position. Returns [B, T, KH, G, D].

    This is the serving-prefill path: the XLA einsum formulation
    materializes [B, KH, G, T, S] f32 scores in HBM (578 MB/layer at
    bs48/T2176 — an OOM and a bandwidth tax); here scores live as one
    [BQ, S] VMEM tile per program."""
    B, T, KH, G, D = q.shape
    S = ck.shape[1]
    BQ = max(G, (block_q // G) * G)
    rows = T * G
    qm = q.transpose(0, 2, 1, 3, 4).reshape(B * KH, rows, D)
    pad = (-rows) % BQ
    if pad:
        qm = jnp.pad(qm, ((0, 0), (0, pad), (0, 0)))
    rows_p = qm.shape[1]
    km = ck.reshape(B, S, KH, D).transpose(0, 2, 1, 3).reshape(B * KH, S, D)
    vm = cv.reshape(B, S, KH, D).transpose(0, 2, 1, 3).reshape(B * KH, S, D)
    start_rep = jnp.repeat(start.astype(jnp.int32), KH)
    dequant = k_scale is not None
    scales = jnp.stack([
        jnp.asarray(k_scale if dequant else 1.0, jnp.float32).reshape(()),
        jnp.asarray(v_scale if dequant else 1.0, jnp.float32).reshape(()),
    ])
    out = pl.pallas_call(
        functools.partial(
            _flash_prefill_kernel, G=G, BQ=BQ, scale=1.0 / (D ** 0.5),
            dequant=dequant,
        ),
        grid=(B * KH, rows_p // BQ),
        in_specs=[
            # whole arrays in SMEM, indexed by program id (Mosaic rejects
            # rank-1 partial blocks)
            pl.BlockSpec((B * KH,), lambda b, t: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((2,), lambda b, t: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, BQ, D), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BQ, D), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * KH, rows_p, D), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * KH * rows_p * S * D,
            bytes_accessed=2 * B * KH * S * D * km.dtype.itemsize
            + 2 * B * KH * rows_p * D * 2,
            transcendentals=B * KH * rows_p * S,
        ),
    )(start_rep, scales, qm, km, vm)
    out = out[:, :rows].reshape(B, KH, T, G, D).transpose(0, 2, 1, 3, 4)
    return out


def flash_prefill_ok(T: int, S: int, D: int, cache_dtype) -> bool:
    if jax.default_backend() != "tpu":
        return False
    if D % 64 != 0 or S % 128 != 0 or S > 8192:
        return False
    if T < 64:
        return False  # einsum temps are small; per-call overhead dominates
    return True
