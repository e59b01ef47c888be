"""Pallas paged decode attention over a page-table KV cache.

The reference delegates paged KV to vLLM's PagedAttention kernels
(reference: modelopt/torch/quantization/plugins/vllm.py serves fakequant
inside vLLM workers, which own the paged cache); this framework's built-in
serving engine owns its cache, so it needs a TPU-native paged kernel.

Design (TPU-idiomatic):
  * KV lives in global page arrays ``[n_pages, page_size, KH, D]`` (bf16 or
    fp8-e4m3 codes) — token dim SECOND, matching
    jax.experimental.pallas.ops.tpu.ragged_paged_attention's layout, so
    per-token writes slice only LEADING dims (no sublane-tiling
    constraints) and attention blocks tile (KH, D) densely. A per-slot
    ``page_table [B, PMAX]`` maps slot-local page index -> global page id.
  * Grid ``(B, PMAX)`` with the page dim innermost; the page table and
    per-slot lengths are SCALAR-PREFETCHED so the BlockSpec index_map can
    route each grid step's DMA straight to the right page — indirect
    addressing without gathers or cache copies.
  * Online softmax (running max / denominator in VMEM scratch) accumulates
    across pages, flash-attention style; out-of-range pages alias page 0 in
    the table and are masked out of the softmax. Scores for all heads are
    one masked block-diagonal MXU dot (see kernels/attention.py — decode is
    HBM-bound, the overcompute is free and keeps layouts contiguous).

Fallback for CPU/tests: gather the pages dense and run plain attention
(``paged_decode_attention_xla``) — bit-identical semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _paged_attn_kernel(pt_ref, lens_ref, scales_ref, q_ref, k_ref, v_ref,
                       o_ref, acc_ref, m_ref, l_ref, *, page_size: int):
    b = pl.program_id(0)
    p = pl.program_id(1)
    n_pages = pl.num_programs(1)
    L = lens_ref[b]
    k_scale = scales_ref[0]
    v_scale = scales_ref[1]
    KH, G, D = q_ref.shape[1:]

    @pl.when(p == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(p * page_size < L)
    def _attend():
        # codes stay in their storage dtype until the MXU (see
        # kernels/attention.py: an f32 dequant of the whole page is
        # VPU-bound); scales fold into the score matrix / finalize.
        q = q_ref[0].astype(jnp.bfloat16).reshape(KH * G, D)
        k = k_ref[0].astype(jnp.bfloat16).reshape(page_size * KH, D)
        v = v_ref[0].astype(jnp.bfloat16).reshape(page_size * KH, D)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (k_scale / jnp.sqrt(jnp.float32(D)))  # [KH*G, page_size*KH]
        row_h = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) // G
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        valid = (col % KH == row_h) & (p * page_size + col // KH < L)
        s = jnp.where(valid, s, -1e30)
        m_prev = m_ref[:, :1]
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_cur)
        e = jnp.exp(s - m_cur)
        l_ref[:] = jnp.broadcast_to(
            l_ref[:, :1] * alpha + jnp.sum(e, axis=1, keepdims=True),
            l_ref.shape,
        )
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            e.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = jnp.broadcast_to(m_cur, m_ref.shape)

    @pl.when(p == n_pages - 1)
    def _finalize():
        out = acc_ref[:] * (v_scale / jnp.maximum(l_ref[:, :1], 1e-30))
        o_ref[0] = out.reshape(KH, G, D).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def paged_decode_attention(q, k_pages, v_pages, page_table, lengths,
                           k_scale=None, v_scale=None, out_dtype=jnp.bfloat16):
    """q [B, KH, G, D]; k/v_pages [n_pages, page_size, KH, D] (bf16 or
    float8_e4m3fn); page_table [B, PMAX] int32 (unused entries must point at
    a valid page, e.g. 0 — they are masked); lengths [B].
    Returns [B, KH, G, D]."""
    B, KH, G, D = q.shape
    page_size = k_pages.shape[1]
    PMAX = page_table.shape[1]
    scales = jnp.stack([
        jnp.asarray(1.0 if k_scale is None else k_scale, jnp.float32).reshape(()),
        jnp.asarray(1.0 if v_scale is None else v_scale, jnp.float32).reshape(()),
    ])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, PMAX),
        in_specs=[
            pl.BlockSpec((1, KH, G, D), lambda b, p, pt, lens, sc: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            # indirect page routing off the prefetched table
            pl.BlockSpec((1, page_size, KH, D),
                         lambda b, p, pt, lens, sc: (pt[b, p], 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, page_size, KH, D),
                         lambda b, p, pt, lens, sc: (pt[b, p], 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, KH, G, D), lambda b, p, pt, lens, sc: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((KH * G, D), jnp.float32),
            pltpu.VMEM((KH * G, 128), jnp.float32),
            pltpu.VMEM((KH * G, 128), jnp.float32),
        ],
    )
    kernel = functools.partial(_paged_attn_kernel, page_size=page_size)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KH, G, D), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * KH * G * PMAX * page_size * D * KH,
            bytes_accessed=2 * B * KH * PMAX * page_size * D
            * k_pages.dtype.itemsize,
            transcendentals=B * KH * G * PMAX * page_size,
        ),
    )(page_table.astype(jnp.int32), lengths.astype(jnp.int32), scales,
      q, k_pages, v_pages)


def _kv_write_kernel(pid_ref, off_ref, v_ref, pool_ref, o_ref, sem):
    del pool_ref
    b = pl.program_id(0)
    t = pl.program_id(1)
    pid = pid_ref[b, t]
    off = off_ref[b, t]
    copy = pltpu.make_async_copy(
        v_ref.at[0],                         # [1, KH, D] staged in VMEM
        o_ref.at[pid, pl.ds(off, 1)],        # page-table-routed HBM slice
        sem,
    )
    copy.start()
    copy.wait()


@jax.jit
def paged_kv_write(pool, vals, pids, offs):
    """Scatter per-token KV into the page pool: pool [P, ps, KH, D] with
    vals [B, T, KH, D] written at (pids[b,t], offs[b,t], :, :).

    TPU: a Pallas aliased-output kernel — the pool stays in HBM (ANY) and
    each (slot, token) issues one explicit DMA of its [KH, D] row to the
    page-table-routed location; only touched rows move, and both routed
    dims are LEADING dims so no sublane-tiling constraint applies (an XLA
    scatter with advanced indices around an interior slice dim compiles
    pathologically on TPU). CPU/tests: the XLA scatter fallback."""
    B, T, KH, D = vals.shape
    if jax.default_backend() != "tpu":
        return pool.at[pids, offs].set(vals.astype(pool.dtype))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, 1, KH, D), lambda b, t, pids, offs: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # pool: aliased, not read
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        _kv_write_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(pool.shape, pool.dtype),
        input_output_aliases={3: 0},  # pool (4th input incl. prefetch) -> out
    )(pids.astype(jnp.int32), offs.astype(jnp.int32),
      vals.astype(pool.dtype), pool)


def paged_gather_dense(pages, page_table):
    """pages [n_pages, page_size, KH, D], page_table [B, PMAX] ->
    dense [B, PMAX*page_size, KH, D] (XLA gather; CPU/test fallback and the
    chunked-prefill read path)."""
    B, PMAX = page_table.shape
    _, ps, KH, D = pages.shape
    g = pages[page_table.reshape(-1)]  # [B*PMAX, ps, KH, D]
    return g.reshape(B, PMAX * ps, KH, D)


def paged_decode_attention_xla(q, k_pages, v_pages, page_table, lengths,
                               k_scale=None, v_scale=None,
                               out_dtype=jnp.bfloat16):
    """Reference/fallback path: gather pages dense, masked softmax."""
    B, KH, G, D = q.shape
    k = paged_gather_dense(k_pages, page_table).astype(jnp.float32)
    v = paged_gather_dense(v_pages, page_table).astype(jnp.float32)
    if k_scale is not None:
        k = k * jnp.asarray(k_scale, jnp.float32)
    if v_scale is not None:
        v = v * jnp.asarray(v_scale, jnp.float32)
    s = jnp.einsum("bhgd,bshd->bhgs", q.astype(jnp.float32), k) / jnp.sqrt(
        jnp.float32(D)
    )
    S = k.shape[1]
    pos = jnp.arange(S, dtype=jnp.int32)[None, None, None, :]
    s = jnp.where(pos < lengths[:, None, None, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhgs,bshd->bhgd", p, v)
    return out.astype(out_dtype)


def paged_attention_ok(B: int, KH: int, G: int, D: int, page_size: int) -> bool:
    if jax.default_backend() != "tpu":
        return False
    return D % 64 == 0 and page_size % 8 == 0
