"""Pallas paged decode attention over a page-table KV cache.

The reference delegates paged KV to vLLM's PagedAttention kernels
(reference: modelopt/torch/quantization/plugins/vllm.py serves fakequant
inside vLLM workers, which own the paged cache); this framework's built-in
serving engine owns its cache, so it needs a TPU-native paged kernel.

Design (TPU-idiomatic):
  * KV lives in global page arrays ``[n_pages, page_size, KH*D]`` (bf16 or
    fp8-e4m3 codes) — token dim second-minor, heads merged into the lane
    dim (see kernels/attention.py: the merge keeps 1-byte-dtype DMAs dense
    under Mosaic's (32, 128) tiling; a [.., KH, D] layout moves 4x the
    bytes for fp8). Per-token writes slice only LEADING dims. A per-slot
    ``page_table [B, PMAX]`` maps slot-local page index -> global page id.
  * Grid ``(B, PMAX)`` with the page dim innermost; the page table and
    per-slot lengths are SCALAR-PREFETCHED so the BlockSpec index_map can
    route each grid step's DMA straight to the right page — indirect
    addressing without gathers or cache copies.
  * Online softmax (running max / denominator in VMEM scratch) accumulates
    across pages, flash-attention style; out-of-range pages alias page 0 in
    the table and are masked out of the softmax. Per KV head, a short
    unrolled loop does q_h x k_h^T on the MXU (decode is HBM-bound; DMA
    density is what matters — see kernels/attention.py).

Fallback for CPU/tests: gather the pages dense and run plain attention
(``paged_decode_attention_xla``) — bit-identical semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import _SCRATCH, _attend_chunk, _finalize_out, _scales_arr


def _paged_attn_kernel(pt_ref, lens_ref, scales_ref, q_ref, k_ref, v_ref,
                       o_ref, acc_ref, m_ref, l_ref, *, page_size: int):
    b = pl.program_id(0)
    p = pl.program_id(1)
    n_pages = pl.num_programs(1)
    L = lens_ref[b]

    @pl.when(p == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(p * page_size < L)
    def _attend():
        _attend_chunk(q_ref, k_ref, v_ref, p * page_size, L,
                      scales_ref[0], acc_ref, m_ref, l_ref)

    @pl.when(p == n_pages - 1)
    def _finalize():
        _finalize_out(o_ref, acc_ref, l_ref, scales_ref[1])


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def paged_decode_attention(q, k_pages, v_pages, page_table, lengths,
                           k_scale=None, v_scale=None, out_dtype=jnp.bfloat16):
    """q [B, KH, G, D]; k/v_pages [n_pages, page_size, KH*D] (bf16 or
    float8_e4m3fn); page_table [B, PMAX] int32 (unused entries must point at
    a valid page, e.g. 0 — they are masked); lengths [B].
    Returns [B, KH, G, D]."""
    B, KH, G, D = q.shape
    page_size = k_pages.shape[1]
    PMAX = page_table.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, PMAX),
        in_specs=[
            pl.BlockSpec((1, KH, G, D), lambda b, p, pt, lens, sc: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            # indirect page routing off the prefetched table
            pl.BlockSpec((1, page_size, KH * D),
                         lambda b, p, pt, lens, sc: (pt[b, p], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, page_size, KH * D),
                         lambda b, p, pt, lens, sc: (pt[b, p], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, KH, G, D), lambda b, p, pt, lens, sc: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=_SCRATCH(KH, G, D),
    )
    kernel = functools.partial(_paged_attn_kernel, page_size=page_size)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KH, G, D), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * KH * G * PMAX * page_size * D,
            bytes_accessed=2 * B * KH * PMAX * page_size * D
            * k_pages.dtype.itemsize,
            transcendentals=B * KH * G * PMAX * page_size,
        ),
    )(page_table.astype(jnp.int32), lengths.astype(jnp.int32),
      _scales_arr(k_scale, v_scale), q, k_pages, v_pages)


def _kv_write_kernel(pid_ref, off_ref, v_ref, pool_ref, o_ref, sem):
    del pool_ref
    b = pl.program_id(0)
    t = pl.program_id(1)
    pid = pid_ref[b, t]
    off = off_ref[b, t]
    # 4-D [.., KHD//128, 128] views: the routed dims (b, t, pid, off) are
    # all LEADING, the tiled last-two dims stay full (see
    # attention._kv_write_kernel for why 3-D row slices fail to lower)
    copy = pltpu.make_async_copy(
        v_ref.at[b, pl.ds(t, 1)],            # [1, KHD//128, 128] in HBM
        o_ref.at[pid, pl.ds(off, 1)],        # page-table-routed HBM slice
        sem,
    )
    copy.start()
    copy.wait()


@jax.jit
def paged_kv_write(pool, vals, pids, offs):
    """Scatter per-token KV into the page pool: pool [P, ps, KH*D] with
    vals [B, T, KH*D] written at (pids[b,t], offs[b,t], :).

    TPU: a Pallas aliased-output kernel — the pool stays in HBM (ANY) and
    each (slot, token) issues one explicit DMA of its [KH*D] row to the
    page-table-routed location; only touched rows move, and both routed
    dims are LEADING dims so no sublane-tiling constraint applies (an XLA
    scatter with advanced indices around an interior slice dim compiles
    pathologically on TPU). CPU/tests: the XLA scatter fallback."""
    B, T, KHD = vals.shape
    if jax.default_backend() != "tpu" or KHD % 128:
        return pool.at[pids, offs].set(vals.astype(pool.dtype))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, T),
        in_specs=[
            # vals: HBM->HBM DMA source. A VMEM-staged (1, 1, KHD) block is
            # an illegal 1-sublane slice of a padded tile on the
            # lane-merged layout (see attention.dense_kv_write).
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pl.ANY),  # pool: aliased, not read
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    P, ps, _ = pool.shape
    nsub = KHD // 128
    out = pl.pallas_call(
        _kv_write_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, ps, nsub, 128), pool.dtype),
        input_output_aliases={3: 0},  # pool (4th input incl. prefetch) -> out
    )(pids.astype(jnp.int32), offs.astype(jnp.int32),
      vals.astype(pool.dtype).reshape(B, T, nsub, 128),
      pool.reshape(P, ps, nsub, 128))
    return out.reshape(P, ps, KHD)


def paged_gather_dense(pages, page_table):
    """pages [n_pages, page_size, KH*D], page_table [B, PMAX] ->
    dense [B, PMAX*page_size, KH*D] (XLA gather; CPU/test fallback and the
    chunked-prefill read path)."""
    B, PMAX = page_table.shape
    _, ps, KHD = pages.shape
    g = pages[page_table.reshape(-1)]  # [B*PMAX, ps, KH*D]
    return g.reshape(B, PMAX * ps, KHD)


def paged_decode_attention_xla(q, k_pages, v_pages, page_table, lengths,
                               k_scale=None, v_scale=None,
                               out_dtype=jnp.bfloat16):
    """Reference/fallback path: gather pages dense, masked softmax."""
    B, KH, G, D = q.shape
    k = paged_gather_dense(k_pages, page_table).astype(jnp.float32)
    v = paged_gather_dense(v_pages, page_table).astype(jnp.float32)
    S = k.shape[1]
    k = k.reshape(B, S, KH, D)
    v = v.reshape(B, S, KH, D)
    if k_scale is not None:
        k = k * jnp.asarray(k_scale, jnp.float32)
    if v_scale is not None:
        v = v * jnp.asarray(v_scale, jnp.float32)
    s = jnp.einsum("bhgd,bshd->bhgs", q.astype(jnp.float32), k) / jnp.sqrt(
        jnp.float32(D)
    )
    pos = jnp.arange(S, dtype=jnp.int32)[None, None, None, :]
    s = jnp.where(pos < lengths[:, None, None, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhgs,bshd->bhgd", p, v)
    return out.astype(out_dtype)


def paged_attention_ok(B: int, KH: int, G: int, D: int, page_size: int) -> bool:
    if jax.default_backend() != "tpu":
        return False
    return D % 128 == 0 and page_size % 8 == 0
