"""Data-dependent block-sparse decode attention (calibrated skip-softmax).

TPU recast of the reference's flash_skip_softmax (reference:
modelopt/torch/sparsity/attention_sparsity/methods/flash_skip_softmax.py:
skip KV regions whose scores cannot survive the softmax). A Triton-style
"decide inside the kernel" skip cannot save HBM on TPU — Pallas prefetches
blocks ahead of the compute — so the decision moves BEFORE the kernel:

  1. per-block K summaries (elementwise min/max over each block of the
     cache) are maintained incrementally as tokens are written;
  2. a cheap jitted pass turns them into per-block score UPPER BOUNDS
     (Quest-style: ub = sum_d max(q_d * kmax_d, q_d * kmin_d));
  3. blocks with ub < max_ub - tau are dropped (their post-softmax mass is
     <= block_size * exp(-tau)); survivors' indices land in a block table;
  4. THIS kernel routes its DMAs through the block table via scalar
     prefetch — skipped blocks are never read from HBM at all.

The tau threshold is calibrated offline (sparsity/skip_softmax.py) on
long-context data against a softmax-mass recall target — the reference's
calibrated-threshold idea (attention_sparsity/calibration/calibrate.py)
with an analytic bound instead of a heuristic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bs_attn_kernel(sel_ref, nvalid_ref, lens_ref, scales_ref,
                    q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
                    *, block_size: int):
    from .attention import _attend_chunk, _finalize_out

    b = pl.program_id(0)
    p = pl.program_id(1)
    n_sel = pl.num_programs(1)
    L = lens_ref[b]

    @pl.when(p == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(p < nvalid_ref[b])
    def _attend():
        _attend_chunk(q_ref, k_ref, v_ref, sel_ref[b, p] * block_size,
                      L, scales_ref[0], acc_ref, m_ref, l_ref)

    @pl.when(p == n_sel - 1)
    def _finalize():
        _finalize_out(o_ref, acc_ref, l_ref, scales_ref[1])


@functools.partial(jax.jit, static_argnames=("block_size", "out_dtype"))
def block_sparse_decode_attention(q, k_cache, v_cache, sel, nvalid, lengths,
                                  k_scale=None, v_scale=None,
                                  block_size: int = 128,
                                  out_dtype=jnp.bfloat16):
    """q [B, KH, G, D]; k/v_cache [B, S, KH*D] dense caches (bf16 or e4m3);
    sel [B, NSEL] int32 block indices (invalid tail entries must alias a
    valid block, e.g. 0); nvalid [B] number of live entries; lengths [B].
    Only selected blocks are DMA'd; returns [B, KH, G, D]."""
    from .attention import _SCRATCH, _scales_arr

    B, KH, G, D = q.shape
    S = k_cache.shape[1]
    NSEL = sel.shape[1]
    # leading-dim split only: no relayout (the tiled last-two dims are kept)
    kb = k_cache.reshape(B, S // block_size, block_size, KH * D)
    vb = v_cache.reshape(B, S // block_size, block_size, KH * D)
    scales = _scales_arr(k_scale, v_scale)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, NSEL),
        in_specs=[
            pl.BlockSpec((1, KH, G, D),
                         lambda b, p, sel, nv, lens, sc: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_size, KH * D),
                         lambda b, p, sel, nv, lens, sc: (b, sel[b, p], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_size, KH * D),
                         lambda b, p, sel, nv, lens, sc: (b, sel[b, p], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, KH, G, D),
                               lambda b, p, sel, nv, lens, sc: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=_SCRATCH(KH, G, D),
    )
    kernel = functools.partial(_bs_attn_kernel, block_size=block_size)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KH, G, D), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * KH * G * NSEL * block_size * D,
            bytes_accessed=2 * B * KH * NSEL * block_size * D
            * k_cache.dtype.itemsize,
            transcendentals=B * KH * G * NSEL * block_size,
        ),
    )(sel.astype(jnp.int32), nvalid.astype(jnp.int32),
      lengths.astype(jnp.int32), scales, q, kb, vb)


def block_sparse_decode_attention_xla(q, k_cache, v_cache, sel, nvalid,
                                      lengths, k_scale=None, v_scale=None,
                                      block_size: int = 128,
                                      out_dtype=jnp.bfloat16):
    """Bit-identical CPU/test fallback: gather the selected blocks dense,
    mask invalid entries, plain softmax. Caches are [B, S, KH*D]."""
    B, KH, G, D = q.shape
    S = k_cache.shape[1]
    NSEL = sel.shape[1]
    kb = k_cache.reshape(B, S // block_size, block_size, KH, D)
    vb = v_cache.reshape(B, S // block_size, block_size, KH, D)
    rows = jnp.arange(B)[:, None]
    kg = kb[rows, sel].astype(jnp.float32)  # [B, NSEL, bs, KH, D]
    vg = vb[rows, sel].astype(jnp.float32)
    if k_scale is not None:
        kg = kg * jnp.asarray(k_scale, jnp.float32)
    if v_scale is not None:
        vg = vg * jnp.asarray(v_scale, jnp.float32)
    kg = kg.reshape(B, NSEL * block_size, KH, D)
    vg = vg.reshape(B, NSEL * block_size, KH, D)
    s = jnp.einsum("bhgd,bshd->bhgs", q.astype(jnp.float32), kg) / jnp.sqrt(
        jnp.float32(D)
    )
    # positions of gathered tokens + slot validity
    off = jnp.arange(block_size, dtype=jnp.int32)
    pos = (sel[..., None] * block_size + off[None, None, :]).reshape(B, -1)
    slot_ok = (jnp.arange(NSEL, dtype=jnp.int32)[None, :, None]
               < nvalid[:, None, None])
    ok = (pos < lengths[:, None]) & jnp.broadcast_to(
        slot_ok, (B, NSEL, block_size)
    ).reshape(B, -1)
    s = jnp.where(ok[:, None, None, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhgs,bshd->bhgd", p, vg)
    return out.astype(out_dtype)


def block_sparse_ok(B: int, KH: int, G: int, D: int, block_size: int) -> bool:
    if jax.default_backend() != "tpu":
        return False
    if D % 128 != 0 or block_size % 8 != 0:
        return False
    return KH * G >= 1 and block_size * KH >= 128
