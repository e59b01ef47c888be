"""Pallas decode attention over a (quantized) KV cache.

Replaces the reference's Triton decode/flash kernels for quantized KV
(reference: modelopt/torch/kernels/common/attention/decode_attention.py,
triton_fa.py, kernels/quantization/attention/bmm2_qdq.py) with a Mosaic
kernel: fp8 (e4m3) KV codes are read straight from HBM-resident cache
blocks, dequantized on the fly in VMEM, and never materialized in HBM —
the XLA fallback converts the whole cache to bf16 in HBM every step.

Cache layout is [B, S, KH*D] (token dim second-minor, heads MERGED into
the lane dim). The merge is the load-bearing choice for quantized caches:
Mosaic tiles the last two dims, and 1-byte dtypes tile (32, 128) — a
[B, S, KH, D] cache puts KH (typically 8) on the sublane axis, so every
fp8/int8 DMA moves 4x the bytes (measured 73 GB/s effective vs 698 for
bf16 on v5e). With KH*D (>= 1024) on the lane axis, cache rows are dense
full tiles for every storage dtype, per-token writes are leading-dim DMA
slices, and a head's [tokens, D] view is a 128-aligned lane slice.

Attention kernels: grid (B, S/chunk) with online softmax accumulation
across chunks; per chunk a short unrolled loop over KV heads does
q_h [G, D] x k_h [chunk, D]^T on the MXU (decode is HBM-bound — MXU
utilization is irrelevant, DMA density is everything).
Decode-only (T==1); prefill stays on the XLA path where the MXU-bound
einsum formulation is already efficient.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_FORCE_XLA_ATTN = 0


def _pallas_attn_disabled() -> bool:
    """Emergency kill-switch: MODELOPT_TPU_NO_PALLAS_ATTN=1 routes decode
    attention and cache writes to the XLA fallbacks (checked at trace
    time, so it composes with jit retracing after a failed compile).
    ``xla_attention()`` does the same per trace — the mesh-sharded serving
    engine uses it because a pallas_call inside a GSPMD-partitioned program
    would need an explicit shard_map wrapper (future work)."""
    if _FORCE_XLA_ATTN:
        return True
    return os.environ.get("MODELOPT_TPU_NO_PALLAS_ATTN", "0") not in ("0", "")


class xla_attention:
    """Context manager: trace with the XLA attention fallbacks (wrap the
    first call of a jitted fn; cached executions don't retrace)."""

    def __enter__(self):
        global _FORCE_XLA_ATTN
        _FORCE_XLA_ATTN += 1

    def __exit__(self, *exc):
        global _FORCE_XLA_ATTN
        _FORCE_XLA_ATTN -= 1


def _e4m3_to_bf16(x):
    """Exact e4m3 -> bf16 by assembling the f32 bit pattern with integer
    VPU ops + one 32-bit bitcast (the _decode_e2m1 pattern from
    quant_gemm). v5e has no hardware fp8 convert: the native e4m3->bf16
    lowering runs at ~90 Gelem/s (measured on chip), which gated fp8-KV
    decode reads at ~70 GB/s effective — 10x below the int8 cache path.
    Normals: f32 exponent field = e + 120, mantissa = m << 20; subnormals
    (e == 0): m * 2^-9 via the (fast) int->f32 convert. e4m3fn NaN (0x7f)
    decodes to 480 — no NaN is ever written to a KV cache."""
    b = jax.lax.bitcast_convert_type(x, jnp.int8).astype(jnp.int32) & 0xFF
    e = (b >> 3) & 0xF
    m = b & 0x7
    norm = ((e + 120) << 23) | (m << 20)
    sub = jax.lax.bitcast_convert_type(
        m.astype(jnp.float32) * jnp.float32(2.0 ** -9), jnp.int32)
    bits = ((b & 0x80) << 24) | jnp.where(e > 0, norm, sub)
    return jax.lax.bitcast_convert_type(bits, jnp.float32).astype(jnp.bfloat16)


def _load_kv_block(ref, lead):
    """Cache-block load in compute dtype: bf16/int8 ride the hardware
    convert; e4m3 takes the bit-assembly decode above."""
    if ref.dtype == jnp.float8_e4m3fn:
        return _e4m3_to_bf16(ref[lead])
    return ref[lead].astype(jnp.bfloat16)


def _headblock_mask(KHG, KH, G, D):
    """[KHG, KH*D] bool: True where lane l's head (l // D) == row r's head
    (r // G). 2-D iotas only — 3-D i1 masks trip a Mosaic relayout error
    ('non-singleton logical dimension is replicated') on v5e."""
    rowh = jax.lax.broadcasted_iota(jnp.int32, (KHG, KH * D), 0) // G
    laneh = jax.lax.broadcasted_iota(jnp.int32, (KHG, KH * D), 1) // D
    return rowh == laneh


def _head_sel(y, KH, G, D):
    """[KH*G, KH*D] -> [KH*G, D]: keep row r's own head block (r // G),
    folding the lane groups with KH aligned [*, D] adds (no 3-D reshapes)."""
    KHG = KH * G
    z = jnp.where(_headblock_mask(KHG, KH, G, D), y, 0.0)
    acc = z[:, :D]
    for h in range(1, KH):
        acc = acc + z[:, h * D:(h + 1) * D]
    return acc


def _q_blockdiag(q_ref):
    """q [1, KH, G, D] -> block-diagonal [KH*G, KH*D] bf16: row h*G+g holds
    q[h, g] in lanes h*D:(h+1)*D, zeros elsewhere. One MXU matmul against
    the lane-merged cache rows then scores ALL heads at once — decode is
    HBM-bound and the MXU idles, but the per-head python loop's 16 tiny
    ops per chunk made the GRID-STEP BODY the bottleneck at short contexts
    (64-slot grid = ~190 us/layer measured; batched ~= one dot)."""
    KH, G, D = q_ref.shape[1:]
    KHG = KH * G
    q2 = q_ref[0].astype(jnp.bfloat16).reshape(KHG, D)
    qt = jnp.concatenate([q2] * KH, axis=1)                    # [KHG, KHD]
    return jnp.where(_headblock_mask(KHG, KH, G, D), qt, jnp.bfloat16(0))


def _attend_chunk(q_ref, k_ref, v_ref, base, L, k_scale,
                  acc_ref, m_ref, l_ref, softcap=None):
    """One online-softmax update over a KV chunk, ALL heads batched.

    q_ref block [1, KH, G, D]; k/v_ref blocks [1, ..., tokens, KH*D] in
    storage dtype (any leading singleton dims); ``base`` the chunk's first
    token position; L valid length.
    Scratch: acc [KH*G, D] f32, m/l [KH*G, 128] f32.
    """
    KH, G, D = q_ref.shape[1:]
    KHG = KH * G
    tokens = k_ref.shape[-2]
    lead = (0,) * (len(k_ref.shape) - 2)
    int8_mxu = k_ref.dtype == jnp.int8 and v_ref.dtype == jnp.int8
    inv_sqrt_d = k_scale / jnp.sqrt(jnp.float32(D))
    if int8_mxu:
        # INT8 caches never leave int8: the score dot runs on the int8 MXU
        # against the raw codes (q requantized per row — per (head, group) —
        # to int8), so the per-element VPU convert of the whole chunk
        # disappears. The convert was the decode-read bottleneck: int8->bf16
        # of a [chunk, KHD] block gated reads at ~340 GB/s vs ~760 for bf16
        # (measured on v5e at S=2048).
        qf = _q_blockdiag(q_ref).astype(jnp.float32)           # [KHG, KHD]
        qmax = jnp.maximum(jnp.max(jnp.abs(qf), axis=1, keepdims=True),
                           jnp.float32(1e-30))
        q8 = jnp.round(qf * (127.0 / qmax)).astype(jnp.int8)
        s32 = jax.lax.dot_general(
            q8, k_ref[lead], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        s = s32.astype(jnp.float32) * (qmax * (inv_sqrt_d / 127.0))
    else:
        qbd = _q_blockdiag(q_ref)                              # [KHG, KHD]
        kb = _load_kv_block(k_ref, lead)                       # [tokens, KHD]
        s = jax.lax.dot_general(
            qbd, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * inv_sqrt_d                                         # [KHG, tokens]
    if softcap is not None:  # gemma2-style tanh logit cap (static)
        s = jnp.tanh(s / softcap) * softcap
    col = jax.lax.broadcasted_iota(jnp.int32, (KHG, tokens), 1)
    s = jnp.where(base + col < L, s, -1e30)
    m_prev = m_ref[:, :1]                                      # [KHG, 1]
    m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_cur)
    e = jnp.exp(s - m_cur)
    if int8_mxu:
        # P.V rides the int8 MXU too: probabilities requantize to 7 bits
        # (e in [0, 1] -> round(e * 127)); numerator AND denominator use the
        # SAME e8 weights, so the output stays a convex combination of
        # (int8-coded) values — the requantization perturbs weights by
        # <= 0.5/127 each, comparable to the cache's own storage error.
        e8 = jnp.round(e * 127.0).astype(jnp.int8)
        esum = jnp.sum(e8.astype(jnp.float32), axis=1, keepdims=True) \
            * jnp.float32(1.0 / 127.0)
        y = jax.lax.dot_general(
            e8, v_ref[lead], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * jnp.float32(1.0 / 127.0)
    else:
        vb = _load_kv_block(v_ref, lead)
        esum = jnp.sum(e, axis=1, keepdims=True)
        y = jax.lax.dot_general(
            e.astype(jnp.bfloat16), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                      # [KHG, KHD]
    l_ref[:] = jnp.broadcast_to(l_ref[:, :1] * alpha + esum, (KHG, 128))
    acc_ref[:] = acc_ref[:] * alpha + _head_sel(y, KH, G, D)
    m_ref[:] = jnp.broadcast_to(m_cur, (KHG, 128))


def _finalize_out(o_ref, acc_ref, l_ref, v_scale, m_ref=None, sinks_ref=None):
    KH, G, D = o_ref.shape[1:]
    KHG = KH * G
    acc = acc_ref[:]
    l_fin = l_ref[:, :1]
    if sinks_ref is not None:
        # learned attention sink (gpt-oss): one extra logit joins the
        # softmax; its mass is dropped, so only the denominator moves
        sink = sinks_ref[0].reshape(KHG, 128)[:, :1]           # [KHG, 1]
        m_prev = m_ref[:, :1]
        m_fin = jnp.maximum(m_prev, sink)
        alpha = jnp.exp(m_prev - m_fin)
        acc = acc * alpha
        l_fin = l_fin * alpha + jnp.exp(sink - m_fin)
    out = acc * (v_scale / jnp.maximum(l_fin, 1e-30))
    o_ref[0] = out.reshape(KH, G, D).astype(o_ref.dtype)


_SCRATCH = lambda KH, G, D: [  # noqa: E731
    pltpu.VMEM((KH * G, D), jnp.float32),
    pltpu.VMEM((KH * G, 128), jnp.float32),
    pltpu.VMEM((KH * G, 128), jnp.float32),
]


def _scales_arr(k_scale, v_scale):
    return jnp.stack([
        jnp.asarray(1.0 if k_scale is None else k_scale, jnp.float32).reshape(()),
        jnp.asarray(1.0 if v_scale is None else v_scale, jnp.float32).reshape(()),
    ])


def _decode_attn_kernel(lens_ref, scales_ref, q_ref, sinks_ref, k_ref, v_ref,
                        o_ref, acc_ref, m_ref, l_ref, *, chunk: int,
                        softcap, use_sinks):
    b = pl.program_id(0)
    c = pl.program_id(1)
    nc = pl.num_programs(1)
    L = lens_ref[b]

    @pl.when(c == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(c * chunk < L)
    def _attend():
        _attend_chunk(q_ref, k_ref, v_ref, c * chunk, L,
                      scales_ref[0], acc_ref, m_ref, l_ref, softcap=softcap)

    @pl.when(c == nc - 1)
    def _finalize():
        _finalize_out(o_ref, acc_ref, l_ref, scales_ref[1], m_ref,
                      sinks_ref if use_sinks else None)


@functools.partial(jax.jit,
                   static_argnames=("out_dtype", "chunk", "softcap"))
def decode_attention(q, k_cache, v_cache, lengths, k_scale=None, v_scale=None,
                     out_dtype=jnp.bfloat16, chunk=256, sinks=None,
                     softcap=None):
    """q [B, KH, G, D]; k/v_cache [B, S, KH*D] (bf16 / float8_e4m3fn / int8
    codes) — the models.transformer.make_cache native layout, read in place
    with NO per-step transpose/copy of the cache; lengths [B] valid key
    counts; scalar scales for quantized caches. ``sinks`` [KH, G] learned
    per-head sink logits (gpt-oss); ``softcap`` a static gemma2-style tanh
    cap. Returns [B, KH, G, D]."""
    B, KH, G, D = q.shape
    S = k_cache.shape[1]
    if S % chunk:
        chunk = S  # small caches: single chunk
    nc = S // chunk
    use_sinks = sinks is not None
    # sinks ride a tiny VMEM block; without sinks a 1-row dummy keeps the
    # kernel signature static at zero extra DMA cost
    sh = (KH, G) if use_sinks else (1, 1)
    sinks_arr = jnp.broadcast_to(
        jnp.asarray(sinks if use_sinks else 0.0,
                    jnp.float32).reshape(sh + (1,)),
        sh + (128,),
    )[None]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, nc),
        in_specs=[
            pl.BlockSpec((1, KH, G, D), lambda b, c, *_: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + sh + (128,), lambda b, c, *_: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            # length-clamped fetch (see fused_decode_attention): chunks past
            # the live length repeat a block index and are never DMA'd
            pl.BlockSpec((1, chunk, KH * D),
                         lambda b, c, lens, *_: (
                             b,
                             jnp.minimum(c, jnp.maximum(lens[b] - 1, 0) // chunk),
                             0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, KH * D),
                         lambda b, c, lens, *_: (
                             b,
                             jnp.minimum(c, jnp.maximum(lens[b] - 1, 0) // chunk),
                             0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, KH, G, D), lambda b, c, *_: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=_SCRATCH(KH, G, D),
    )
    kernel = functools.partial(_decode_attn_kernel, chunk=chunk,
                               softcap=softcap, use_sinks=use_sinks)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KH, G, D), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * KH * G * S * D,
            bytes_accessed=2 * B * KH * S * D * k_cache.dtype.itemsize,
            transcendentals=B * KH * G * S,
        ),
    )(lengths.astype(jnp.int32), _scales_arr(k_scale, v_scale),
      q, sinks_arr, k_cache, v_cache)


def _kv_write_kernel(start_ref, v_ref, cache_ref, o_ref, sem):
    del cache_ref
    b = pl.program_id(0)
    T = v_ref.shape[1]
    s = start_ref[b]
    # 4-D [.., T/S, KHD//128, 128] views: every sliced dim (batch, row) is
    # LEADING, and the tiled last-two dims (sublane, lane) stay full — a
    # 3-D [B, S, KHD] memref puts rows on the sublane dim, where Mosaic
    # refuses T=1 slices of padded tiles ("slice shape along dimension 1
    # must be aligned to tiling"), in VMEM and HBM alike.
    copy = pltpu.make_async_copy(
        v_ref.at[b],                 # [T, KHD//128, 128] rows in HBM
        o_ref.at[b, pl.ds(s, T)],    # routed row slice of the HBM cache
        sem,
    )
    copy.start()
    copy.wait()


@jax.jit
def dense_kv_write(cache, vals, start):
    """Write vals [B, T, KH*D] into cache [B, S, KH*D] at per-slot
    sequence offsets ``start`` [B] (no alignment requirement).

    TPU: Pallas aliased-output kernel — the cache stays in HBM (ANY) and
    each slot issues ONE explicit DMA of its [T, KH*D] update straight to
    the routed offset; only touched rows move, and the sliced dims are
    LEADING dims so Mosaic's (sublane, lane) tiling constraints never
    apply. XLA's scatter AND vmapped dynamic_update_slice both lower
    pathologically for this access pattern on TPU (minutes of compile,
    ~0.6 ms/layer measured — they rewrite the whole per-slot cache).
    CPU/tests: vmapped DUS is fine.
    """
    B, T, KHD = vals.shape
    # Mosaic can only slice tiled (sublane, lane) dims at tile granularity:
    # the lane dim must fill 128-lane tiles or the memref_slice fails to
    # lower (observed on v5e with D=16 test models), AND the 4-D view's
    # row-of-tiles dim (KHD//128) must fill the dtype's packed sublane
    # tile — 4 for <=2-byte dtypes (v5e probe: nsub 4/8 lower for
    # bf16/int8/e4m3, nsub 1/2/3 all fail, e.g. the 128-wide MLA latent
    # slab of tiny test models). Small models take the XLA path — their
    # caches are tiny, so the scatter pathology doesn't bite.
    sub_tile = 4 if cache.dtype.itemsize <= 2 else 8
    if (jax.default_backend() != "tpu" or KHD % 128
            or (KHD // 128) % sub_tile or _pallas_attn_disabled()):
        return jax.vmap(
            lambda c, u, s: jax.lax.dynamic_update_slice(c, u, (s, 0))
        )(cache, vals.astype(cache.dtype), start)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            # vals: DMA source pinned to HBM — ANY lets Mosaic stage small
            # arrays in VMEM, where a T=1 row is an illegal sub-tile slice
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pl.ANY),  # cache: aliased, not read
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    S = cache.shape[1]
    nsub = KHD // 128
    # 4-D bitcast views (free): rows become leading-dim slices
    out = pl.pallas_call(
        _kv_write_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, S, nsub, 128), cache.dtype),
        input_output_aliases={2: 0},  # cache (3rd input incl. prefetch) -> out
    )(start.astype(jnp.int32),
      vals.astype(cache.dtype).reshape(B, T, nsub, 128),
      cache.reshape(B, S, nsub, 128))
    return out.reshape(B, S, KHD)


def decode_attention_ok(q_shape, S: int, cache_dtype=None) -> bool:
    """Use the kernel only where it wins: quantized caches (XLA would
    materialize a dequantized bf16 copy of the whole cache every step). For
    bf16 caches at decode the XLA einsum path is already fine and the
    per-call kernel overhead is a net loss (measured on v5e)."""
    B, KH, G, D = q_shape
    if jax.default_backend() != "tpu":
        return False
    if cache_dtype is not None and cache_dtype not in (
            jnp.float8_e4m3fn, jnp.int8):
        # bf16 decode: the XLA einsum path is already fine and the per-call
        # kernel overhead is a net loss (measured on v5e)
        return False
    if S > 8192 or D % 128 != 0:
        return False
    return True


# ---------------------------------------------------------------------------
# Fused decode step: KV-cache write + attention in ONE kernel
# ---------------------------------------------------------------------------
_SLAB = 8  # HBM sublane tile: memref_slice on the token dim must move
# whole 8-row tiles (Mosaic refuses smaller/unaligned slices for every
# cache dtype; verified on v5e for bf16/fp8/int8).
_SLAB_BUFS = 4  # slab scratch ring: read issued one slot ahead, write
# drained NB-1 slots behind — hides the RMW DMA latency even at nc == 1


def _fused_decode_kernel(pos_ref, scales_ref, q_ref, sinks_ref, knew_ref,
                         vnew_ref, k_ref, v_ref, o_ref,
                         kout_ref, vout_ref,
                         acc_ref, m_ref, l_ref, slab_k, slab_v,
                         sem_wk, sem_wv, *, chunk: int,
                         softcap, use_sinks):
    b = pl.program_id(0)
    c = pl.program_id(1)
    nc = pl.num_programs(1)
    B = pl.num_programs(0)
    L = pos_ref[b]  # OLD length == write position of the new token
    k_scale = scales_ref[0]
    v_scale = scales_ref[1]
    KH, G, D = q_ref.shape[1:]
    P = _SLAB
    NB = _SLAB_BUFS

    # Cache write = write-only splice of the 8-row HBM tile around row L:
    # Mosaic only DMAs whole (8, 128) tiles on the token dim, so rows != L
    # must be rewritten byte-identical and row L is masked out of the
    # attention (the new token joins from VMEM in _finalize). The slab
    # rows are ALREADY IN VMEM: at this slot's last grid step the
    # length-clamped index map fetched chunk L // chunk, which contains
    # rows Ld..Ld+P-1 — so the old bytes splice from k_ref/v_ref with no
    # HBM slab read at all. (The previous design DMA'd the slab from HBM
    # with a slot-ahead lookahead + 2 read semaphores; dropping it
    # measured 32% faster at S=256 with bit-identical caches.) Only the
    # write-back DMAs remain, draining NB slots behind on a FIFO
    # semaphore (any same-shape descriptor can wait a DMA semaphore).
    def _slab_wr_copy(slot, src_k, src_v, dst_off):
        return (pltpu.make_async_copy(
                    src_k, kout_ref.at[slot, pl.ds(dst_off, P)], sem_wk),
                pltpu.make_async_copy(
                    src_v, vout_ref.at[slot, pl.ds(dst_off, P)], sem_wv))

    @pl.when(c == nc - 1)
    def _slab_write():
        buf = jax.lax.rem(b, NB)

        @pl.when(b >= NB)
        def _drain_oldest():
            # buffer b % NB was last used by slot b - NB: wait ONE
            # write-back per cache (FIFO) before overwriting it
            ck, cv = _slab_wr_copy(b, slab_k.at[buf], slab_v.at[buf], 0)
            ck.wait()
            cv.wait()

        Ld = (L // P) * P
        # in-chunk slab offset, written so Mosaic can prove 8-alignment
        off = (jax.lax.rem(L, chunk) // P) * P
        row = jax.lax.broadcasted_iota(jnp.int32, (P, KH * D), 0)
        is_new = row == (L - Ld)
        kold = k_ref[0, pl.ds(off, P), :].astype(jnp.bfloat16)
        vold = v_ref[0, pl.ds(off, P), :].astype(jnp.bfloat16)
        knew = jnp.broadcast_to(knew_ref[0].astype(jnp.bfloat16), (P, KH * D))
        vnew = jnp.broadcast_to(vnew_ref[0].astype(jnp.bfloat16), (P, KH * D))
        # bf16 round-trips every cache dtype exactly (e4m3 / int8 / bf16)
        slab_k[buf] = jnp.where(is_new, knew, kold).astype(slab_k.dtype)
        slab_v[buf] = jnp.where(is_new, vnew, vold).astype(slab_v.dtype)
        wk, wv = _slab_wr_copy(b, slab_k.at[buf], slab_v.at[buf], Ld)
        wk.start()
        wv.start()

    @pl.when((b == B - 1) & (c == nc - 1))
    def _drain_last():
        for _ in range(min(NB, B)):
            ck, cv = _slab_wr_copy(b, slab_k.at[0], slab_v.at[0], 0)
            ck.wait()
            cv.wait()

    @pl.when(c == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(c * chunk < L)
    def _attend():
        # STRICTLY the old keys: the new token's row is added inline below
        # (its HBM row may still be mid-DMA; stale data there is masked out
        # by the L bound)
        _attend_chunk(q_ref, k_ref, v_ref, c * chunk, L,
                      k_scale, acc_ref, m_ref, l_ref, softcap=softcap)

    @pl.when(c == nc - 1)
    def _finalize():
        # the new token attends to itself from VMEM (never from HBM),
        # batched over all heads: block-diagonal q rows dot the lane-merged
        # new-token row elementwise (tiny N=1 dot_generals trip a Mosaic
        # bf16->f32 vector.broadcast verification error on v5e, so the
        # score is an explicit multiply+reduce).
        KHG = KH * G
        inv_sqrt_d = k_scale / jnp.sqrt(jnp.float32(D))
        qbd = _q_blockdiag(q_ref).astype(jnp.float32)           # [KHG, KHD]
        kn = knew_ref[0].astype(jnp.float32)                    # [1, KHD]
        s_n = jnp.sum(qbd * kn, axis=1, keepdims=True) * inv_sqrt_d
        if softcap is not None:
            s_n = jnp.tanh(s_n / softcap) * softcap
        m_prev = m_ref[:, :1]
        m_fin = jnp.maximum(m_prev, s_n)
        alpha = jnp.exp(m_prev - m_fin)
        e_n = jnp.exp(s_n - m_fin)                              # [KHG, 1]
        l_fin = l_ref[:, :1] * alpha + e_n
        vn = jnp.broadcast_to(
            vnew_ref[0].astype(jnp.float32), (KHG, KH * D))
        vsel = _head_sel(vn, KH, G, D)                          # [KHG, D]
        acc = acc_ref[:] * alpha + e_n * vsel
        if use_sinks:
            # learned sink: extra softmax slot whose mass is dropped
            sink = sinks_ref[0].reshape(KHG, 128)[:, :1]
            m2 = jnp.maximum(m_fin, sink)
            a2 = jnp.exp(m_fin - m2)
            acc = acc * a2
            l_fin = l_fin * a2 + jnp.exp(sink - m2)
        out = acc * (v_scale / jnp.maximum(l_fin, 1e-30))
        o_ref[0] = out.reshape(KH, G, D).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("out_dtype", "chunk", "softcap"))
def fused_decode_attention(q, k_new, v_new, k_cache, v_cache, pos,
                           k_scale=None, v_scale=None,
                           out_dtype=jnp.bfloat16, chunk=256, sinks=None,
                           softcap=None):
    """One decode step, fused: write k/v_new [B, 1, KH*D] (already in the
    cache's dtype/codes) into the caches at per-slot position ``pos`` [B]
    AND return attention of q [B, KH, G, D] over pos+1 keys (the new token
    contributes from VMEM while its HBM write DMA is still in flight).

    Returns (out [B, KH, G, D], k_cache', v_cache') with the caches
    aliased/donated — the separate dense_kv_write + decode_attention pair
    costs ~0.2 ms/call of serialized DMA latency per layer; fused, the
    writes ride behind the attention compute for free."""
    B, S, KHD = k_cache.shape
    KH, G, D = q.shape[1:]
    if S % chunk:
        chunk = S
    nc = S // chunk
    use_sinks = sinks is not None
    sh = (KH, G) if use_sinks else (1, 1)
    sinks_arr = jnp.broadcast_to(
        jnp.asarray(sinks if use_sinks else 0.0,
                    jnp.float32).reshape(sh + (1,)),
        sh + (128,),
    )[None]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, nc),
        in_specs=[
            pl.BlockSpec((1, KH, G, D), lambda b, c, *_: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + sh + (128,), lambda b, c, *_: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, KHD), lambda b, c, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, KHD), lambda b, c, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            # length-clamped chunk fetch: chunks past a slot's live length
            # repeat the clamp chunk's block index, so Pallas never DMAs
            # them (compute there is skipped by the in-kernel pl.when) —
            # decode attention reads scale with ACTUAL context, not S
            pl.BlockSpec((1, chunk, KHD),
                         lambda b, c, pos, *_: (b, jnp.minimum(c, pos[b] // chunk), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, KHD),
                         lambda b, c, pos, *_: (b, jnp.minimum(c, pos[b] // chunk), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, KH, G, D), lambda b, c, *_: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=_SCRATCH(KH, G, D) + [
            pltpu.VMEM((_SLAB_BUFS, _SLAB, KHD), k_cache.dtype),
            pltpu.VMEM((_SLAB_BUFS, _SLAB, KHD), v_cache.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(_fused_decode_kernel, chunk=chunk,
                               softcap=softcap, use_sinks=use_sinks)
    kn = k_new.astype(k_cache.dtype)
    vn = v_new.astype(v_cache.dtype)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, KH, G, D), out_dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        # inputs incl. prefetch: 0=pos 1=scales 2=q 3=sinks 4=knew 5=vnew
        # 6=k 7=v
        input_output_aliases={6: 1, 7: 2},
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * KH * G * S * D,
            bytes_accessed=2 * B * KH * S * D * k_cache.dtype.itemsize,
            transcendentals=B * KH * G * S,
        ),
    )(pos.astype(jnp.int32), _scales_arr(k_scale, v_scale), q, sinks_arr,
      kn, vn, k_cache, v_cache)


def fused_decode_ok(q_shape, S: int, cache_dtype=None) -> bool:
    """The fused write+attend kernel serves bf16 AND fp8 caches at decode
    (unlike the read-only kernel, it also eliminates the per-layer cache
    write, so it wins for bf16 too)."""
    B, KH, G, D = q_shape
    if jax.default_backend() != "tpu" or _pallas_attn_disabled():
        return False
    return S <= 8192 and D % 128 == 0 and S % _SLAB == 0
