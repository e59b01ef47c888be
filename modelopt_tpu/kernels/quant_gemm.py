"""Pallas TPU kernels: fused dequantize-GEMM for packed low-bit weights.

Replaces the reference's CUDA/Triton dequant-GEMM path
(reference: modelopt/torch/quantization/backends/nvfp4_gemm.py:28-60,
kernels/quantization/gemm/*) with Mosaic kernels designed for the
weight-bound decode regime: packed weights stream HBM->VMEM at 4-8x lower
byte volume than bf16, are unpacked on the VPU, and fed to the MXU per
128-row block with per-block scales applied to the f32 accumulator.

Layouts match quant/qtensor.py (split-half nibble packing — no interleave
reshapes, just two half-GEMMs). Decode (small M) uses these kernels; prefill
(large M, compute-bound) uses the XLA dequant+matmul fallback — dispatch in
quant/backends.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tn(N: int, K: int = 4096, bytes_per_k: float = 3.0) -> int:
    """Largest N-tile whose weight block (+ a converted copy) fits a VMEM
    budget of ~5MB alongside x and the accumulator. Bigger tiles amortize
    per-program costs (measured on v5e at K=4096, N=28672: TN=1024 203 GB/s
    vs TN=512 190 vs TN=256 123)."""
    for tn in (1024, 512, 256, 128):
        if N % tn == 0 and K * tn * bytes_per_k <= 5e6:
            return tn
    if N % 128 == 0:
        return 128
    raise ValueError(f"N={N} not a multiple of 128")


def _pick_tiles(N: int, K2: int, block: int, budget: float = 2e6):
    """(TN, TK2) for the K-tiled int4 kernels: keep the N-tile WIDE (narrow
    column slices of the packed rows make strided, low-density HBM reads —
    the down-projection K=14336 shape measured 213 GB/s with TN=256 vs ~430
    for wide tiles) and bound the packed block bytes by tiling K instead.
    TK2 is a multiple of ``block`` dividing K2 so every tile holds whole
    scale blocks."""
    TN = next((t for t in (1024, 512, 256, 128) if N % t == 0), None)
    if TN is None:
        raise ValueError(f"N={N} not a multiple of 128")
    nblocks = K2 // block
    best = None
    for d in range(nblocks, 0, -1):
        if nblocks % d == 0 and d * block * TN <= budget:
            best = d
            break
    if best is None:
        best = 1
    return TN, best * block


def _pad_m(x, mult=8):
    M = x.shape[0]
    pad = (-M) % mult
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x, M


def _pick_prefill_tiles(K2: int, N: int, block: int, x_bytes: int = 1,
                        budget: float = 6e6):
    """(TM, TN) for the prefill (large-M) int4 kernels: 2-D (M, N) grid
    with the whole K in every tile — all packed-row offsets stay STATIC so
    Mosaic keeps the MXU dots overlapped with the VPU scale chain (the
    K-tiled variant's dynamic ``k*TK2`` offsets serialize; measured 34
    TFLOPS on the qkv shape vs 160+ here). Budget is per-buffer-set; Pallas
    double-buffers streamed blocks, so stay well under VMEM/2."""
    best = None
    for tn in (1024, 512, 256, 128):
        if N % tn:
            continue
        for tm in (512, 256, 128, 64):
            use = (tm * 2 * K2 * x_bytes + K2 * tn + tm * tn * 4
                   + (2 * K2 // block) * tn * 4)
            if use <= budget:
                if best is None or tm * tn > best[0] * best[1]:
                    best = (tm, tn)
                break
    return best


# ---------------------------------------------------------------------------
# W4A16: int4 block-quantized weights (offset-binary nibbles, split-half)
# ---------------------------------------------------------------------------
_CHUNK = 256  # K-rows dequantized per MXU dot: deep enough to hide VPU work


def _nvfp4_chunk(K2: int, block: int = 16):
    """Largest chunk <= _CHUNK that tiles the packed rows in whole scale
    blocks (K2=704 -> 176 at block 16); None if no clean chunking exists."""
    for c in range(min(_CHUNK, K2), 0, -1):
        if c % block == 0 and K2 % c == 0:
            return c
    return None


def _expand_matrix(ch: int, nblk: int):
    """0/1 matrix [ch, nblk] mapping scale rows to weight rows; scale
    broadcast becomes one small MXU matmul (Mosaic has no cheap sublane
    repeat, but it has a very fast systolic array)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (ch, nblk), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (ch, nblk), 1)
    return (row // (ch // nblk) == col).astype(jnp.float32)


def _w4a16_body(xs, p_ref, s_ref, M, TN, block: int):
    """Shared w4a16 accumulation: ``xs(col, size)`` returns the [M, size]
    bf16 activation slice at ORIGINAL-k column ``col`` (packed lo-nibble
    row p holds orig k=p, hi-nibble row p holds k=K2+p). Per scale block:
    unpack the nibble, dot against its x slice, apply the per-(block, out)
    scale on the f32 accumulator — keeping the scale OUT of the weight tile
    means the dequant path is just mask/shift/convert (measured 1.7x faster
    than the XLA bf16 matmul at M=16, K=N=8192 on v5e; 332 GB/s effective).

    Handles K2 % block != 0 (e.g. K=1408 DeepSeek / 2880 gpt-oss at the
    default block 128): the single scale block straddling the half
    boundary is accumulated from a lo-nibble tail + hi-nibble head, both
    under the same scale row. rem must be 8-sublane aligned."""
    K2 = p_ref.shape[0]
    nfull = K2 // block  # full blocks per half
    rem = K2 % block

    def unpack_lo(pb):
        return ((pb & 0xF) - 8).astype(jnp.bfloat16)

    def unpack_hi(pb):
        return (((pb >> 4) ^ 8) - 8).astype(jnp.bfloat16)  # two's-compl.

    def body_lo(b, acc):
        off = b * block
        pb = p_ref[pl.ds(off, block), :].astype(jnp.int32)
        d = jnp.dot(xs(off, block), unpack_lo(pb),
                    preferred_element_type=jnp.float32)
        return acc + d * s_ref[pl.ds(b, 1), :]

    hi_srow = nfull + (1 if rem else 0)

    def body_hi(b, acc):
        poff = rem + b * block
        pb = p_ref[pl.ds(poff, block), :].astype(jnp.int32)
        d = jnp.dot(xs(K2 + poff, block), unpack_hi(pb),
                    preferred_element_type=jnp.float32)
        return acc + d * s_ref[pl.ds(hi_srow + b, 1), :]

    # full unroll (<=16 blocks): see _w4a8_body — overlaps the MXU dots
    # with the VPU unpack/scale chain
    def _unroll(n):
        return n if n <= 16 else 1

    acc = jnp.zeros((M, TN), jnp.float32)
    acc = jax.lax.fori_loop(0, nfull, body_lo, acc, unroll=_unroll(nfull))
    if rem:
        pa = p_ref[pl.ds(nfull * block, rem), :].astype(jnp.int32)
        pb = p_ref[pl.ds(0, rem), :].astype(jnp.int32)
        d = jnp.dot(xs(nfull * block, rem), unpack_lo(pa),
                    preferred_element_type=jnp.float32)
        d = d + jnp.dot(xs(K2, rem), unpack_hi(pb),
                        preferred_element_type=jnp.float32)
        acc = acc + d * s_ref[pl.ds(nfull, 1), :]
    return jax.lax.fori_loop(0, (K2 - rem) // block, body_hi, acc,
                             unroll=_unroll((K2 - rem) // block))


def _w4a16_kernel(x_ref, p_ref, s_ref, o_ref, *, block: int):
    def xs(col, size):
        return x_ref[:, pl.ds(col, size)].astype(jnp.bfloat16)

    acc = _w4a16_body(xs, p_ref, s_ref, x_ref.shape[0], p_ref.shape[1], block)
    o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block", "out_dtype"))
def w4a16_gemm(x, packed, scale, block: int = 128, out_dtype=jnp.bfloat16):
    """x [M, K] @ int4-packed W -> [M, N]. packed uint8 [K/2, N],
    scale f32 [K/block, N]."""
    K2, N = packed.shape
    x, M = _pad_m(x)
    Mp = x.shape[0]
    cost = pl.CostEstimate(
        flops=2 * Mp * 2 * K2 * N,
        bytes_accessed=K2 * N + (2 * K2 // block) * N * 4 + Mp * 2 * K2 * 2,
        transcendentals=0,
    )
    if Mp > 256 and (tiles := _pick_prefill_tiles(K2, N, block,
                                                  x_bytes=2)) is not None:
        # prefill variant: M-tiled 2-D grid, whole K per tile (see the
        # _w4a8_gemm twin) — avoids the XLA fallback's unpacked-weight
        # HBM temps at large M
        TM, TN = tiles
        x, _ = _pad_m(x, TM)
        Mp = x.shape[0]
        out = pl.pallas_call(
            functools.partial(_w4a16_kernel, block=block),
            grid=(Mp // TM, N // TN),
            in_specs=[
                pl.BlockSpec((TM, 2 * K2), lambda m, n: (m, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K2, TN), lambda m, n: (0, n),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * K2 // block, TN), lambda m, n: (0, n),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TM, TN), lambda m, n: (m, n),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
            cost_estimate=cost,
        )(x, packed, scale)
        return out[:M]
    if K2 % block == 0:
        TN, TK2 = _pick_tiles(N, K2, block)
        out = pl.pallas_call(
            functools.partial(_w4a16_kt_kernel, block=block, K2=K2, TK2=TK2),
            grid=(N // TN, K2 // TK2),
            in_specs=[
                pl.BlockSpec((Mp, 2 * K2), lambda n, k: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TK2, TN), lambda n, k: (k, n),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * K2 // block, TN), lambda n, k: (0, n),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((Mp, TN), lambda n, k: (0, n),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
            scratch_shapes=[pltpu.VMEM((Mp, TN), jnp.float32)],
            cost_estimate=cost,
        )(x, packed, scale)
        return out[:M]
    TN = _pick_tn(N, K2, 1.5)
    out = pl.pallas_call(
        functools.partial(_w4a16_kernel, block=block),
        grid=(N // TN,),
        in_specs=[
            pl.BlockSpec((Mp, 2 * K2), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K2, TN), lambda n: (0, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * K2 // block, TN), lambda n: (0, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Mp, TN), lambda n: (0, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        cost_estimate=cost,
    )(x, packed, scale)
    return out[:M]


def _w4a16_kt_kernel(x_ref, p_ref, s_ref, o_ref, acc_ref, *, block: int,
                     K2: int, TK2: int, k_axis: int = 1):
    """K-tiled w4a16: grid (N-tiles, K-tiles) with k INNERMOST, f32 VMEM
    accumulator persisting across the k steps (the revisited output block is
    written once, at the last k). x and the scale matrix stay whole in VMEM
    (small); only the packed weight streams in (TK2, TN) blocks, keeping TN
    wide for dense HBM reads at any K (see _pick_tiles). ``k_axis=2`` is
    the prefill variant: an (M-tiles, N-tiles, K-tiles) grid where x rides
    in [TM, 2*K2] row tiles (the packed weight re-streams once per M-tile;
    compute-bound at those shapes, so the re-reads hide under the MXU)."""
    k = pl.program_id(k_axis)
    nk = pl.num_programs(k_axis)
    nblk = TK2 // block
    M, TN = x_ref.shape[0], p_ref.shape[1]
    nsrow_half = K2 // block

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def unpack_lo(pb):
        return ((pb & 0xF) - 8).astype(jnp.bfloat16)

    def unpack_hi(pb):
        return (((pb >> 4) ^ 8) - 8).astype(jnp.bfloat16)

    def body(b, acc):
        off = b * block
        col = k * TK2 + off
        pb = p_ref[pl.ds(off, block), :].astype(jnp.int32)
        srow = k * nblk + b
        d = jnp.dot(x_ref[:, pl.ds(col, block)].astype(jnp.bfloat16),
                    unpack_lo(pb), preferred_element_type=jnp.float32)
        acc = acc + d * s_ref[pl.ds(srow, 1), :]
        d = jnp.dot(x_ref[:, pl.ds(K2 + col, block)].astype(jnp.bfloat16),
                    unpack_hi(pb), preferred_element_type=jnp.float32)
        return acc + d * s_ref[pl.ds(nsrow_half + srow, 1), :]

    # full unroll: overlap MXU dots with the VPU unpack/scale chain (see
    # _w4a8_kt_kernel — same finding, measured on the w4a8 twin)
    acc_ref[:] += jax.lax.fori_loop(
        0, nblk, body, jnp.zeros((M, TN), jnp.float32), unroll=nblk)

    @pl.when(k == nk - 1)
    def _emit():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# W4A8: int4 weights + int8 activations on the int8 MXU (394 TOPS on v5e)
# ---------------------------------------------------------------------------
def _w4a8_dot_lo(xlo, pb):
    lo = jax.lax.bitcast_convert_type(pb & 0xF, jnp.int8)
    d = jax.lax.dot_general(xlo, lo, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return d - 8 * jnp.sum(xlo.astype(jnp.int32), axis=1, keepdims=True)


def _w4a8_dot_hi(xhi, pb):
    hi = jax.lax.bitcast_convert_type(pb & 0xF0, jnp.int8)
    d = jax.lax.dot_general(xhi, hi, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return jax.lax.shift_right_arithmetic(d, 4)


def _w4a8_kt_kernel(x_ref, p_ref, s_ref, o_ref, *, block: int, K2: int,
                    TK2: int, k_axis: int = 1):
    """K-tiled w4a8 (see _w4a16_kt_kernel for the grid/accumulation scheme
    and the k_axis=2 prefill variant; _w4a8_kernel for the zero-convert
    int8 nibble trick)."""
    k = pl.program_id(k_axis)
    nblk = TK2 // block
    M, TN = x_ref.shape[0], p_ref.shape[1]
    nsrow_half = K2 // block

    @pl.when(k == 0)
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)

    def body(b, acc):
        off = b * block
        col = k * TK2 + off
        pb = p_ref[pl.ds(off, block), :]
        srow = k * nblk + b
        qlo = _w4a8_dot_lo(x_ref[:, pl.ds(col, block)], pb)
        qhi = _w4a8_dot_hi(x_ref[:, pl.ds(K2 + col, block)], pb)
        return (acc + qlo.astype(jnp.float32) * s_ref[pl.ds(srow, 1), :]
                + qhi.astype(jnp.float32) * s_ref[pl.ds(nsrow_half + srow, 1), :])

    # FULL unroll (Mosaic supports 1 or num_steps only): lets Mosaic overlap
    # block b+1's MXU dots with block b's serial VPU scale chain
    # (convert + fma) — measured 488 -> 628 GB/s on the bs64 gate_up shape,
    # bit-identical output (the VPU chain, not DMA, was the cap: a raw
    # dots-only kernel ceilings at ~676 GB/s, and a contiguous pre-tiled
    # weight layout changes nothing)
    o_ref[:] += jax.lax.fori_loop(
        0, nblk, body, jnp.zeros((M, TN), jnp.float32), unroll=nblk)


def _w4a8_body(xs, p_ref, s_ref, M, TN, block: int):
    """Shared w4a8 accumulation over ``xs(col, size)`` int8 activation
    slices. Unpack is TWO bitwise ANDs per byte — zero VPU converts: the
    MXU's mixed int8 dot consumes ``bitcast(pb & 0xF, i8)`` (= q_lo + 8,
    corrected by a rank-1 ``8 * rowsum(x)`` term) and ``bitcast(pb & 0xF0,
    i8)`` (= exactly ``16 * q_hi`` thanks to the two's-complement high
    nibble — ``>> 4`` on the i32 accumulator finishes it). Measured
    0.144 ms / 408 GB/s at K=4096, N=28672, M=64 on v5e vs 0.191 ms for
    the bf16-path w4a16 kernel (Mosaic legalizes no shifts/subs on int8
    vectors, so the conventional unpack-to-i8 route is impossible; this
    needs none).

    Handles K2 % block != 0 (straddle shapes, same scale-row layout as
    _w4a16_body: nfull lo rows, one straddle row, hi rows shifted by rem):
    when aligned (rem == 0) lo/hi share one packed-row read per block; the
    straddle layout splits them into offset loops."""
    K2 = p_ref.shape[0]
    nfull = K2 // block
    rem = K2 % block
    dot_lo = _w4a8_dot_lo
    dot_hi = _w4a8_dot_hi

    # full unroll (<=16 blocks) overlaps MXU dots with the VPU scale chain
    # (measured 488 -> 628 GB/s on the w4a8 kt kernel); Mosaic only supports
    # unroll=1 or num_steps, and huge unrolls bloat code for no gain
    def _unroll(n):
        return n if n <= 16 else 1

    if rem == 0:
        def body(b, acc):
            off = b * block
            pb = p_ref[pl.ds(off, block), :]
            qlo = dot_lo(xs(off, block), pb)
            qhi = dot_hi(xs(K2 + off, block), pb)
            return (acc + qlo.astype(jnp.float32) * s_ref[pl.ds(b, 1), :]
                    + qhi.astype(jnp.float32) * s_ref[pl.ds(nfull + b, 1), :])

        return jax.lax.fori_loop(
            0, nfull, body, jnp.zeros((M, TN), jnp.float32),
            unroll=_unroll(nfull))

    def body_lo(b, acc):
        off = b * block
        q = dot_lo(xs(off, block), p_ref[pl.ds(off, block), :])
        return acc + q.astype(jnp.float32) * s_ref[pl.ds(b, 1), :]

    def body_hi(b, acc):
        poff = rem + b * block
        q = dot_hi(xs(K2 + poff, block), p_ref[pl.ds(poff, block), :])
        return acc + q.astype(jnp.float32) * s_ref[pl.ds(nfull + 1 + b, 1), :]

    acc = jax.lax.fori_loop(0, nfull, body_lo,
                            jnp.zeros((M, TN), jnp.float32),
                            unroll=_unroll(nfull))
    # straddle block: lo-nibble tail + hi-nibble head, one shared scale row
    q = dot_lo(xs(nfull * block, rem), p_ref[pl.ds(nfull * block, rem), :])
    q = q + dot_hi(xs(K2, rem), p_ref[pl.ds(0, rem), :])
    acc = acc + q.astype(jnp.float32) * s_ref[pl.ds(nfull, 1), :]
    return jax.lax.fori_loop(0, (K2 - rem) // block, body_hi, acc,
                             unroll=_unroll((K2 - rem) // block))


def _w4a8_kernel(x_ref, p_ref, s_ref, o_ref, *, block: int):
    def xs(col, size):
        return x_ref[:, pl.ds(col, size)]

    o_ref[:] = _w4a8_body(xs, p_ref, s_ref, x_ref.shape[0], p_ref.shape[1],
                          block).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block", "out_dtype"))
def w4a8_gemm(xq, packed, scale, block: int = 128,
              out_dtype=jnp.float32):
    """xq int8 [M, K] @ int4-packed W -> [M, N] (per-token activation
    scales applied by the caller). packed uint8 [K/2, N] hybrid nibbles,
    scale f32 [K/block, N]. ``out_dtype=bfloat16`` converts INSIDE the
    kernel — at prefill M the f32 result tensor is an HBM-temp OOM hazard
    (252 MB for one 8B gate_up at M=2304); decode keeps f32."""
    K2, N = packed.shape
    xq, M = _pad_m(xq)
    Mp = xq.shape[0]
    cost = pl.CostEstimate(
        flops=2 * 2 * Mp * 2 * K2 * N,
        bytes_accessed=K2 * N + (2 * K2 // block) * N * 4 + Mp * 2 * K2,
        transcendentals=0,
    )
    if Mp > 256 and (tiles := _pick_prefill_tiles(K2, N, block)) is not None:
        # prefill shapes: M-tiled 2-D grid, whole K per tile (static
        # offsets — see _pick_prefill_tiles); int8 MXU at 394 TOPS and no
        # unpacked-weight HBM temps (the XLA fallback's are an OOM hazard
        # at serving shapes)
        TM, TN = tiles
        xq, _ = _pad_m(xq, TM)
        Mp = xq.shape[0]
        out = pl.pallas_call(
            functools.partial(_w4a8_kernel, block=block),
            grid=(Mp // TM, N // TN),
            in_specs=[
                pl.BlockSpec((TM, 2 * K2), lambda m, n: (m, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K2, TN), lambda m, n: (0, n),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * K2 // block, TN), lambda m, n: (0, n),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TM, TN), lambda m, n: (m, n),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
            cost_estimate=cost,
        )(xq, packed, scale)
        return out[:M]
    if K2 % block == 0:
        TN, TK2 = _pick_tiles(N, K2, block)
        out = pl.pallas_call(
            functools.partial(_w4a8_kt_kernel, block=block, K2=K2, TK2=TK2),
            grid=(N // TN, K2 // TK2),
            in_specs=[
                pl.BlockSpec((Mp, 2 * K2), lambda n, k: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TK2, TN), lambda n, k: (k, n),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * K2 // block, TN), lambda n, k: (0, n),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((Mp, TN), lambda n, k: (0, n),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
            cost_estimate=cost,
        )(xq, packed, scale)
        return out[:M].astype(out_dtype)
    TN = _pick_tn(N, K2, 1.5)
    out = pl.pallas_call(
        functools.partial(_w4a8_kernel, block=block),
        grid=(N // TN,),
        in_specs=[
            pl.BlockSpec((Mp, 2 * K2), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K2, TN), lambda n: (0, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * K2 // block, TN), lambda n: (0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Mp, TN), lambda n: (0, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
        cost_estimate=cost,
    )(xq, packed, scale)
    return out[:M].astype(out_dtype)


# ---------------------------------------------------------------------------
# W8A16: int8 per-out-channel weights
# ---------------------------------------------------------------------------
def _w8a16_kernel(x_ref, w_ref, s_ref, o_ref):
    w = w_ref[:].astype(jnp.bfloat16)
    acc = jnp.dot(x_ref[:].astype(jnp.bfloat16), w, preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def w8a16_gemm(x, data, scale, out_dtype=jnp.bfloat16):
    """x [M, K] @ int8 W [K, N] * scale [1, N] -> [M, N]."""
    K, N = data.shape
    TN = _pick_tn(N, K, 3.0)
    x, M = _pad_m(x)
    Mp = x.shape[0]
    out = pl.pallas_call(
        _w8a16_kernel,
        grid=(N // TN,),
        in_specs=[
            pl.BlockSpec((Mp, K), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TN), lambda n: (0, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda n: (0, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Mp, TN), lambda n: (0, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=K * N + N * 4 + Mp * K * 2,
            transcendentals=0,
        ),
    )(x, data, scale)
    return out[:M]


# ---------------------------------------------------------------------------
# W(FP8)A16: e4m3 weights, per-tensor scale
# ---------------------------------------------------------------------------
def _wfp8_kernel(x_ref, w_ref, s_ref, o_ref):
    w = w_ref[:].astype(jnp.bfloat16)
    acc = jnp.dot(x_ref[:].astype(jnp.bfloat16), w, preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[0, 0]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def wfp8_gemm(x, data, scale, out_dtype=jnp.bfloat16):
    """x [M, K] @ e4m3 W [K, N] * scalar scale -> [M, N]."""
    K, N = data.shape
    TN = _pick_tn(N, K, 3.0)
    x, M = _pad_m(x)
    Mp = x.shape[0]
    out = pl.pallas_call(
        _wfp8_kernel,
        grid=(N // TN,),
        in_specs=[
            pl.BlockSpec((Mp, K), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TN), lambda n: (0, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda n: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((Mp, TN), lambda n: (0, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
    )(x, data, scale.reshape(1, 1))
    return out[:M]


# ---------------------------------------------------------------------------
# NVFP4: e2m1 codes (split-half nibbles), e4m3 block-16 scales, f32 scale2
# ---------------------------------------------------------------------------
def _decode_e2m1(code):
    """code int32 0..15 (sign/exp/exp/man) -> f32 value, by assembling the
    float32 bit pattern directly on the VPU: exp field = 126+e for e>0
    (value 2^(e-1)*(1+m/2)), subnormal e==0 -> {0, 0.5}. One select + cheap
    int ops — measured ~2.4x faster than the old 5-deep f32 where-chain
    (exp2 approximations would corrupt the grid; bit assembly is exact)."""
    s = (code >> 3) & 1
    e = (code >> 1) & 3
    m = code & 1
    norm = ((126 + e) << 23) | (m << 22)
    sub = m * (126 << 23)  # 0 -> 0.0, 1 -> 0.5
    bits = (s << 31) | jnp.where(e > 0, norm, sub)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def _nvfp4_kernel(x_ref, p_ref, s_ref, s2_ref, o_ref, *, block: int):
    K2, TN = p_ref.shape
    M = x_ref.shape[0]
    ch = _nvfp4_chunk(K2, block)
    nch = K2 // ch
    sb = ch // block  # e4m3 scale rows per chunk
    expand = _expand_matrix(ch, sb)
    s2 = s2_ref[0, 0]
    nsrow_half = K2 // block
    acc = jnp.zeros((M, TN), jnp.float32)
    for half in range(2):
        for c in range(nch):
            off = c * ch
            pb = p_ref[pl.ds(off, ch), :].astype(jnp.int32)
            w = _decode_e2m1((pb >> (4 * half)) & 0xF)
            srows = s_ref[pl.ds(half * nsrow_half + c * sb, sb), :].astype(jnp.float32)
            srep = jnp.dot(expand, srows, preferred_element_type=jnp.float32)
            wd = (w * srep).astype(jnp.bfloat16)
            xc = x_ref[:, pl.ds(half * K2 + off, ch)].astype(jnp.bfloat16)
            acc = acc + jnp.dot(xc, wd, preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s2).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block", "out_dtype"))
def nvfp4_gemm(x, packed, scale, scale2, block: int = 16, out_dtype=jnp.bfloat16):
    """x [M, K] @ nvfp4-packed W -> [M, N]. packed uint8 [K/2, N],
    scale e4m3 [K/block, N], scale2 f32 [1,1]."""
    K2, N = packed.shape
    TN = _pick_tn(N, K2, 2.0)
    x, M = _pad_m(x)
    Mp = x.shape[0]
    out = pl.pallas_call(
        functools.partial(_nvfp4_kernel, block=block),
        grid=(N // TN,),
        in_specs=[
            pl.BlockSpec((Mp, 2 * K2), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K2, TN), lambda n: (0, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * K2 // block, TN), lambda n: (0, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda n: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((Mp, TN), lambda n: (0, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * 2 * K2 * N,
            bytes_accessed=K2 * N + (2 * K2 // block) * N + Mp * 2 * K2 * 2,
            transcendentals=0,
        ),
    )(x, packed, scale, scale2)
    return out[:M]


# ---------------------------------------------------------------------------
# Grouped W4A16: per-expert int4 GEMMs in ONE kernel (MoE down-projections)
# ---------------------------------------------------------------------------
def _grouped_w4a16_kernel(x_ref, p_ref, s_ref, o_ref, *, block: int):
    """One (expert, N-tile) grid step of the grouped GEMM: the shared
    _w4a16_body over x/o blocks carrying a leading expert dim (sliced to
    this step's expert by the grid index map)."""
    def xs(col, size):
        return x_ref[0, :, pl.ds(col, size)].astype(jnp.bfloat16)

    acc = _w4a16_body(xs, p_ref, s_ref, x_ref.shape[1], p_ref.shape[1], block)
    o_ref[0] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_per_expert", "block",
                                             "out_dtype"))
def grouped_w4a16_gemm(x, packed, scale, n_per_expert: int, block: int = 128,
                       out_dtype=jnp.bfloat16):
    """Per-expert GEMMs y[e] = x[e] @ W[e] in one kernel. x [E, M, K];
    packed uint8 [K/2, E*N] (the quant/compress.py folded layout — expert
    e's weight is the 128-aligned column slice e*N:(e+1)*N, itself a valid
    split-half-packed [K/2, N] tensor); scale f32 [K/block, E*N].
    Returns [E, M, N]. One pallas_call for all experts: grid (E, N/TN), so
    per-call overhead amortizes across the whole MoE layer and packed
    expert weights stream HBM->VMEM at 4 bits (the XLA path materializes a
    dequantized bf16 copy of every expert every step)."""
    E, M, K = x.shape
    K2, EN = packed.shape
    N = n_per_expert
    TN = _pick_tn(N, K2, 1.5)
    nt = N // TN
    pad = (-M) % 8
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    Mp = x.shape[1]
    out = pl.pallas_call(
        functools.partial(_grouped_w4a16_kernel, block=block),
        grid=(E, nt),
        in_specs=[
            pl.BlockSpec((1, Mp, 2 * K2), lambda e, n: (e, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K2, TN), lambda e, n: (0, e * nt + n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * K2 // block, TN), lambda e, n: (0, e * nt + n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Mp, TN), lambda e, n: (e, 0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, Mp, N), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * E * Mp * 2 * K2 * N,
            bytes_accessed=K2 * EN + (2 * K2 // block) * EN * 4
            + E * Mp * 2 * K2 * 2,
            transcendentals=0,
        ),
    )(x, packed, scale)
    return out[:, :M]


def _grouped_w4a8_kernel(x_ref, p_ref, s_ref, o_ref, *, block: int):
    """Grouped W4A8: one (expert, N-tile) grid step of the int8-MXU body
    (zero-convert nibble unpack — see _w4a8_body). The bf16 grouped kernel
    is VPU-unpack-bound at MoE decode shapes (measured 239 us vs the 77 us
    roofline for 64x[768, 2048] experts on v5e); consuming the nibbles on
    the int8 MXU removes the per-element converts entirely."""
    def xs(col, size):
        return x_ref[0, :, pl.ds(col, size)]

    o_ref[0] = _w4a8_body(xs, p_ref, s_ref, x_ref.shape[1], p_ref.shape[1],
                          block)


@functools.partial(jax.jit, static_argnames=("n_per_expert", "block"))
def grouped_w4a8_gemm(xq, packed, scale, n_per_expert: int, block: int = 128):
    """Per-expert W4A8 GEMMs y[e] = xq[e] @ W[e] in one kernel.
    xq int8 [E, M, K] (per-row activation scales applied by the caller);
    packed uint8 [K/2, E*N] folded layout; scale f32 [2*K/2/block, E*N].
    Returns f32 [E, M, N]."""
    E, M, K = xq.shape
    K2, EN = packed.shape
    N = n_per_expert
    TN = _pick_tn(N, K2, 1.5)
    nt = N // TN
    pad = (-M) % 8
    if pad:
        xq = jnp.pad(xq, ((0, 0), (0, pad), (0, 0)))
    Mp = xq.shape[1]
    out = pl.pallas_call(
        functools.partial(_grouped_w4a8_kernel, block=block),
        grid=(E, nt),
        in_specs=[
            pl.BlockSpec((1, Mp, 2 * K2), lambda e, n: (e, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K2, TN), lambda e, n: (0, e * nt + n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * K2 // block, TN), lambda e, n: (0, e * nt + n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Mp, TN), lambda e, n: (e, 0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, Mp, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * E * Mp * 2 * K2 * N,
            bytes_accessed=K2 * EN + (2 * K2 // block) * EN * 4
            + E * Mp * 2 * K2,
            transcendentals=0,
        ),
    )(xq, packed, scale)
    return out[:, :M]


def _grouped_w4a8_combine_kernel(g_ref, x_ref, p_ref, s_ref, o_ref, *,
                                 block: int):
    """Fused MoE down-projection + routed combine: grid (N-tile, expert)
    with the EXPERT dim innermost; each step adds its expert's
    gate-weighted [M, TN] contribution into the revisited f32 output —
    the [E, M, N] per-expert intermediate (write + re-read + a separate
    combine einsum, ~1.5 ms/step at Qwen3-MoE decode shapes) never
    exists. g_ref [1, M, 128] carries gate(e, m) * act_scale(e, m)
    broadcast along lanes."""
    e = pl.program_id(1)

    def xs(col, size):
        return x_ref[0, :, pl.ds(col, size)]

    acc = _w4a8_body(xs, p_ref, s_ref, x_ref.shape[1], p_ref.shape[1],
                     block)

    @pl.when(e == 0)
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] += acc * g_ref[0][:, :1]


@functools.partial(jax.jit, static_argnames=("n_per_expert", "block"))
def grouped_w4a8_combine_gemm(xq, gscale, packed, scale, n_per_expert: int,
                              block: int = 128):
    """Fused per-expert W4A8 GEMMs + weighted combine:
    ``out[m] = sum_e gscale[e, m] * (xq[e, m] @ W[e])``.
    xq int8 [E, M, K]; gscale f32 [E, M] (routing gate x per-row activation
    scale); packed/scale the folded layout. Returns f32 [M, N]."""
    E, M, K = xq.shape
    K2, EN = packed.shape
    N = n_per_expert
    TN = _pick_tn(N, K2, 1.5)
    nt = N // TN
    pad = (-M) % 8
    if pad:
        xq = jnp.pad(xq, ((0, 0), (0, pad), (0, 0)))
        gscale = jnp.pad(gscale, ((0, 0), (0, pad)))
    Mp = xq.shape[1]
    gs3 = jnp.broadcast_to(gscale[:, :, None], (E, Mp, 128))
    out = pl.pallas_call(
        functools.partial(_grouped_w4a8_combine_kernel, block=block),
        grid=(nt, E),
        in_specs=[
            pl.BlockSpec((1, Mp, 128), lambda n, e: (e, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mp, 2 * K2), lambda n, e: (e, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K2, TN), lambda n, e: (0, e * nt + n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * K2 // block, TN), lambda n, e: (0, e * nt + n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Mp, TN), lambda n, e: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * E * Mp * 2 * K2 * N,
            bytes_accessed=K2 * EN + (2 * K2 // block) * EN * 4
            + E * Mp * 2 * K2,
            transcendentals=0,
        ),
    )(gs3, xq, packed, scale)
    return out[:M]


def _grouped_nvfp4_kernel(x_ref, p_ref, s_ref, s2_ref, o_ref, *, block: int):
    """Grouped variant of _nvfp4_kernel: one (expert, N-tile) per grid step,
    x/o carry a leading expert dim."""
    K2, TN = p_ref.shape
    M = x_ref.shape[1]
    ch = _nvfp4_chunk(K2, block)
    nch = K2 // ch
    sb = ch // block
    expand = _expand_matrix(ch, sb)
    s2 = s2_ref[0, 0]
    nsrow_half = K2 // block
    acc = jnp.zeros((M, TN), jnp.float32)
    for half in range(2):
        for c in range(nch):
            off = c * ch
            pb = p_ref[pl.ds(off, ch), :].astype(jnp.int32)
            w = _decode_e2m1((pb >> (4 * half)) & 0xF)
            srows = s_ref[pl.ds(half * nsrow_half + c * sb, sb), :].astype(jnp.float32)
            srep = jnp.dot(expand, srows, preferred_element_type=jnp.float32)
            wd = (w * srep).astype(jnp.bfloat16)
            xc = x_ref[0, :, pl.ds(half * K2 + off, ch)].astype(jnp.bfloat16)
            acc = acc + jnp.dot(xc, wd, preferred_element_type=jnp.float32)
    o_ref[0] = (acc * s2).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_per_expert", "block",
                                             "out_dtype"))
def grouped_nvfp4_gemm(x, packed, scale, scale2, n_per_expert: int,
                       block: int = 16, out_dtype=jnp.bfloat16):
    """Per-expert NVFP4 GEMMs in one kernel (see grouped_w4a16_gemm for the
    folded layout contract). x [E, M, K]; packed uint8 [K/2, E*N]; scale
    e4m3 [K/block, E*N]; scale2 f32 [1,1] (per-tensor). Returns [E, M, N]."""
    E, M, K = x.shape
    K2, EN = packed.shape
    N = n_per_expert
    TN = _pick_tn(N, K2, 2.0)
    nt = N // TN
    pad = (-M) % 8
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    Mp = x.shape[1]
    out = pl.pallas_call(
        functools.partial(_grouped_nvfp4_kernel, block=block),
        grid=(E, nt),
        in_specs=[
            pl.BlockSpec((1, Mp, 2 * K2), lambda e, n: (e, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K2, TN), lambda e, n: (0, e * nt + n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * K2 // block, TN), lambda e, n: (0, e * nt + n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda e, n: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, Mp, TN), lambda e, n: (e, 0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, Mp, N), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * E * Mp * 2 * K2 * N,
            bytes_accessed=K2 * EN + (2 * K2 // block) * EN
            + E * Mp * 2 * K2 * 2,
            transcendentals=0,
        ),
    )(x, packed, scale, scale2)
    return out[:, :M]
