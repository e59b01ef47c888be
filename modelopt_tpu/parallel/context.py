"""Context (sequence) parallelism: ring attention for long-context prefill.

The reference tolerates megatron context-parallel groups in its ParallelState
(reference: modelopt/torch/utils/distributed.py:341) and otherwise leaves
long-context scaling to the serving engine. On TPU the idiomatic design is
ring attention under ``shard_map`` (the scaling-book recipe): the sequence
axis is sharded over a mesh axis (``sp``), each device keeps its Q chunk
resident, and K/V chunks rotate around the ring via ``lax.ppermute`` while an
online-softmax accumulator merges one block per hop. Peak score memory drops
from O(T·S) to O(T·S/n²) per device and the K/V transfer rides ICI,
overlapped with the block matmuls by XLA's latency-hiding scheduler.

Causal note: with the contiguous layout, hops whose K/V chunk lies entirely
in the future are fully masked yet computed anyway — causal prefill wastes
~half the FLOPs at large n. ``zigzag=True`` fixes this: the sequence is
split into 2n fine chunks and device d holds the pair (d, 2n-1-d), so every
off-diagonal hop consists of exactly two FULLY-UNMASKED fine blocks (an
early k chunk visible to both local q chunks, or both k chunks visible to
the late local q chunk) — per-hop work is halved and perfectly balanced
across devices. Total MXU work: (8 + 4(n-1)) fine-blocks vs the contiguous
ring's 8n → ~(n+1)/2n, asymptotically half.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

_NEG = -1e30  # finite "-inf": keeps the online-softmax algebra NaN-free


def _ring_body(q, k, v, *, axis_name: str, n_chunks: int, causal: bool):
    """shard_map body. q [B,Tl,H,D]; k/v [B,Sl,KH,D] — the LOCAL chunks of a
    sequence sharded over ``axis_name``. Returns [B,Tl,H,D]."""
    B, Tl, H, D = q.shape
    Sl, KH = k.shape[1], k.shape[2]
    G = H // KH
    idx = jax.lax.axis_index(axis_name)
    scale = 1.0 / jnp.sqrt(jnp.float32(D))

    qg = q.reshape(B, Tl, KH, G, D)
    q_pos = idx * Tl + jnp.arange(Tl, dtype=jnp.int32)

    m = jnp.full((B, KH, G, Tl), _NEG, jnp.float32)
    l = jnp.zeros((B, KH, G, Tl), jnp.float32)
    acc = jnp.zeros((B, KH, G, Tl, D), jnp.float32)
    perm = [(j, (j + 1) % n_chunks) for j in range(n_chunks)]

    for step in range(n_chunks):
        # after `step` rotations this device holds chunk (idx - step) mod n
        owner = (idx - step) % n_chunks
        s = jnp.einsum(
            "btkgd,bskd->bkgts", qg, k, preferred_element_type=jnp.float32
        ) * scale  # [B,KH,G,Tl,Sl]
        if causal:
            kv_pos = owner * Sl + jnp.arange(Sl, dtype=jnp.int32)
            mask = kv_pos[None, :] <= q_pos[:, None]  # [Tl,Sl]
            mask = mask[None, None, None]
            s = jnp.where(mask, s, _NEG)
        else:
            mask = jnp.ones((1, 1, 1, Tl, Sl), bool)
        m_new = jnp.maximum(m, s.max(-1))
        p = jnp.where(mask, jnp.exp(s - m_new[..., None]), 0.0)
        corr = jnp.exp(m - m_new)
        l = l * corr + p.sum(-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "bkgts,bskd->bkgtd", p, v.astype(jnp.float32)
        )
        m = m_new
        if step + 1 < n_chunks:
            k = jax.lax.ppermute(k, axis_name, perm)
            v = jax.lax.ppermute(v, axis_name, perm)

    out = acc / jnp.maximum(l[..., None], 1e-30)
    return out.transpose(0, 3, 1, 2, 4).reshape(B, Tl, H, D).astype(q.dtype)


def _zigzag_body(q, k, v, *, axis_name: str, n_chunks: int):
    """Causal ring attention over the zigzag chunk layout. Local rows are
    the fine-chunk pair (d, 2n-1-d), each T2 long; every off-diagonal hop
    computes exactly two unmasked T2×T2 blocks (QK and PV each)."""
    B, T2x2, H, D = q.shape
    T2 = T2x2 // 2
    Sl, KH = k.shape[1] // 2, k.shape[2]
    G = H // KH
    assert Sl == T2
    d = jax.lax.axis_index(axis_name)
    scale = 1.0 / jnp.sqrt(jnp.float32(D))

    qg = q.reshape(B, 2 * T2, KH, G, D)
    q_lo, q_hi = qg[:, :T2], qg[:, T2:]
    ar = jnp.arange(T2, dtype=jnp.int32)
    pos_lo = d * T2 + ar
    pos_hi = (2 * n_chunks - 1 - d) * T2 + ar
    pos = jnp.concatenate([pos_lo, pos_hi])

    def qk(qc, kc):
        return jnp.einsum("btkgd,bskd->bkgts", qc, kc,
                          preferred_element_type=jnp.float32) * scale

    def pv(p, vc):
        return jnp.einsum("bkgts,bskd->bkgtd", p, vc.astype(jnp.float32))

    # ---- step 0: the diagonal pair (own chunks), causal-masked
    s = qk(qg, k)  # [B,KH,G,2T2,2T2]
    valid = (pos[None, :] <= pos[:, None])[None, None, None]
    s = jnp.where(valid, s, _NEG)
    m = s.max(-1)
    p = jnp.where(valid, jnp.exp(s - m[..., None]), 0.0)
    l = p.sum(-1)
    acc = pv(p, v)
    m_lo, m_hi = m[..., :T2], m[..., T2:]
    l_lo, l_hi = l[..., :T2], l[..., T2:]
    acc_lo, acc_hi = acc[..., :T2, :], acc[..., T2:, :]

    perm = [(j, (j + 1) % n_chunks) for j in range(n_chunks)]
    for step in range(1, n_chunks):
        k = jax.lax.ppermute(k, axis_name, perm)
        v = jax.lax.ppermute(v, axis_name, perm)
        o = (d - step) % n_chunks
        pred = o < d  # incoming pair is "earlier" than our low chunk
        k_lo, k_hi = k[:, :T2], k[:, T2:]
        v_lo, v_hi = v[:, :T2], v[:, T2:]
        # block 1: late local q × early incoming k — always fully visible
        s1 = qk(q_hi, k_lo)
        # block 2: (early q × early k) when pred, else (late q × late k) —
        # fully visible either way; destination rows follow the predicate
        qa = jnp.where(pred, q_lo, q_hi)
        ka = jnp.where(pred, k_lo, k_hi)
        va = jnp.where(pred, v_lo, v_hi)
        s2 = qk(qa, ka)
        m2 = s2.max(-1)

        m_hi_new = jnp.maximum(m_hi, s1.max(-1))
        m_hi_new = jnp.maximum(m_hi_new, jnp.where(pred, _NEG, m2))
        m_lo_new = jnp.where(pred, jnp.maximum(m_lo, m2), m_lo)
        # one shared P·V for block 2, normalized for its destination rows
        m_sel = jnp.where(pred, m_lo_new, m_hi_new)
        p2 = jnp.exp(s2 - m_sel[..., None])
        l2 = p2.sum(-1)
        c2 = pv(p2, va)

        corr_hi = jnp.exp(m_hi - m_hi_new)
        p1 = jnp.exp(s1 - m_hi_new[..., None])
        l_hi = l_hi * corr_hi + p1.sum(-1) + jnp.where(pred, 0.0, l2)
        acc_hi = acc_hi * corr_hi[..., None] + pv(p1, v_lo) \
            + jnp.where(pred, 0.0, c2)
        corr_lo = jnp.exp(m_lo - m_lo_new)
        l_lo = l_lo * corr_lo + jnp.where(pred, l2, 0.0)
        acc_lo = acc_lo * corr_lo[..., None] + jnp.where(pred, c2, 0.0)
        m_lo, m_hi = m_lo_new, m_hi_new

    acc = jnp.concatenate([acc_lo, acc_hi], axis=-2)
    l = jnp.concatenate([l_lo, l_hi], axis=-1)
    out = acc / jnp.maximum(l[..., None], 1e-30)
    return out.transpose(0, 3, 1, 2, 4).reshape(B, 2 * T2, H, D).astype(q.dtype)


def _zigzag_perm(n: int):
    """Fine-chunk order such that contiguous sharding of the permuted
    sequence gives device d the pair (d, 2n-1-d)."""
    import numpy as np

    perm = np.empty(2 * n, np.int32)
    perm[0::2] = np.arange(n)
    perm[1::2] = 2 * n - 1 - np.arange(n)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(2 * n, dtype=np.int32)
    return perm, inv


def _chunk_take(x, order, n_fine):
    B, T = x.shape[:2]
    return x.reshape(B, n_fine, T // n_fine, *x.shape[2:])[
        :, order].reshape(x.shape)


def context_parallel_attention(
    q, k, v, mesh: Mesh, axis: str = "sp", causal: bool = True,
    zigzag: bool = False,
):
    """Sequence-sharded attention over ``mesh[axis]``.

    q [B,T,H,D], k/v [B,T,KH,D] (GQA via H = G·KH), all sharded (or
    shardable) on the sequence dimension. T must divide evenly by the axis
    size. Output matches single-device softmax attention and is sharded the
    same way. ``zigzag=True`` (causal only) halves the MXU work of causal
    prefill via the balanced fine-chunk interleave — requires T divisible
    by 2·axis_size.
    """
    n = mesh.shape[axis]
    if q.shape[1] % n:
        raise ValueError(f"seq len {q.shape[1]} not divisible by {axis}={n}")
    spec = P(None, axis, None, None)
    if zigzag and causal and n > 1:
        if q.shape[1] % (2 * n):
            raise ValueError(
                f"zigzag needs seq len divisible by 2·{axis}={2 * n}")
        perm, inv = _zigzag_perm(n)
        body = functools.partial(_zigzag_body, axis_name=axis, n_chunks=n)
        out = shard_map(
            body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
            check_vma=False,
        )(
            _chunk_take(q, perm, 2 * n),
            _chunk_take(k, perm, 2 * n),
            _chunk_take(v, perm, 2 * n),
        )
        return _chunk_take(out, inv, 2 * n)
    body = functools.partial(
        _ring_body, axis_name=axis, n_chunks=n, causal=causal
    )
    return shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)
