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

Causal note: hops whose K/V chunk lies entirely in the future are fully
masked (their block contributes nothing); the simple contiguous layout
computes them anyway, so causal prefill wastes ~half the FLOPs at large n —
acceptable for the memory win. A zigzag chunk interleave would balance this;
documented as future work.
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


def context_parallel_attention(
    q, k, v, mesh: Mesh, axis: str = "sp", causal: bool = True
):
    """Sequence-sharded attention over ``mesh[axis]``.

    q [B,T,H,D], k/v [B,T,KH,D] (GQA via H = G·KH), all sharded (or
    shardable) on the sequence dimension. T must divide evenly by the axis
    size. Output matches single-device softmax attention and is sharded the
    same way.
    """
    n = mesh.shape[axis]
    if q.shape[1] % n:
        raise ValueError(f"seq len {q.shape[1]} not divisible by {axis}={n}")
    spec = P(None, axis, None, None)
    body = functools.partial(
        _ring_body, axis_name=axis, n_chunks=n, causal=causal
    )
    return shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)
