"""Pallas decode attention over a (quantized) KV cache.

Replaces the reference's Triton decode/flash kernels for quantized KV
(reference: modelopt/torch/kernels/common/attention/decode_attention.py,
triton_fa.py, kernels/quantization/attention/bmm2_qdq.py) with a Mosaic
kernel: fp8 (e4m3) KV codes are read straight from HBM-resident cache
blocks, dequantized on the fly in VMEM, and never materialized in HBM —
the XLA fallback converts the whole cache to bf16 in HBM every step.

Grid: (batch, kv_head). Per program: q-group [G, D] attends over [S, D]
keys/values with per-slot length masking (scalar-prefetched) and a single
fused softmax. Decode-only (T==1); prefill stays on the XLA path where the
MXU-bound einsum formulation is already efficient.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _decode_attn_kernel(lens_ref, scales_ref, q_ref, k_ref, v_ref, o_ref):
    b = pl.program_id(0)
    L = lens_ref[b]
    k_scale = scales_ref[0]
    v_scale = scales_ref[1]
    q = q_ref[0, 0].astype(jnp.float32)  # [G, D]
    k = k_ref[0, 0].astype(jnp.float32) * k_scale  # [S, D]
    v = v_ref[0, 0].astype(jnp.float32) * v_scale
    G, D = q.shape
    S = k.shape[0]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.float32(D))  # [G, S]
    pos = jax.lax.broadcasted_iota(jnp.int32, (G, S), 1)
    scores = jnp.where(pos < L, scores, -1e9)
    m = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=1, keepdims=True)
    o_ref[0, 0] = jnp.dot(p, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def decode_attention(q, k_cache, v_cache, lengths, k_scale=None, v_scale=None,
                     out_dtype=jnp.bfloat16):
    """q [B, KH, G, D]; k/v_cache [B, S, KH, D] (bf16 or float8_e4m3fn);
    lengths [B] valid key counts; scalar scales for fp8 caches.
    Returns [B, KH, G, D]."""
    B, KH, G, D = q.shape
    S = k_cache.shape[1]
    scales = jnp.stack([
        jnp.asarray(1.0 if k_scale is None else k_scale, jnp.float32).reshape(()),
        jnp.asarray(1.0 if v_scale is None else v_scale, jnp.float32).reshape(()),
    ])
    # NOTE: Mosaic requires the last two BLOCK dims divisible by (8, 128) or
    # equal to the array dims, so a strided per-head block over the native
    # [B, S, KH, D] cache is not lowerable — transpose to [B, KH, S, D]
    # first. On the fp8 path this copies half-size codes; relayouting the
    # cache natively is a tracked optimization (NOTES.md).
    kt = jnp.transpose(k_cache, (0, 2, 1, 3))
    vt = jnp.transpose(v_cache, (0, 2, 1, 3))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, KH),
        in_specs=[
            pl.BlockSpec((1, 1, G, D), lambda b, h, *_: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, D), lambda b, h, *_: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, D), lambda b, h, *_: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, G, D), lambda b, h, *_: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _decode_attn_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KH, G, D), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * KH * G * S * D,
            bytes_accessed=2 * B * KH * S * D * k_cache.dtype.itemsize,
            transcendentals=B * KH * G * S,
        ),
    )(lengths.astype(jnp.int32), scales, q, kt, vt)


def decode_attention_ok(q_shape, S: int, cache_dtype=None) -> bool:
    """Use the kernel only where it wins: fp8 caches (XLA would materialize
    a dequantized bf16 copy of the whole cache every step). For bf16 caches
    at decode the XLA einsum path is already fine and the per-call kernel
    overhead is a net loss (measured on v5e)."""
    B, KH, G, D = q_shape
    if jax.default_backend() != "tpu":
        return False
    if cache_dtype is not None and cache_dtype != jnp.float8_e4m3fn:
        return False
    if S > 4096 or D % 64 != 0:
        return False
    return True
