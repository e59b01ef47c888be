"""Decode-attention kernel parity (interpreter mode) vs a numpy/XLA
reference, incl. fp8 KV codes and per-slot length masking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from modelopt_tpu.kernels.attention import decode_attention


def ref_attention(q, k, v, lengths):
    """k/v given 4D [B, S, KH, D] (the cache stores them lane-merged)."""
    B, KH, G, D = q.shape
    S = k.shape[1]
    out = np.zeros((B, KH, G, D), np.float32)
    for b in range(B):
        L = int(lengths[b])
        for h in range(KH):
            qq = np.asarray(q[b, h], np.float32)
            kk = np.asarray(k[b, :L, h], np.float32)
            vv = np.asarray(v[b, :L, h], np.float32)
            s = qq @ kk.T / np.sqrt(D)
            p = np.exp(s - s.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            out[b, h] = p @ vv
    return out


@pytest.fixture
def interp():
    with pltpu.force_tpu_interpret_mode():
        yield


def test_bf16_cache_parity(rng, interp):
    B, S, KH, G, D = 2, 64, 2, 4, 64
    q = jnp.asarray(rng.standard_normal((B, KH, G, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, KH, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, KH, D)), jnp.float32)
    lengths = jnp.asarray([17, 64], jnp.int32)
    out = decode_attention(q, k.reshape(B, S, KH * D), v.reshape(B, S, KH * D),
                           lengths, out_dtype=jnp.float32)
    ref = ref_attention(q, np.asarray(k), np.asarray(v), np.asarray(lengths))
    # kernel computes q/k/v in bf16 on the MXU: parity bounded by bf16 rounding
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-2, atol=1e-2)


def test_fp8_cache_parity(rng, interp):
    B, S, KH, G, D = 2, 32, 2, 4, 64
    q = jnp.asarray(rng.standard_normal((B, KH, G, D)), jnp.float32)
    k = rng.standard_normal((B, S, KH, D)).astype(np.float32)
    v = rng.standard_normal((B, S, KH, D)).astype(np.float32)
    k_scale, v_scale = 0.01, 0.02
    k8 = jnp.asarray(k / k_scale).astype(jnp.float8_e4m3fn)
    v8 = jnp.asarray(v / v_scale).astype(jnp.float8_e4m3fn)
    lengths = jnp.asarray([9, 32], jnp.int32)
    out = decode_attention(q, k8.reshape(B, S, KH * D), v8.reshape(B, S, KH * D),
                           lengths, k_scale=k_scale, v_scale=v_scale,
                           out_dtype=jnp.float32)
    # reference on the DEQUANTIZED codes (same information the kernel sees)
    kd = np.asarray(k8.astype(jnp.float32)) * k_scale
    vd = np.asarray(v8.astype(jnp.float32)) * v_scale
    ref = ref_attention(q, kd, vd, np.asarray(lengths))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-2, atol=1e-2)


def test_int8_cache_parity(rng, interp):
    """INT8 caches take the int8-MXU path (raw-code score dot + requantized
    probabilities): parity vs the dequantized reference within the 7-bit
    q/probability requantization noise."""
    B, S, KH, G, D = 2, 32, 2, 4, 64
    q = jnp.asarray(rng.standard_normal((B, KH, G, D)), jnp.float32)
    k = rng.standard_normal((B, S, KH, D)).astype(np.float32)
    v = rng.standard_normal((B, S, KH, D)).astype(np.float32)
    k_scale, v_scale = 4.0 / 127, 3.5 / 127
    k8 = jnp.asarray(np.clip(np.round(k / k_scale), -127, 127), jnp.int8)
    v8 = jnp.asarray(np.clip(np.round(v / v_scale), -127, 127), jnp.int8)
    lengths = jnp.asarray([9, 32], jnp.int32)
    out = decode_attention(q, k8.reshape(B, S, KH * D), v8.reshape(B, S, KH * D),
                           lengths, k_scale=k_scale, v_scale=v_scale,
                           out_dtype=jnp.float32)
    kd = np.asarray(k8, np.float32) * k_scale
    vd = np.asarray(v8, np.float32) * v_scale
    ref = ref_attention(q, kd, vd, np.asarray(lengths))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=4e-2, atol=4e-2)


def test_length_one(rng, interp):
    B, S, KH, G, D = 1, 16, 1, 8, 64
    q = jnp.asarray(rng.standard_normal((B, KH, G, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, KH, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, KH, D)), jnp.float32)
    lengths = jnp.asarray([1], jnp.int32)
    out = decode_attention(q, k.reshape(B, S, KH * D), v.reshape(B, S, KH * D),
                           lengths, out_dtype=jnp.float32)
    # attending to a single key returns that value row (through bf16 rounding)
    np.testing.assert_allclose(
        np.asarray(out[0, 0]), np.tile(np.asarray(v[0, 0, 0]), (G, 1)),
        rtol=8e-3, atol=8e-3,
    )


def ref_attention_sinks(q, k, v, lengths, sinks=None, softcap=None):
    """Reference with optional per-head sink logits and tanh softcap."""
    B, KH, G, D = q.shape
    out = np.zeros((B, KH, G, D), np.float32)
    for b in range(B):
        L = int(lengths[b])
        for h in range(KH):
            s = np.asarray(q[b, h], np.float32) @ np.asarray(
                k[b, :L, h], np.float32).T / np.sqrt(D)
            if softcap is not None:
                s = np.tanh(s / softcap) * softcap
            if sinks is not None:
                s = np.concatenate([s, np.tile(
                    np.asarray(sinks[h], np.float32).reshape(G, 1), (1, 1))], 1)
            p = np.exp(s - s.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            if sinks is not None:
                p = p[:, :-1]
            out[b, h] = p @ np.asarray(v[b, :L, h], np.float32)
    return out


def test_decode_kernel_sinks_and_softcap(rng, interp):
    B, S, KH, G, D = 2, 32, 2, 4, 64
    q = jnp.asarray(rng.standard_normal((B, KH, G, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, KH, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, KH, D)), jnp.float32)
    lengths = jnp.asarray([9, 32], jnp.int32)
    sinks = rng.standard_normal((KH, G)).astype(np.float32)
    for cap in (None, 5.0):
        out = decode_attention(
            q, k.reshape(B, S, KH * D), v.reshape(B, S, KH * D), lengths,
            out_dtype=jnp.float32, sinks=jnp.asarray(sinks), softcap=cap,
        )
        ref = ref_attention_sinks(q, np.asarray(k), np.asarray(v),
                                  np.asarray(lengths), sinks, cap)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-2, atol=1e-2)


def test_fused_kernel_sinks_matches_ref(rng, interp):
    from modelopt_tpu.kernels.attention import fused_decode_attention

    B, S, KH, G, D = 2, 32, 2, 4, 64
    q = jnp.asarray(rng.standard_normal((B, KH, G, D)), jnp.float32)
    k = rng.standard_normal((B, S, KH, D)).astype(np.float32)
    v = rng.standard_normal((B, S, KH, D)).astype(np.float32)
    pos = np.asarray([7, 19])
    kn = jnp.asarray(rng.standard_normal((B, 1, KH, D)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((B, 1, KH, D)), jnp.float32)
    sinks = rng.standard_normal((KH, G)).astype(np.float32)
    out, ck, cv = fused_decode_attention(
        q, kn.reshape(B, 1, KH * D), vn.reshape(B, 1, KH * D),
        jnp.asarray(k.reshape(B, S, KH * D)),
        jnp.asarray(v.reshape(B, S, KH * D)),
        jnp.asarray(pos, jnp.int32), out_dtype=jnp.float32,
        sinks=jnp.asarray(sinks), softcap=5.0,
    )
    # reference: the new token joins at position pos[b]
    kk, vv = k.copy(), v.copy()
    for b in range(2):
        kk[b, pos[b]] = np.asarray(kn)[b, 0]
        vv[b, pos[b]] = np.asarray(vn)[b, 0]
    ref = ref_attention_sinks(q, kk, vv, pos + 1, sinks, 5.0)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-2, atol=1e-2)


def test_no_pallas_attn_kill_switch(monkeypatch):
    """MODELOPT_TPU_NO_PALLAS_ATTN=1 forces the XLA fallbacks (bench.py's
    defensive retry path relies on this)."""
    from modelopt_tpu.kernels.attention import dense_kv_write, fused_decode_ok

    monkeypatch.setenv("MODELOPT_TPU_NO_PALLAS_ATTN", "1")
    assert not fused_decode_ok((4, 8, 4, 128), 256, jnp.bfloat16)
    # dense_kv_write still works (vmapped dynamic_update_slice path)
    cache = jnp.zeros((2, 8, 256), jnp.bfloat16)
    vals = jnp.ones((2, 1, 256), jnp.bfloat16)
    out = dense_kv_write(cache, vals, jnp.asarray([0, 3], jnp.int32))
    assert float(out[0, 0].sum()) == 256.0 and float(out[1, 3].sum()) == 256.0
    assert float(out.sum()) == 512.0
