"""Paged decode-attention kernel parity (interpreter mode) vs the XLA
gather fallback and a dense reference, incl. fp8 pages, ragged lengths,
and out-of-range page-table entries."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from modelopt_tpu.kernels.paged_attention import (
    paged_decode_attention,
    paged_decode_attention_xla,
    paged_gather_dense,
)


@pytest.fixture
def interp():
    with pltpu.force_tpu_interpret_mode():
        yield


def make_case(rng, B=2, KH=2, G=4, D=64, page_size=16, PMAX=4, n_pages=16,
              lengths=(10, 61)):
    q = jnp.asarray(rng.standard_normal((B, KH, G, D)), jnp.float32)
    k_pages = jnp.asarray(rng.standard_normal((n_pages, page_size, KH * D)),
                          jnp.float32)
    v_pages = jnp.asarray(rng.standard_normal((n_pages, page_size, KH * D)),
                          jnp.float32)
    # distinct pages per slot; unused entries point at page 0 (masked)
    pt = np.zeros((B, PMAX), np.int32)
    ids = rng.permutation(np.arange(1, n_pages))[: B * PMAX]
    for b in range(B):
        used = -(-int(lengths[b]) // page_size)
        pt[b, :used] = ids[b * PMAX : b * PMAX + used]
    return q, k_pages, v_pages, jnp.asarray(pt), jnp.asarray(lengths, jnp.int32)


def dense_ref(q, k_pages, v_pages, pt, lengths):
    B, KH, G, D = q.shape
    k = np.asarray(paged_gather_dense(k_pages, pt)).reshape(B, -1, KH, D)
    v = np.asarray(paged_gather_dense(v_pages, pt)).reshape(B, -1, KH, D)
    out = np.zeros((B, KH, G, D), np.float32)
    for b in range(B):
        L = int(lengths[b])
        for h in range(KH):
            s = np.asarray(q[b, h], np.float32) @ k[b, :L, h].T / np.sqrt(D)
            p = np.exp(s - s.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            out[b, h] = p @ v[b, :L, h]
    return out


def test_paged_kernel_parity(rng, interp):
    q, kp, vp, pt, lens = make_case(rng)
    out = paged_decode_attention(q, kp, vp, pt, lens, out_dtype=jnp.float32)
    ref = dense_ref(q, kp, vp, pt, lens)
    # kernel computes q/k/v in bf16 on the MXU: parity bounded by bf16 rounding
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-2, atol=1e-2)


def test_xla_fallback_parity(rng):
    q, kp, vp, pt, lens = make_case(rng, lengths=(16, 64))
    out = paged_decode_attention_xla(q, kp, vp, pt, lens, out_dtype=jnp.float32)
    ref = dense_ref(q, kp, vp, pt, lens)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)


def test_paged_fp8_pages(rng, interp):
    q, kp, vp, pt, lens = make_case(rng, lengths=(23, 41))
    ks, vs = 0.02, 0.05
    kp8 = (kp / ks).astype(jnp.float8_e4m3fn)
    vp8 = (vp / vs).astype(jnp.float8_e4m3fn)
    out = paged_decode_attention(q, kp8, vp8, pt, lens, k_scale=ks, v_scale=vs,
                                 out_dtype=jnp.float32)
    kd = jnp.asarray(np.asarray(kp8.astype(jnp.float32))) * ks
    vd = jnp.asarray(np.asarray(vp8.astype(jnp.float32))) * vs
    ref = dense_ref(q, kd, vd, pt, lens)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=4e-3, atol=4e-3)


def test_single_token_length(rng, interp):
    q, kp, vp, pt, lens = make_case(rng, lengths=(1, 33))
    out = paged_decode_attention(q, kp, vp, pt, lens, out_dtype=jnp.float32)
    # slot 0 attends to exactly the first key of its first page
    pid = int(pt[0, 0])
    D = q.shape[3]
    np.testing.assert_allclose(
        np.asarray(out[0, 0]),
        np.tile(np.asarray(vp[pid, 0, :D]), (q.shape[2], 1)),
        rtol=8e-3, atol=8e-3,
    )
