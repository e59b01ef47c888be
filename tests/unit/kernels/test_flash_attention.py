"""Flash attention parity (interpreter mode) vs the XLA einsum reference,
including the cached-prefill variant (chunk queries vs cache slabs),
incl. causal masking, GQA row flattening, sliding windows, and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from modelopt_tpu.kernels.flash_attention import _xla_reference, flash_attention


@pytest.fixture
def interp():
    with pltpu.force_tpu_interpret_mode():
        yield


def _inputs(rng, B=2, T=128, KH=2, G=4, D=64):
    q = jnp.asarray(rng.standard_normal((B, T, KH, G, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, KH, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, KH, D)), jnp.float32)
    return q, k, v


def test_causal_parity(rng, interp):
    q, k, v = _inputs(rng)
    out = flash_attention(q, k, v, True, None, 0, 64)
    ref = _xla_reference(q, k, v, True, None, 0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_window_parity(rng, interp):
    q, k, v = _inputs(rng, T=128)
    out = flash_attention(q, k, v, True, 32, 4, 64)
    ref = _xla_reference(q, k, v, True, 32, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_uneven_tile_pad(rng, interp):
    # T*G not a multiple of block_q
    q, k, v = _inputs(rng, T=96, G=4)
    out = flash_attention(q, k, v, True, None, 0, 256)
    ref = _xla_reference(q, k, v, True, None, 0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_gradients_match_xla(rng, interp):
    q, k, v = _inputs(rng, B=1, T=32, KH=1, G=2, D=64)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, True, None, 0, 64) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_reference(q, k, v, True, None, 0) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3)


def _prefill_ref(q, ck, cv, start, KH, D):
    """Einsum reference over the cache slabs with start-offset causality."""
    B, T = q.shape[0], q.shape[1]
    S = ck.shape[1]
    k4 = ck.reshape(B, S, KH, D).astype(jnp.float32)
    v4 = cv.reshape(B, S, KH, D).astype(jnp.float32)
    scores = jnp.einsum("btkgd,bskd->bkgts", q.astype(jnp.float32), k4) \
        / jnp.sqrt(D)
    qpos = start[:, None, None, None, None] + jnp.arange(T)[None, None, None, :, None]
    kpos = jnp.arange(S)[None, None, None, None, :]
    scores = jnp.where(kpos <= qpos, scores, -1e9)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bkgts,bskd->btkgd", p, v4)


def test_cached_prefill_parity(rng, interp):
    """Chunk queries vs cache slabs: per-slot start offsets, bf16 cache."""
    from modelopt_tpu.kernels.flash_attention import flash_prefill_attention

    B, T, KH, G, D, S = 2, 64, 2, 2, 64, 256
    q = jnp.asarray(rng.standard_normal((B, T, KH, G, D)), jnp.float32)
    ck = jnp.asarray(rng.standard_normal((B, S, KH * D)), jnp.bfloat16)
    cv = jnp.asarray(rng.standard_normal((B, S, KH * D)), jnp.bfloat16)
    start = jnp.asarray([0, 100], jnp.int32)
    out = flash_prefill_attention(q, ck, cv, start, out_dtype=jnp.float32)
    ref = _prefill_ref(q.astype(jnp.bfloat16), ck, cv, start, KH, D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_cached_prefill_int8_scales(rng, interp):
    from modelopt_tpu.kernels.flash_attention import flash_prefill_attention

    B, T, KH, G, D, S = 1, 64, 2, 2, 64, 128
    q = jnp.asarray(rng.standard_normal((B, T, KH, G, D)), jnp.float32)
    ck = jnp.asarray(rng.integers(-127, 128, (B, S, KH * D)), jnp.int8)
    cv = jnp.asarray(rng.integers(-127, 128, (B, S, KH * D)), jnp.int8)
    ks, vs = jnp.float32(0.011), jnp.float32(0.017)
    start = jnp.asarray([32], jnp.int32)
    out = flash_prefill_attention(q, ck, cv, start, k_scale=ks, v_scale=vs,
                                  out_dtype=jnp.float32)
    ref = _prefill_ref(q.astype(jnp.bfloat16),
                       (ck.astype(jnp.float32) * ks).astype(jnp.bfloat16),
                       (cv.astype(jnp.float32) * vs).astype(jnp.bfloat16),
                       start, KH, D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-2, atol=3e-2)
