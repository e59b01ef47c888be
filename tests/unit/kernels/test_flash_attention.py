"""Flash attention parity (interpreter mode) vs the XLA einsum reference,
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
