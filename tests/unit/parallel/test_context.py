"""Ring attention (context parallelism) must exactly reproduce full
softmax attention while keeping K/V sequence-sharded."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modelopt_tpu.parallel import context_parallel_attention, make_mesh


def _reference(q, k, v, causal):
    B, T, H, D = q.shape
    KH = k.shape[2]
    G = H // KH
    qg = q.reshape(B, T, KH, G, D)
    s = jnp.einsum("btkgd,bskd->bkgts", qg, k,
                   preferred_element_type=jnp.float32) / np.sqrt(D)
    if causal:
        mask = jnp.tril(jnp.ones((T, T), bool))
        s = jnp.where(mask[None, None, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bkgts,bskd->bkgtd", p, v.astype(jnp.float32))
    return o.transpose(0, 3, 1, 2, 4).reshape(B, T, H, D)


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("kh", [4, 2])  # MHA and GQA
def test_ring_matches_full_attention(causal, kh):
    mesh = make_mesh({"sp": 8})
    rng = np.random.default_rng(0)
    B, T, H, D = 2, 64, 4, 8
    q = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, T, kh, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, T, kh, D)), jnp.float32)
    got = jax.jit(
        lambda q, k, v: context_parallel_attention(q, k, v, mesh, causal=causal)
    )(q, k, v)
    want = _reference(q, k, v, causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("kh", [4, 2])  # MHA and GQA
def test_zigzag_matches_full_attention(kh):
    mesh = make_mesh({"sp": 8})
    rng = np.random.default_rng(1)
    B, T, H, D = 2, 64, 4, 8
    q = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, T, kh, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, T, kh, D)), jnp.float32)
    got = jax.jit(
        lambda q, k, v: context_parallel_attention(
            q, k, v, mesh, causal=True, zigzag=True)
    )(q, k, v)
    want = _reference(q, k, v, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_zigzag_halves_causal_flops():
    """The zigzag interleave must cut the compiled MXU work of causal
    prefill to ~(n+1)/2n of the contiguous ring (measured on the lowered
    module's own cost model, not wall-clock)."""
    mesh = make_mesh({"sp": 8})
    B, T, H, D = 1, 1024, 4, 64
    q = jnp.ones((B, T, H, D), jnp.float32)

    def flops(zz):
        fn = jax.jit(lambda q: context_parallel_attention(
            q, q, q, mesh, causal=True, zigzag=zz))
        comp = fn.lower(q).compile()
        costs = comp.cost_analysis()
        if isinstance(costs, list):
            costs = costs[0]
        return costs["flops"]

    f_ring, f_zz = flops(False), flops(True)
    # ideal ratio at n=8 is (n+1)/2n = 0.5625; allow overhead headroom
    assert f_zz < 0.7 * f_ring, (f_zz, f_ring)


def test_zigzag_requires_divisible_2n():
    mesh = make_mesh({"sp": 8})
    q = jnp.zeros((1, 72, 4, 8))  # divisible by 8, not by 16
    with pytest.raises(ValueError, match="zigzag"):
        context_parallel_attention(q, q[:, :, :4], q[:, :, :4], mesh,
                                   zigzag=True)


def test_ring_requires_divisible_seq():
    mesh = make_mesh({"sp": 8})
    q = jnp.zeros((1, 60, 4, 8))
    with pytest.raises(ValueError, match="not divisible"):
        context_parallel_attention(q, q[:, :, :4], q[:, :, :4], mesh)


def test_ring_keeps_sequence_sharded():
    """Output sharding stays on the sequence axis — no gather to one device."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh({"sp": 8})
    B, T, H, D = 1, 64, 2, 8
    sh = NamedSharding(mesh, P(None, "sp", None, None))
    q = jax.device_put(jnp.ones((B, T, H, D), jnp.float32), sh)
    out = jax.jit(
        lambda q: context_parallel_attention(q, q, q, mesh)
    )(q)
    assert out.sharding.spec == P(None, "sp", None, None)
