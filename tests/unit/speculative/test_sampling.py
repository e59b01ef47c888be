"""Rejection-sampling core: the emitted-token distribution must equal the
target's, independent of the draft (the speculative-sampling theorem)."""

import jax
import jax.numpy as jnp
import numpy as np

from modelopt_tpu.speculative.sampling import rejection_sample, tempered_probs


def test_first_token_marginal_matches_target():
    V, K, N = 8, 3, 20000
    rng = np.random.default_rng(0)
    p = rng.dirichlet(np.ones(V), size=K + 1).astype(np.float32)
    q = rng.dirichlet(np.ones(V), size=K).astype(np.float32)
    pj = jnp.asarray(p)
    qj = jnp.asarray(q)

    def trial(key):
        k1, k2 = jax.random.split(key)
        toks = jax.random.categorical(k1, jnp.log(qj), axis=-1).astype(jnp.int32)
        emitted, n = rejection_sample(pj, qj, toks, k2)
        return emitted[0]

    keys = jax.random.split(jax.random.PRNGKey(1), N)
    first = np.asarray(jax.jit(jax.vmap(trial))(keys))
    emp = np.bincount(first, minlength=V) / N
    tv = 0.5 * np.abs(emp - p[0]).sum()
    assert tv < 0.03, (tv, emp, p[0])


def test_greedy_degeneracy():
    """One-hot p/q (temperature 0): accept exactly the matching prefix and
    emit the target argmax at the first mismatch."""
    V, K = 8, 3
    logits_p = jnp.asarray([[0, 9, 0, 0, 0, 0, 0, 0],
                            [0, 0, 9, 0, 0, 0, 0, 0],
                            [0, 0, 0, 9, 0, 0, 0, 0],
                            [0, 0, 0, 0, 9, 0, 0, 0]], jnp.float32)
    p = tempered_probs(logits_p, jnp.float32(0.0))
    # draft proposes 1, 2, 7 (third is wrong: target argmax there is 3)
    q = jax.nn.one_hot(jnp.asarray([1, 2, 7]), V, dtype=jnp.float32)
    toks = jnp.asarray([1, 2, 7], jnp.int32)
    emitted, n = rejection_sample(p, q, toks, jax.random.PRNGKey(0))
    assert int(n) == 3
    assert list(np.asarray(emitted[:3])) == [1, 2, 3]
    # all match -> K accepts + bonus from p[K]
    toks2 = jnp.asarray([1, 2, 3], jnp.int32)
    q2 = jax.nn.one_hot(toks2, V, dtype=jnp.float32)
    emitted2, n2 = rejection_sample(p, q2, toks2, jax.random.PRNGKey(0))
    assert int(n2) == 4
    assert list(np.asarray(emitted2)) == [1, 2, 3, 4]


def test_emit_count_bounds():
    V, K = 8, 2
    rng = np.random.default_rng(2)
    p = jnp.asarray(rng.dirichlet(np.ones(V), size=K + 1), jnp.float32)
    q = jnp.asarray(rng.dirichlet(np.ones(V), size=K), jnp.float32)
    for s in range(20):
        k1, k2 = jax.random.split(jax.random.PRNGKey(s))
        toks = jax.random.categorical(k1, jnp.log(q), axis=-1).astype(jnp.int32)
        emitted, n = rejection_sample(p, q, toks, k2)
        assert 1 <= int(n) <= K + 1
