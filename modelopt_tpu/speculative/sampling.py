"""Stochastic speculative sampling (rejection sampling).

Extends the engine's greedy-lossless draft-verify to temperature>0 with
the standard speculative-sampling acceptance rule (Leviathan et al. 2023;
the reference's speculative stack is greedy/eval-only — sampling support
is what vLLM's rejection sampler provides on GPU):

    accept draft token x_i with prob min(1, p_i(x_i) / q_i(x_i));
    on the first rejection at i, emit one token from norm(max(p_i - q_i, 0))
    and stop; if all K drafts accept, emit a bonus token from p_K.

The emitted sequence is distributed EXACTLY as ancestral sampling from the
target model p — the draft q only affects throughput, never the
distribution. At temperature 0 the softmaxes saturate to one-hots and the
rule degenerates to the greedy accept-on-match path.

Everything is shape-static and batch-vectorized: per-slot (p, q, drafts,
key) go through ``rejection_sample`` under vmap inside the engine's one
compiled spec-decode program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tempered_probs(logits, temp):
    """softmax(logits / max(temp, eps)) in f32 — at temp=0 this saturates
    to an exact one-hot of the argmax (gaps / 1e-6 overflow the exp)."""
    t = jnp.maximum(temp, 1e-6)
    return jax.nn.softmax(logits.astype(jnp.float32) / t, axis=-1)


def rejection_sample(p, q, draft_toks, key):
    """One slot's speculative-sampling step.

    p [K+1, V] target probs at positions 0..K (position i conditions on
    drafts 0..i-1 being accepted); q [K, V] draft proposal probs;
    draft_toks [K] the tokens actually drafted (sampled from q).

    Returns (emitted [K+1] int32, n_emit int32): ``emitted[:n_emit]`` are
    the output tokens — accepted drafts, then either the residual
    resample (on rejection) or the bonus token (all accepted).
    """
    K, V = q.shape
    pos = jnp.arange(K)
    p_tok = p[pos, draft_toks]
    q_tok = q[pos, draft_toks]
    u = jax.random.uniform(key, (K,))
    accept = u * jnp.maximum(q_tok, 1e-20) < p_tok
    # number of leading accepts
    n_acc = jnp.sum(jnp.cumprod(accept.astype(jnp.int32)))
    # residual distribution at the rejection position (row K = bonus):
    # max(p - q, 0) normalized; all-accepted uses p[K] against q=0
    r = jnp.minimum(n_acc, K)
    q_pad = jnp.concatenate([q, jnp.zeros((1, V), q.dtype)], axis=0)
    resid = jnp.maximum(p[r] - jnp.where(n_acc == K, 0.0, 1.0) * q_pad[r], 0.0)
    mass = jnp.sum(resid)
    # degenerate guard (p <= q everywhere can only happen via float
    # rounding): fall back to p[r]
    resid = jnp.where(mass > 1e-12, resid / jnp.maximum(mass, 1e-12), p[r])
    key, sub = jax.random.split(key)
    extra = jax.random.categorical(sub, jnp.log(jnp.maximum(resid, 1e-30)))
    emitted = jnp.where(pos < n_acc, draft_toks, 0)
    emitted = jnp.concatenate([emitted, jnp.zeros((1,), jnp.int32)])
    emitted = emitted.at[r].set(extra.astype(jnp.int32))
    return emitted, n_acc + 1
