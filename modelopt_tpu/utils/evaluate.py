"""Evaluation helpers: perplexity + sampling loops.

(reference counterparts: examples/llm_eval and dataset_utils forward loops,
modelopt/torch/utils/dataset_utils.py:1183 create_forward_loop)
"""

from __future__ import annotations

import math
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.bundle import ModelBundle


def lm_cross_entropy(logits, targets, mask=None):
    """Mean negative log-likelihood over (optionally masked) targets."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if mask is None:
        return jnp.mean(nll)
    mask = mask.astype(jnp.float32)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def perplexity(bundle: ModelBundle, token_batches: Iterable, phase="quant") -> float:
    """Perplexity of next-token prediction over batches of token ids [B, T]."""
    fn = jax.jit(bundle.make_fn(phase=phase))
    total_nll, total_tok = 0.0, 0
    for ids in token_batches:
        ids = jnp.asarray(ids)
        out = fn(bundle.variables, ids)
        logits = out[0] if isinstance(out, tuple) else out
        nll = lm_cross_entropy(logits[:, :-1], ids[:, 1:])
        ntok = ids.shape[0] * (ids.shape[1] - 1)
        total_nll += float(nll) * ntok
        total_tok += ntok
    return math.exp(total_nll / max(total_tok, 1))


def synthetic_token_batches(
    vocab_size: int, num_batches: int = 4, batch: int = 2, seqlen: int = 64, seed: int = 0
):
    """Deterministic synthetic 'calibration data': Zipf-ish token draws with
    local repetition so models have non-trivial statistics. Used because this
    environment has no network access for real datasets."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(num_batches):
        ranks = rng.zipf(1.3, size=(batch, seqlen)).astype(np.int64)
        ids = np.clip(ranks, 1, vocab_size - 1).astype(np.int32)
        out.append(jnp.asarray(ids))
    return out
