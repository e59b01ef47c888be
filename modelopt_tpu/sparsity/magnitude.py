"""N:M structured sparsity masks by magnitude
(reference: modelopt/torch/sparsity/weight_sparsity/magnitude.py:91
create_asp_mask + best-pattern search :55-90).

Masks are computed along the input dim of ``[in, out]`` kernels (the
contraction dim — the layout TPU int8/bf16 MXU sparsity-aware GEMMs and the
reference's ASP convention both use)."""

from __future__ import annotations

import jax.numpy as jnp


def create_nm_mask(w: jnp.ndarray, n: int = 2, m: int = 4) -> jnp.ndarray:
    """Keep the ``n`` largest-|.| of every ``m`` consecutive input rows,
    per output channel. w: [in, out] -> bool mask [in, out]."""
    K, N = w.shape
    assert K % m == 0, f"in-dim {K} not divisible by M={m}"
    groups = jnp.abs(w.astype(jnp.float32)).reshape(K // m, m, N)
    # rank within each group; keep top-n
    order = jnp.argsort(groups, axis=1)  # ascending
    ranks = jnp.argsort(order, axis=1)
    mask = ranks >= (m - n)
    return mask.reshape(K, N)


def mask_sparsity(mask) -> float:
    import numpy as np

    m = np.asarray(mask)
    return 1.0 - m.mean()
