"""Hadamard rotation for outlier-smoothed quantization.

QuaRot/SpinQuant-style: quantize in a rotated basis where outliers are
spread across the whole vector, then rotate back — the quantization error
shrinks while the tensor (and everything downstream) is unchanged up to
that error (reference: modelopt/torch/quantization/config.py:289
RotateConfig; consumed per-quantizer via ``QuantizerSpec.rotate``).

The normalized Sylvester-Hadamard matrix is symmetric and involutory
(H = H^T = H^-1), so the same transform applies and undoes the rotation.
Applied as one [d, d] matmul on the last axis — on TPU this rides the MXU
and is negligible at head-dim sizes (the intended use: KV/Q quantizers).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _hadamard_np(d: int) -> np.ndarray:
    if d & (d - 1) != 0 or d < 1:
        raise ValueError(f"Hadamard rotation needs a power-of-2 dim, got {d}")
    h = np.asarray([[1.0]], np.float32)
    while h.shape[0] < d:
        h = np.block([[h, h], [h, -h]])
    return (h / np.sqrt(d)).astype(np.float32)


def hadamard_rotate(x: jnp.ndarray) -> jnp.ndarray:
    """Rotate the last axis by the normalized Hadamard matrix (involutory:
    apply twice to undo)."""
    d = x.shape[-1]
    h = jnp.asarray(_hadamard_np(d))
    return jnp.matmul(x.astype(jnp.float32), h).astype(x.dtype)
