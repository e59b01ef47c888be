"""Centralized seeding (reference: modelopt/torch/utils/random.py).

JAX is functional about randomness; this module provides one root key per
run plus deterministic named subkeys so independent components (calibration
sampling, LoRA init, serving sampler) never collide or depend on call order.
"""

from __future__ import annotations

import hashlib

import jax

_ROOT_SEED = 0


def seed_everything(seed: int):
    global _ROOT_SEED
    _ROOT_SEED = int(seed)
    import numpy as np

    np.random.seed(seed & 0x7FFFFFFF)


def named_key(name: str) -> jax.Array:
    h = int.from_bytes(hashlib.sha256(name.encode()).digest()[:4], "little")
    return jax.random.fold_in(jax.random.PRNGKey(_ROOT_SEED), h)
