"""Cache diffusion: DeepCache-style deep-block reuse across sampler steps
(reference: examples/diffusers/cache_diffusion — caches UNet/DiT block
outputs and refreshes them every N steps; here the split is native to the
DiT module, models/dit.py ``shallow``/``deep_delta`` hooks).

TPU-idiomatic shape: exactly TWO jitted programs regardless of schedule —
a REFRESH step (full stack, also emits the deep-stack residual) and a
CACHED step (shallow blocks only; XLA never even traces the deep blocks,
so the savings are real compute, not a skipped branch). The refresh
schedule is static Python, so each sampler step dispatches one of the two
compiled programs with no data-dependent control flow inside jit.

Composes with the whole quantization stack: the bundle may be fake-quant,
compressed, or QAT-tuned — the hooks ride the same make_fn path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["cache_ddim_sample", "cache_unet_ddim_sample"]


def cache_unet_ddim_sample(bundle, key, num_steps: int = 8, batch: int = 1,
                           context=None, cache_interval: int = 3):
    """DeepCache sampling for the UNet family (models/unet.py): every
    ``cache_interval``-th step runs the full UNet and caches the DEEP
    feature (input of the top up-level); intermediate steps recompute only
    conv_in + the top down/up level and splice the cached deep feature in.
    Same two-compiled-programs shape as the DiT variant (reference:
    examples/diffusers/cache_diffusion applied to UNet pipelines).

    Returns ``(x, stats)`` with ``stats["deep_runs"]`` / ``stats["steps"]``
    for the compute-saved report."""
    cfg = bundle.module.cfg
    shape = (batch, cfg.image_size, cfg.image_size, cfg.in_channels)
    x = jax.random.normal(key, shape, jnp.float32)

    apply_fn = bundle.make_fn()
    refresh = jax.jit(
        lambda v, x, t, c: apply_fn(v, x, t, None, c, shallow=1))
    cached = jax.jit(
        lambda v, x, t, c, d: apply_fn(v, x, t, None, c, deep_feats=d))

    ts = jnp.linspace(999, 0, num_steps).astype(jnp.int32)
    alphas = jnp.linspace(0.999, 0.01, 1000)
    deep = None
    deep_runs = 0
    for i in range(num_steps):
        t = jnp.full((batch,), ts[i], jnp.int32)
        if deep is None or i % cache_interval == 0:
            eps, deep = refresh(bundle.variables, x.astype(cfg.dtype), t,
                                context)
            deep_runs += 1
        else:
            eps = cached(bundle.variables, x.astype(cfg.dtype), t, context,
                         deep)
        eps = eps.astype(jnp.float32)
        a_t = alphas[ts[i]]
        a_prev = alphas[ts[i + 1]] if i + 1 < num_steps else jnp.float32(1.0)
        x0 = (x - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
        x = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1 - a_prev) * eps
    return x, {"deep_runs": deep_runs, "steps": num_steps}


def cache_ddim_sample(bundle, key, num_steps: int = 8, batch: int = 2,
                      y: Optional[jnp.ndarray] = None,
                      cache_interval: int = 3, shallow: Optional[int] = None):
    """DDIM sampling with deep-block caching.

    Every ``cache_interval``-th step runs the full DiT and refreshes the
    cached deep-stack residual; intermediate steps run only the first
    ``shallow`` blocks (default: num_layers // 3, min 1) and splice the
    cached residual in. ``cache_interval=1`` disables caching (every step
    refreshes) and reproduces the plain sampler's trajectory exactly.

    Returns ``(x, stats)`` with ``stats = {"blocks_run", "blocks_total",
    "refresh_steps"}`` so callers can report the compute saved.
    """
    cfg = bundle.module.cfg
    L = cfg.num_layers
    k = int(shallow) if shallow is not None else max(1, L // 3)
    shape = (batch, cfg.image_size, cfg.image_size, cfg.in_channels)
    x = jax.random.normal(key, shape, jnp.float32)
    if y is None:
        y = jnp.zeros((batch,), jnp.int32)

    apply_fn = bundle.make_fn()
    refresh = jax.jit(
        lambda v, x, t, y: apply_fn(v, x, t, y, shallow=k))
    cached = jax.jit(
        lambda v, x, t, y, d: apply_fn(v, x, t, y, deep_delta=d, shallow=k))

    ts = jnp.linspace(999, 0, num_steps).astype(jnp.int32)
    alphas = jnp.linspace(0.999, 0.01, 1000)
    delta = None
    blocks_run = 0
    refresh_steps = []
    for i in range(num_steps):
        t = jnp.full((batch,), ts[i], jnp.int32)
        if delta is None or i % cache_interval == 0:
            eps, delta = refresh(bundle.variables, x.astype(cfg.dtype), t, y)
            blocks_run += L
            refresh_steps.append(i)
        else:
            eps = cached(bundle.variables, x.astype(cfg.dtype), t, y, delta)
            blocks_run += k
        eps = eps.astype(jnp.float32)
        a_t = alphas[ts[i]]
        a_prev = alphas[ts[i + 1]] if i + 1 < num_steps else jnp.float32(1.0)
        x0 = (x - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
        x = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1 - a_prev) * eps
    stats = {"blocks_run": blocks_run, "blocks_total": L * num_steps,
             "refresh_steps": refresh_steps}
    return x, stats
