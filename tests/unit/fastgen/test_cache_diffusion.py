"""Cache diffusion (DeepCache-style deep-block reuse; reference analogue:
examples/diffusers/cache_diffusion)."""

import jax
import jax.numpy as jnp
import numpy as np

from modelopt_tpu.core import ModelBundle
from modelopt_tpu.fastgen import cache_ddim_sample
from modelopt_tpu.models.dit import DiT, ddim_sample, dit_config_s


def dit_bundle():
    cfg = dit_config_s(dtype=jnp.float32)
    m = DiT(cfg)
    x = jnp.zeros((2, cfg.image_size, cfg.image_size, cfg.in_channels), jnp.float32)
    t = jnp.zeros((2,), jnp.int32)
    y = jnp.zeros((2,), jnp.int32)
    v = m.init(jax.random.PRNGKey(0), x, t, y)
    return ModelBundle(module=m, variables=dict(v), example_inputs=(x, t, y))


def test_interval_one_matches_plain_sampler():
    bundle = dit_bundle()
    key = jax.random.PRNGKey(1)
    ref = ddim_sample(bundle, key, num_steps=4)
    got, stats = cache_ddim_sample(bundle, key, num_steps=4, cache_interval=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    assert stats["blocks_run"] == stats["blocks_total"]


def test_caching_saves_compute_with_bounded_drift():
    bundle = dit_bundle()
    key = jax.random.PRNGKey(1)
    ref = ddim_sample(bundle, key, num_steps=6)
    got, stats = cache_ddim_sample(bundle, key, num_steps=6,
                                   cache_interval=3)
    # deep blocks actually skipped on cached steps
    assert stats["blocks_run"] < stats["blocks_total"]
    assert stats["refresh_steps"] == [0, 3]
    # and the sample stays close to the uncached trajectory
    r = np.asarray(ref, np.float32)
    g = np.asarray(got, np.float32)
    rel = np.linalg.norm(g - r) / np.linalg.norm(r)
    assert rel < 0.5, rel


def test_composes_with_quantization():
    import modelopt_tpu.quant as mtq

    bundle = dit_bundle()
    x, t, y = bundle.example_inputs
    q = mtq.quantize(bundle, mtq.FP8_DEFAULT_CFG, lambda f: f(x, t, y))
    got, stats = cache_ddim_sample(q, jax.random.PRNGKey(2), num_steps=4,
                                   cache_interval=2)
    assert np.isfinite(np.asarray(got)).all()
    assert stats["blocks_run"] < stats["blocks_total"]
