"""UNet diffusion family (models/unet.py) — the conv/UNet half of the
diffusion surface (reference: diffusers UNet2DConditionModel pipelines +
the SDXL rows of examples/benchmark.md:47-51)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import modelopt_tpu.quant as mtq
from modelopt_tpu.core import ModelBundle
from modelopt_tpu.models.unet import (
    UNet,
    sdxl_base_config,
    tiny_unet_test_config,
)


@pytest.fixture(scope="module")
def unet_bundle():
    cfg = tiny_unet_test_config()
    m = UNet(cfg)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, cfg.image_size, cfg.image_size,
                                cfg.in_channels), jnp.float32)
    t = jnp.asarray([10, 500], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(1),
                            (2, cfg.context_len, cfg.context_dim))
    v = m.init(jax.random.PRNGKey(2), x, t, None, ctx)
    return ModelBundle(module=m, variables=dict(v),
                       example_inputs=(x, t, None, ctx))


def test_forward_shape_finite(unet_bundle):
    x, t, _, ctx = unet_bundle.example_inputs
    eps = unet_bundle.apply(x, t, None, ctx)
    assert eps.shape == x.shape
    assert np.isfinite(np.asarray(eps)).all()


def test_sdxl_config_topology():
    cfg = sdxl_base_config()
    assert cfg.block_out_channels == (320, 640, 1280)
    assert cfg.transformer_layers_per_block == (0, 2, 10)
    assert cfg.context_dim == 2048


def test_deepcache_split_exact(unet_bundle):
    """The cached pass with the refresh pass's deep feature reproduces the
    full forward bit-for-bit on identical inputs — the DeepCache split is
    a pure recompute/reuse partition, not an approximation."""
    x, t, _, ctx = unet_bundle.example_inputs
    eps_full, deep = unet_bundle.apply(x, t, None, ctx, shallow=1)
    eps_cached = unet_bundle.apply(x, t, None, ctx, deep_feats=deep)
    np.testing.assert_array_equal(np.asarray(eps_full),
                                  np.asarray(eps_cached))


def test_cache_unet_sampler_runs(unet_bundle):
    from modelopt_tpu.fastgen.cache_diffusion import cache_unet_ddim_sample

    x, stats = cache_unet_ddim_sample(unet_bundle, jax.random.PRNGKey(0),
                                      num_steps=6, batch=1,
                                      cache_interval=3)
    assert np.isfinite(np.asarray(x)).all()
    assert stats["deep_runs"] == 2  # steps 0 and 3 refresh
    assert stats["steps"] == 6


def test_unet_ptq_int8_compress(unet_bundle):
    """The whole quantization stack applies: calibrate INT8, compress to
    packed codes, forward stays close to bf16."""
    x, t, _, ctx = unet_bundle.example_inputs
    base = np.asarray(unet_bundle.apply(x, t, None, ctx), np.float32)
    q = mtq.quantize(unet_bundle, mtq.INT8_DEFAULT_CFG,
                     lambda f: f(x, t, None, ctx))
    qc = mtq.compress(q)
    got = np.asarray(qc.apply(x, t, None, ctx), np.float32)
    rel = np.abs(got - base).max() / (np.abs(base).max() + 1e-9)
    assert rel < 0.12, rel
    # conv + dense weights both carry packed codes
    qv = qc.variables["quant"]
    assert "conv_in" in qv or "time_fc1" in qv
