"""Diffusion (DiT) family: forward, PTQ with the standard presets, QAT-style
gradients, DDIM sampling on quantized models
(reference analogue: examples/diffusers quantization tests)."""

import jax
import jax.numpy as jnp
import numpy as np

import modelopt_tpu.quant as mtq
from modelopt_tpu.core import ModelBundle
from modelopt_tpu.models import DiT, ddim_sample, dit_config_s


def dit_bundle():
    cfg = dit_config_s(dtype=jnp.float32)
    m = DiT(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 4)), jnp.float32)
    t = jnp.asarray([10, 500], jnp.int32)
    y = jnp.asarray([1, 3], jnp.int32)
    variables = m.init(jax.random.PRNGKey(0), x, t, y)
    return ModelBundle(module=m, variables=dict(variables), example_inputs=(x, t, y))


class TestDiT:
    def test_forward_shape(self):
        b = dit_bundle()
        out = b.apply(*b.example_inputs)
        assert out.shape == (2, 16, 16, 4)

    def test_ptq_presets(self):
        b = dit_bundle()
        x, t, y = b.example_inputs
        base = b.apply(x, t, y)
        for preset in ("INT8_DEFAULT_CFG", "FP8_DEFAULT_CFG", "NVFP4_DEFAULT_CFG"):
            q = mtq.quantize(b, preset, lambda f: f(x, t, y))
            out = q.apply(x, t, y)
            rel = float(jnp.linalg.norm(out - base) / jnp.linalg.norm(base))
            assert 0 < rel < 0.5, (preset, rel)

    def test_smoothquant_on_dit(self):
        b = dit_bundle()
        x, t, y = b.example_inputs
        q = mtq.quantize(b, mtq.INT8_SMOOTHQUANT_CFG, lambda f: f(x, t, y))
        assert "pre_quant_scale" in q.variables["quant"]["blocks_0"]["qkv_proj"][
            "input_quantizer"
        ]

    def test_ddim_sampling_quantized(self):
        b = dit_bundle()
        x, t, y = b.example_inputs
        q = mtq.quantize(b, mtq.FP8_DEFAULT_CFG, lambda f: f(x, t, y))
        img = ddim_sample(q, jax.random.PRNGKey(1), num_steps=4, batch=2)
        assert img.shape == (2, 16, 16, 4)
        assert np.isfinite(np.asarray(img)).all()

    def test_gradients_flow(self):
        b = dit_bundle()
        x, t, y = b.example_inputs
        q = mtq.quantize(b, mtq.NVFP4_DEFAULT_CFG, lambda f: f(x, t, y))
        apply_fn = q.make_fn()
        rest = {k: v for k, v in q.variables.items() if k != "params"}

        def loss(params):
            out = apply_fn({"params": params, **rest}, x, t, y)
            return jnp.mean(out.astype(jnp.float32) ** 2)

        g = jax.grad(loss)(q.variables["params"])
        gn = float(
            jnp.sqrt(sum(jnp.sum(v**2) for v in jax.tree.leaves(g)))
        )
        assert np.isfinite(gn) and gn > 0
