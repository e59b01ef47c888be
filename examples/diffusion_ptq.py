"""Diffusion-model PTQ (reference: examples/diffusers quantization).

Quantize a DiT and compare sampled outputs across formats.

    python examples/diffusion_ptq.py --preset FP8_DEFAULT_CFG --steps 8
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # repo-checkout import path

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import modelopt_tpu.quant as mtq
    from modelopt_tpu.core import ModelBundle
    from modelopt_tpu.models import DiT, ddim_sample, dit_config_s

    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="FP8_DEFAULT_CFG")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--cache-interval", type=int, default=3,
                    help="cache-diffusion refresh interval (1 = off)")
    args = ap.parse_args()

    cfg = dit_config_s(hidden_size=args.hidden, num_layers=args.layers)
    m = DiT(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, cfg.image_size, cfg.image_size,
                                         cfg.in_channels)), jnp.float32)
    t = jnp.asarray(rng.integers(0, 1000, 4), jnp.int32)
    y = jnp.asarray(rng.integers(0, cfg.num_classes, 4), jnp.int32)
    variables = jax.jit(m.init)(jax.random.PRNGKey(0), x, t, y)
    bundle = ModelBundle(module=m, variables=dict(variables),
                         example_inputs=(x, t, y))

    q = mtq.quantize(bundle, args.preset, lambda f: f(x, t, y))
    img_base = ddim_sample(bundle, jax.random.PRNGKey(1), args.steps, 2)
    img_q = ddim_sample(q, jax.random.PRNGKey(1), args.steps, 2)
    rel = float(jnp.linalg.norm(img_q - img_base) / jnp.linalg.norm(img_base))
    print(f"{args.preset}: sampled-image relative deviation {rel:.4f} "
          f"over {args.steps} DDIM steps")

    if args.cache_interval > 1:
        # cache diffusion (reference: examples/diffusers/cache_diffusion):
        # deep DiT blocks refresh every N steps, shallow blocks every step
        from modelopt_tpu.fastgen import cache_ddim_sample

        img_c, stats = cache_ddim_sample(
            q, jax.random.PRNGKey(1), num_steps=args.steps, batch=2,
            cache_interval=args.cache_interval)
        rel_c = float(jnp.linalg.norm(img_c - img_base)
                      / jnp.linalg.norm(img_base))
        saved = 1 - stats["blocks_run"] / stats["blocks_total"]
        print(f"cache-diffusion (interval {args.cache_interval}): "
              f"{saved:.0%} of block compute skipped, deviation {rel_c:.4f}")


if __name__ == "__main__":
    main()
