"""VLM post-training quantization (reference: examples/vlm_ptq/).

Quantize a LLaVA-style vision-language model — both the ViT tower and the
language decoder go through the same PTQ stack — then check the quantized
model's output drift on image+text batches.

    python examples/vlm_ptq.py --preset INT8_DEFAULT_CFG
    python examples/vlm_ptq.py --model /ckpts/llava-1.5-7b --preset FP8_DEFAULT_CFG
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # repo-checkout import path

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def build_vlm(name: str):
    from modelopt_tpu.core import ModelBundle
    from modelopt_tpu.models import VLM, load_hf_checkpoint, tiny_vlm_config

    if os.path.isdir(name):
        return load_hf_checkpoint(name, example_len=32)
    cfg = tiny_vlm_config(dtype=jnp.bfloat16)
    m = VLM(cfg)
    ids = jnp.zeros((2, 16), jnp.int32)
    px = jnp.zeros((2, cfg.vision.image_size, cfg.vision.image_size, 3),
                   jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), ids, px)
    return ModelBundle(module=m, variables=dict(variables),
                       example_inputs=(ids, px))


def main():
    import modelopt_tpu.quant as mtq

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny",
                    help="'tiny' or a mounted llava checkpoint directory")
    ap.add_argument("--preset", default="INT8_DEFAULT_CFG")
    ap.add_argument("--calib-batches", type=int, default=8)
    args = ap.parse_args()

    from modelopt_tpu.utils.dataset import create_forward_loop, vlm_calib_batches

    bundle = build_vlm(args.model)
    cfg = bundle.module.cfg
    forward_loop = create_forward_loop(
        vlm_calib_batches(cfg, num_batches=args.calib_batches)
    )

    qb = mtq.quantize(bundle, getattr(mtq, args.preset), forward_loop)
    mtq.print_quant_summary(qb)

    ids, px = bundle.example_inputs
    ref, _ = jax.jit(bundle.make_fn())(bundle.variables, ids, px)
    got, _ = jax.jit(qb.make_fn())(qb.variables, ids, px)
    rel = float(
        jnp.linalg.norm(got.astype(jnp.float32) - ref.astype(jnp.float32))
        / jnp.linalg.norm(ref.astype(jnp.float32))
    )
    print(f"{args.preset}: VLM logits rel err {rel:.4f} "
          f"(vision tower + projector + decoder all quantized)")


if __name__ == "__main__":
    main()
