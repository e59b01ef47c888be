"""Quantization-aware training (reference: examples/llm_qat/simple_qat_train.py).

PTQ the model, then finetune with straight-through estimators (optionally
LSQ learned ranges or QAD distillation from the bf16 teacher) and report the
loss recovery.

    python examples/llm_qat.py --preset NVFP4_DEFAULT_CFG --steps 50 --qad
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # repo-checkout import path

import argparse

import jax
import jax.numpy as jnp
import optax

from examples.llm_ptq import build_model


def main():
    import modelopt_tpu.quant as mtq
    from modelopt_tpu.quant.qat import make_qad_loss, make_qat_step, qat_finetune
    from modelopt_tpu.utils import lm_cross_entropy, synthetic_token_batches

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny")
    ap.add_argument("--preset", default="NVFP4_DEFAULT_CFG")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--lsq", action="store_true", help="learn amax (LSQ)")
    ap.add_argument("--qad", action="store_true", help="distill from bf16 teacher")
    args = ap.parse_args()

    bundle = build_model(args.model)
    cfg = bundle.module.cfg
    batches = synthetic_token_batches(cfg.vocab_size, args.steps, 4, 64)
    q = mtq.quantize(bundle, args.preset, lambda f: f(batches[0]))

    if args.qad:
        loss = make_qad_loss(q, bundle)
        tx = optax.adamw(args.lr)
        params, quant = q.variables["params"], q.variables.get("quant", {})
        opt = tx.init(params)

        @jax.jit
        def step(params, opt, batch):
            l, g = jax.value_and_grad(loss)(params, quant, batch)
            upd, opt = tx.update(g, opt, params)
            return optax.apply_updates(params, upd), opt, l

        losses = []
        for b in batches:
            params, opt, l = step(params, opt, b)
            losses.append(float(l))
    else:
        _, losses = qat_finetune(q, batches, args.lr, learn_amax=args.lsq)

    print(f"QAT loss: {losses[0]:.4f} -> {losses[-1]:.4f} over {len(losses)} steps")


if __name__ == "__main__":
    main()
