"""Minitron-style prune -> distill recovery (reference: examples/pruning
minitron/ + llm_distill).

    python examples/pruning_minitron.py --ffn 96 --layers 1 --distill-steps 50
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
    import modelopt_tpu.distill as mtd
    import modelopt_tpu.prune as mtp
    from modelopt_tpu.utils import perplexity, synthetic_token_batches

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny")
    ap.add_argument("--ffn", type=int, default=None)
    ap.add_argument("--kv-heads", type=int, default=None)
    ap.add_argument("--layers", type=int, default=None)
    ap.add_argument("--distill-steps", type=int, default=50)
    args = ap.parse_args()

    bundle = build_model(args.model)
    cfg = bundle.module.cfg
    batches = synthetic_token_batches(cfg.vocab_size, 8, 4, 48)
    evalb = synthetic_token_batches(cfg.vocab_size, 4, 4, 48, seed=9)

    constraints = {}
    if args.ffn:
        constraints["intermediate_size"] = args.ffn
    if args.kv_heads:
        constraints["num_kv_heads"] = args.kv_heads
    if args.layers:
        constraints["num_layers"] = args.layers
    constraints = constraints or {"intermediate_size": cfg.intermediate_size // 2}

    pruned = mtp.prune(bundle, constraints=constraints,
                       forward_loop=lambda f: [f(b) for b in batches])
    p0, p1 = perplexity(bundle, evalb), perplexity(pruned, evalb)
    print(f"pruned {constraints}: ppl {p0:.2f} -> {p1:.2f}")

    # distill to recover
    dcfg = mtd.DistillConfig(teacher=bundle, temperature=2.0, kd_weight=0.8)
    student = mtd.convert(pruned, dcfg)
    loss_fn = mtd.make_kd_loss_fn(student, dcfg)
    tx = optax.adamw(1e-3)
    params = student.variables["params"]
    opt = tx.init(params)
    step = jax.jit(lambda p, o, b: _step(loss_fn, tx, p, o, b))
    for b in synthetic_token_batches(cfg.vocab_size, args.distill_steps, 4, 48, seed=3):
        params, opt, loss = step(params, opt, b)
    student = student.replace(variables={**student.variables, "params": params})
    p2 = perplexity(mtd.export_student(student), evalb)
    print(f"after {args.distill_steps} KD steps: ppl {p2:.2f}")


def _step(loss_fn, tx, params, opt, batch):
    loss, g = jax.value_and_grad(loss_fn)(params, batch)
    upd, opt = tx.update(g, opt, params)
    return optax.apply_updates(params, upd), opt, loss


if __name__ == "__main__":
    main()
