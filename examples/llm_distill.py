"""Teacher -> student knowledge distillation
(reference: examples/llm_distill/main.py).

Build a teacher, derive a smaller student, attach the kd_loss mode
(logits-KL at temperature T, optionally intermediate-feature MGD pairs),
train the student against the combined task-CE + KD objective, then
export_student to drop the distillation records.

    python examples/llm_distill.py --steps 30 --feature-pairs
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # repo-checkout import path

import argparse
import dataclasses

import jax
import jax.numpy as jnp
import optax

from examples.llm_ptq import build_model


def main():
    import modelopt_tpu.distill as mtd
    from modelopt_tpu.core import ModelBundle
    from modelopt_tpu.models import Decoder
    from modelopt_tpu.utils import synthetic_token_batches

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny", help="teacher config name")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--temperature", type=float, default=2.0)
    ap.add_argument("--kd-weight", type=float, default=0.5)
    ap.add_argument("--feature-pairs", action="store_true",
                    help="add intermediate-layer MGD losses")
    args = ap.parse_args()

    teacher = build_model(args.model)
    tcfg = teacher.module.cfg

    # student: half the depth, same width (a minitron-style slice would
    # also work — see pruning_minitron.py for importance-based init)
    scfg = dataclasses.replace(tcfg, num_layers=max(1, tcfg.num_layers // 2))
    smodule = Decoder(scfg)
    ids = jnp.zeros((2, 64), jnp.int32)
    svars = jax.jit(smodule.init)(jax.random.PRNGKey(1), ids)
    student = ModelBundle(module=smodule, variables=dict(svars), example_inputs=(ids,))

    pairs = ()
    if args.feature_pairs:
        # map student layer i -> teacher layer 2i (uniform skip mapping)
        pairs = tuple(
            (f"layers_{i}", f"layers_{2 * i}") for i in range(scfg.num_layers)
        )
    kd_cfg = mtd.DistillConfig(
        teacher=teacher,
        temperature=args.temperature,
        kd_weight=args.kd_weight,
        layer_pairs=pairs,
    )
    student = mtd.convert(student, kd_cfg)
    loss_fn = mtd.make_kd_loss_fn(student, kd_cfg)

    tx = optax.adamw(args.lr)
    params = student.variables["params"]
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, batch):
        l, g = jax.value_and_grad(loss_fn)(params, batch)
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), opt, l

    losses = []
    for batch in synthetic_token_batches(tcfg.vocab_size, args.steps, 4, 64):
        params, opt, l = step(params, opt, batch)
        losses.append(float(l))
    print(f"KD loss: {losses[0]:.4f} -> {losses[-1]:.4f} over {len(losses)} steps")

    student = student.replace(
        variables={**student.variables, "params": params}
    )
    final = mtd.export_student(student)
    assert all(r.mode != "kd_loss" for r in final.records)
    print(f"student exported: {scfg.num_layers} layers "
          f"(teacher {tcfg.num_layers}), records={[r.mode for r in final.records]}")


if __name__ == "__main__":
    main()
