"""Puzzletron heterogeneous NAS, end to end (reference: puzzletron pipeline —
replacement library -> MIP -> sewing -> bypassed-training recovery).

    python examples/puzzletron.py --params-ratio 0.7 --recover-steps 100
    python examples/puzzletron.py --donor tinyllama-small   # anymodel graft
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # repo-checkout import path

import argparse

import jax.numpy as jnp
import numpy as np
import optax

from examples.llm_ptq import build_model


def main():
    import modelopt_tpu.nas as mtn
    from modelopt_tpu.utils import perplexity, synthetic_token_batches

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny")
    ap.add_argument("--params-ratio", type=float, default=0.7)
    ap.add_argument("--recover-steps", type=int, default=100)
    args = ap.parse_args()

    bundle = build_model(args.model)
    cfg = bundle.module.cfg
    batches = synthetic_token_batches(cfg.vocab_size, 8, 4, 48)

    sewed, info = mtn.puzzle_search(
        bundle, {"params_ratio": args.params_ratio}
    )
    print("plan per layer:", info["plan"])
    print(f"params {info['params_before']} -> {info['params_after']} "
          f"(KL to parent {info['model_kl']:.4f})")

    base_ppl = perplexity(bundle, batches)
    sewed_ppl = perplexity(sewed, batches)

    # bypassed training: recover only the touched layers by distilling the
    # parent's logits
    init_state, step, finalize = mtn.make_recovery_step(
        bundle, sewed, optax.adam(3e-3)
    )
    state = init_state()
    loss = None
    for i in range(args.recover_steps):
        b = jnp.asarray(
            np.random.default_rng(i).integers(0, cfg.vocab_size, (4, 48)),
            jnp.int32,
        )
        state, loss = step(state, b)
    recovered = finalize(state)
    rec_ppl = perplexity(recovered, batches)
    print(f"perplexity: parent {base_ppl:.2f} | sewed {sewed_ppl:.2f} | "
          f"recovered {rec_ppl:.2f} (final KD loss {float(loss):.4f})")


if __name__ == "__main__":
    main()
