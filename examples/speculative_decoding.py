"""EAGLE/Medusa/DFlash draft training + speculative decoding benchmark
(reference: examples/speculative_decoding + specdec_bench).

    python examples/speculative_decoding.py --mode eagle --train-steps 100
    python examples/speculative_decoding.py --compare   # engine AL/AR table
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # repo-checkout import path

import argparse

import optax

from examples.llm_ptq import build_model


def compare(bundle, draft_len, max_new):
    """Engine-comparative harness: same prompts through the ServingEngine
    once per draft architecture (reference: specdec_bench/run.py)."""
    import modelopt_tpu.speculative as mtsp

    cfg = bundle.module.cfg
    bundles = {
        "base": bundle,
        "medusa": mtsp.convert(bundle, [("medusa", {})]),
        "eagle": mtsp.convert(bundle, [("eagle", {})]),
        "dflash": mtsp.convert(bundle, [("dflash", {})]),
    }
    prompts = mtsp.random_token_prompts(8, cfg.vocab_size, 8, 48)
    results = mtsp.bench_engine_modes(
        bundles, prompts, max_new_tokens=max_new, spec_k=draft_len,
        max_batch=8, max_seq_len=256, prefill_buckets=(64,),
    )
    print(mtsp.format_report(results))
    print("(untrained drafts: expect acceptance near chance; the table "
          "pins plumbing + lossless-ness, training lifts AL)")


def main():
    import modelopt_tpu.speculative as mtsp
    from modelopt_tpu.utils import synthetic_token_batches

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny")
    ap.add_argument("--mode", default="eagle",
                    choices=["eagle", "medusa", "dflash"])
    ap.add_argument("--train-steps", type=int, default=100)
    ap.add_argument("--draft-len", type=int, default=4)
    ap.add_argument("--max-new", type=int, default=48)
    ap.add_argument("--compare", action="store_true",
                    help="run the engine-comparative specdec bench and exit")
    args = ap.parse_args()

    bundle = build_model(args.model)
    cfg = bundle.module.cfg
    if args.compare:
        compare(bundle, args.draft_len, args.max_new)
        return
    spec = mtsp.convert(bundle, [(args.mode, {})])

    make_step = {
        "eagle": mtsp.make_eagle_train_step,
        "medusa": mtsp.make_medusa_train_step,
        "dflash": mtsp.make_dflash_train_step,
    }[args.mode]
    init_state, step = make_step(spec, optax.adamw(3e-3))
    state = init_state()
    batches = synthetic_token_batches(cfg.vocab_size, args.train_steps, 4, 48)
    for b in batches:
        state, loss = step(state, b)
    print(f"draft training final loss: {float(loss):.4f}")

    # graft trained draft params back (every trainer's state[0] is the
    # flat non-frozen param subtree: {"eagle": ..., "fuse": ...} for
    # eagle, head_* for medusa, draft params for dflash)
    params = dict(spec.variables["params"])
    params.update(state[0])
    spec = spec.replace(variables={**spec.variables, "params": params})

    prompt = [1, 2, 3, 4, 5]
    out, stats = mtsp.speculative_decode(
        spec, prompt, max_new_tokens=args.max_new, draft_len=args.draft_len
    )
    print(f"generated {len(out)} tokens with {stats['base_forwards']} base forwards")
    print(f"acceptance rate {stats['acceptance_rate']:.2%}, "
          f"{stats['tokens_per_forward']:.2f} tokens/forward "
          f"(1.0 = no speculation benefit)")


if __name__ == "__main__":
    main()
