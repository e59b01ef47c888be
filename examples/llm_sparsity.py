"""2:4 weight sparsity + fine-tune recovery (reference: examples/llm_sparsity).

    python examples/llm_sparsity.py --mode sparsegpt --finetune-steps 50
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # repo-checkout import path

import argparse

from examples.llm_ptq import build_model


def main():
    import modelopt_tpu.sparsity as mts
    from modelopt_tpu.quant.qat import qat_finetune
    from modelopt_tpu.utils import perplexity, synthetic_token_batches

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny")
    ap.add_argument("--mode", default="sparse_magnitude",
                    choices=["sparse_magnitude", "sparsegpt"])
    ap.add_argument("--finetune-steps", type=int, default=50)
    args = ap.parse_args()

    bundle = build_model(args.model)
    cfg = bundle.module.cfg
    batches = synthetic_token_batches(cfg.vocab_size, 8, 4, 48)
    evalb = synthetic_token_batches(cfg.vocab_size, 4, 4, 48, seed=9)

    config = {}
    if args.mode == "sparsegpt":
        config["forward_loop"] = lambda f: [f(b) for b in batches]
    s = mts.sparsify(bundle, args.mode, config)
    p0, p1 = perplexity(bundle, evalb), perplexity(s, evalb)
    print(f"{args.mode}: ppl {p0:.2f} -> {p1:.2f} at 50% weight sparsity")

    if args.finetune_steps:
        tuned, losses = qat_finetune(
            s, synthetic_token_batches(cfg.vocab_size, args.finetune_steps, 4, 48, 3),
            learning_rate=5e-4,
        )
        p2 = perplexity(tuned, evalb)
        print(f"after {args.finetune_steps} sparse-finetune steps: ppl {p2:.2f}")
        exported = mts.export_sparse(tuned)
        print(f"exported: masks folded, records = {[r.mode for r in exported.records]}")


if __name__ == "__main__":
    main()
