"""Mixed-precision AutoQuantize search (reference: hf_ptq --auto_quantize).

    python examples/llm_autoquant.py --effective-bits 6.0
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # repo-checkout import path

import argparse

from examples.llm_ptq import build_model


def main():
    import modelopt_tpu.quant as mtq
    from modelopt_tpu.utils import perplexity, synthetic_token_batches

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny")
    ap.add_argument("--effective-bits", type=float, default=6.0)
    ap.add_argument("--formats", nargs="+", default=[
        "INT4_BLOCKWISE_WEIGHT_ONLY_CFG", "INT8_WEIGHT_ONLY_CFG", "none",
    ])
    args = ap.parse_args()

    bundle = build_model(args.model)
    cfg = bundle.module.cfg
    batches = synthetic_token_batches(cfg.vocab_size, 8, 4, 48)
    evalb = synthetic_token_batches(cfg.vocab_size, 4, 4, 48, seed=9)
    formats = [None if f == "none" else f for f in args.formats]

    q, state = mtq.auto_quantize(
        bundle,
        constraints={"effective_bits": args.effective_bits},
        quantization_formats=formats,
        forward_loop=lambda f: [f(b) for b in batches],
    )
    print(f"achieved effective bits: {state['achieved_bits']:.2f} "
          f"(budget {args.effective_bits})")
    for group, choice in zip(state["groups"], state["choice"]):
        print(f"  {group[0]}{'...' if len(group) > 1 else ''}: "
              f"{state['formats'][choice] or 'bf16'}")
    p0, p1 = perplexity(bundle, evalb), perplexity(q, evalb)
    print(f"ppl {p0:.2f} -> {p1:.2f}")


if __name__ == "__main__":
    main()
