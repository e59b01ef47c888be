"""Quality evaluation harness (reference: examples/llm_eval/).

Evaluate a (quantized) model's perplexity and MMLU-style multiple-choice
accuracy, and report the quantization delta against the bf16 baseline.
With no mounted data this runs on synthetic token batches (delta is still
meaningful — same data both sides); pass --eval-text/--mmlu-dir +
--tokenizer for real corpora.

    python examples/llm_eval.py --preset FP8_DEFAULT_CFG
    python examples/llm_eval.py --preset INT4_AWQ_CFG \
        --eval-text corpus.txt --tokenizer /path/to/tok --mmlu-dir /mmlu
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # repo-checkout import path

import argparse

from examples.llm_ptq import build_model


def _encode_stub(vocab):
    """Deterministic hash tokenizer for data-free demo runs."""
    def encode(s):
        return [hash(w) % vocab for w in s.split()][:128]
    return encode


def main():
    import modelopt_tpu.quant as mtq
    from modelopt_tpu.utils import perplexity, synthetic_token_batches

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny")
    ap.add_argument("--preset", default="FP8_DEFAULT_CFG")
    ap.add_argument("--eval-batches", type=int, default=8)
    ap.add_argument("--eval-text", default=None)
    ap.add_argument("--tokenizer", default=None, help="local HF tokenizer dir")
    ap.add_argument("--mmlu-dir", default=None, help="dir of MMLU-format csvs")
    ap.add_argument("--mmlu-max-rows", type=int, default=8)
    args = ap.parse_args()

    bundle = build_model(args.model)
    cfg = bundle.module.cfg

    if args.eval_text and args.tokenizer:
        from modelopt_tpu.utils.dataset import text_file_token_batches

        def tok(s):
            from transformers import AutoTokenizer
            t = AutoTokenizer.from_pretrained(args.tokenizer)
            return t(s)["input_ids"]

        batches = text_file_token_batches(
            args.eval_text, tok, num_batches=args.eval_batches,
            batch_size=4, seq_len=256,
        )
    else:
        batches = synthetic_token_batches(cfg.vocab_size, args.eval_batches, 4, 128)

    ppl_bf16 = perplexity(bundle, batches)
    q = mtq.quantize(bundle, args.preset, lambda f: [f(b) for b in batches[:4]])
    ppl_q = perplexity(q, batches)
    print(f"perplexity bf16={ppl_bf16:.3f}  {args.preset}={ppl_q:.3f}  "
          f"delta={(ppl_q / ppl_bf16 - 1) * 100:+.2f}%")

    if args.mmlu_dir:
        from modelopt_tpu.utils.harness import mmlu_accuracy

        enc = _encode_stub(cfg.vocab_size)
        if args.tokenizer:
            from transformers import AutoTokenizer
            t = AutoTokenizer.from_pretrained(args.tokenizer)
            enc = lambda s: t(s)["input_ids"]  # noqa: E731
        acc_b = mmlu_accuracy(bundle, args.mmlu_dir, enc,
                              max_rows_per_file=args.mmlu_max_rows)
        acc_q = mmlu_accuracy(q, args.mmlu_dir, enc,
                              max_rows_per_file=args.mmlu_max_rows)
        print(f"MMLU bf16={acc_b['accuracy']:.3f}  quantized={acc_q['accuracy']:.3f} "
              f"({acc_b['num_questions']} questions)")


if __name__ == "__main__":
    main()
