"""Command-line entry point: ``python -m modelopt_tpu <cmd> ...``.

The reference ships its workflows as example scripts (examples/hf_ptq.py,
llm_eval/, vlm_ptq, ...); here the same workflows are first-class
subcommands over the native model zoo / mounted HF checkpoints:

    python -m modelopt_tpu ptq       --model tinyllama --preset FP8_KV_CFG
    python -m modelopt_tpu autoquant --model tiny --effective-bits 4.8
    python -m modelopt_tpu eval      --model /ckpt --eval-text corpus.txt \
                                     --tokenizer /tok
    python -m modelopt_tpu eval      --model /ckpt --mmlu-dir /mmlu ...
    python -m modelopt_tpu export    --model tiny --preset NVFP4_DEFAULT_CFG \
                                     --out dir [--shard-gb 2]
    python -m modelopt_tpu serve     --model tiny --preset FP8_KV_CFG

Every command accepts a registered config name OR a local HF checkpoint
directory for --model (streamed via models.load_hf_checkpoint).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _build_model(name: str):
    from modelopt_tpu.core import ModelBundle  # noqa: F401
    from modelopt_tpu.models import (
        Decoder,
        deepseek_v2_lite_config,
        gemma3_4b_config,
        gpt2_config,
        gpt_oss_20b_config,
        llama3_8b_config,
        load_hf_checkpoint,
        mistral_config,
        mixtral_config,
        qwen2_config,
        qwen3_config,
        qwen3_moe_config,
        tiny_gemma3_test_config,
        tiny_gptoss_test_config,
        tiny_mla_test_config,
        tiny_test_config,
        tinyllama_config,
    )

    if os.path.isdir(name):
        return load_hf_checkpoint(name, example_len=64)
    cfgs = {
        "tiny": tiny_test_config,
        "tiny-mla": tiny_mla_test_config,
        "tiny-gptoss": tiny_gptoss_test_config,
        "tiny-gemma3": tiny_gemma3_test_config,
        "gpt2": gpt2_config,
        "tinyllama": tinyllama_config,
        "llama3-8b": llama3_8b_config,
        "qwen2": qwen2_config,
        "qwen3-8b": qwen3_config,
        "qwen3-moe-30b": qwen3_moe_config,
        "mistral": mistral_config,
        "mixtral": mixtral_config,
        "deepseek-v2-lite": deepseek_v2_lite_config,
        "gpt-oss-20b": gpt_oss_20b_config,
        "gemma3-4b": gemma3_4b_config,
    }
    if name not in cfgs:
        raise SystemExit(f"--model must be a checkpoint dir or one of {sorted(cfgs)}")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from modelopt_tpu.core import ModelBundle

    cfg = cfgs[name]()
    module = Decoder(cfg)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 64)), jnp.int32
    )
    variables = module.init(jax.random.PRNGKey(0), ids)
    return ModelBundle(module=module, variables=dict(variables),
                       example_inputs=(ids,))


def _calib_batches(bundle, args):
    from modelopt_tpu.utils import synthetic_token_batches

    if getattr(args, "eval_text", None) and getattr(args, "tokenizer", None):
        from transformers import AutoTokenizer

        from modelopt_tpu.utils.dataset import text_file_token_batches

        tok = AutoTokenizer.from_pretrained(args.tokenizer, local_files_only=True)
        return text_file_token_batches(args.eval_text, tok,
                                       args.calib_batches, 2, 512)
    return synthetic_token_batches(
        bundle.module.cfg.vocab_size, args.calib_batches, 2, 64
    )


def _quantize(bundle, args):
    import modelopt_tpu.quant as mtq

    batches = _calib_batches(bundle, args)

    def forward_loop(fn):
        for b in batches:
            fn(b)

    return mtq.quantize(bundle, args.preset, forward_loop)


def cmd_ptq(args):
    import modelopt_tpu.quant as mtq
    from modelopt_tpu.utils import perplexity, synthetic_token_batches

    bundle = _build_model(args.model)
    q = _quantize(bundle, args)
    ev = _calib_batches(bundle, args)
    print(f"ppl(base)  = {perplexity(bundle, ev):.4f}")
    print(f"ppl(quant) = {perplexity(q, ev):.4f}")
    from modelopt_tpu.quant.api import print_quant_summary

    print(print_quant_summary(q))
    if args.compress:
        q = mtq.compress(q)
        print("compressed to packed storage")
    if args.out:
        from modelopt_tpu.export import export_hf_checkpoint

        shard = int(args.shard_gb * 1e9) if args.shard_gb else None
        export_hf_checkpoint(q, args.out, max_shard_bytes=shard)
        print(f"exported to {args.out}")
    return 0


def cmd_eval(args):
    from modelopt_tpu.utils import perplexity

    bundle = _build_model(args.model)
    if args.preset:
        bundle = _quantize(bundle, args)
    out = {}
    batches = _calib_batches(bundle, args)
    out["perplexity"] = round(perplexity(bundle, batches), 4)
    if args.mmlu_dir:
        from transformers import AutoTokenizer

        from modelopt_tpu.utils.harness import mmlu_accuracy

        tok = AutoTokenizer.from_pretrained(args.tokenizer, local_files_only=True)
        enc = lambda s: tok(s)["input_ids"]  # noqa: E731
        out.update(mmlu_accuracy(bundle, args.mmlu_dir, enc))
    print(json.dumps(out))
    return 0


def cmd_autoquant(args):
    import modelopt_tpu.quant as mtq
    from modelopt_tpu.quant.algorithms.autoquant import auto_quantize

    bundle = _build_model(args.model)
    batches = _calib_batches(bundle, args)

    def forward_loop(fn):
        for b in batches:
            fn(b)

    kwargs = {}
    if args.formats:
        kwargs["quantization_formats"] = tuple(
            f if f != "none" else None for f in args.formats.split(",")
        )
    q, plan = auto_quantize(
        bundle,
        constraints={"effective_bits": args.effective_bits},
        forward_loop=forward_loop,
        method=args.method,
        **kwargs,
    )
    if isinstance(plan, dict):
        print(json.dumps(
            {k: str(v) for k, v in plan.items() if not str(k).startswith("_")},
            indent=1, default=str,
        ))
    return 0


def cmd_export(args):
    from modelopt_tpu.export import export_hf_checkpoint

    bundle = _build_model(args.model)
    if args.preset:
        bundle = _quantize(bundle, args)
    shard = int(args.shard_gb * 1e9) if args.shard_gb else None
    export_hf_checkpoint(bundle, args.out, max_shard_bytes=shard)
    print(f"exported to {args.out}")
    return 0


def cmd_serve(args):
    import numpy as np

    from modelopt_tpu.serve import ServingEngine

    bundle = _build_model(args.model)
    if args.preset:
        bundle = _quantize(bundle, args)
    eng = ServingEngine(bundle, max_batch=args.max_batch,
                        max_seq_len=args.max_seq_len,
                        multi_step=args.multi_step)
    rng = np.random.default_rng(0)
    V = bundle.module.cfg.vocab_size
    reqs = [eng.submit(list(rng.integers(0, V, 8)), max_new_tokens=16,
                       temperature=args.temperature, top_k=args.top_k,
                       top_p=args.top_p)
            for _ in range(args.requests)]
    eng.run()
    n_tok = sum(len(r.out_tokens) for r in reqs)
    print(f"served {len(reqs)} requests, {n_tok} tokens")
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(prog="modelopt_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p):
        p.add_argument("--model", required=True,
                       help="registered config name or HF checkpoint dir")
        p.add_argument("--preset", default=None)
        p.add_argument("--calib-batches", type=int, default=8)
        p.add_argument("--eval-text", default=None)
        p.add_argument("--tokenizer", default=None)

    p = sub.add_parser("ptq", help="quantize + report perplexity")
    common(p)
    p.add_argument("--compress", action="store_true")
    p.add_argument("--out", default=None)
    p.add_argument("--shard-gb", type=float, default=None)
    p.set_defaults(fn=cmd_ptq)

    p = sub.add_parser("eval", help="perplexity / MMLU harness")
    common(p)
    p.add_argument("--mmlu-dir", default=None)
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("autoquant", help="mixed-precision format search")
    common(p)
    p.add_argument("--effective-bits", type=float, default=4.8)
    p.add_argument("--formats", default=None)
    p.add_argument("--method", default="gradient")
    p.set_defaults(fn=cmd_autoquant)

    p = sub.add_parser("export", help="write an HF quantized checkpoint")
    common(p)
    p.add_argument("--out", required=True)
    p.add_argument("--shard-gb", type=float, default=None)
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser("serve", help="run the native serving engine")
    common(p)
    p.add_argument("--max-batch", type=int, default=4)
    p.add_argument("--max-seq-len", type=int, default=256)
    p.add_argument("--requests", type=int, default=4)
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--top-k", type=int, default=0)
    p.add_argument("--top-p", type=float, default=1.0)
    p.add_argument("--multi-step", type=int, default=1,
                   help="decode ticks per host dispatch (burst decode)")
    p.set_defaults(fn=cmd_serve)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
