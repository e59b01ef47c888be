"""LLM post-training quantization, end to end.

TPU-native counterpart of the reference's hf_ptq.py (examples/llm_ptq/):
build/import a model -> quantize with a recipe or preset -> evaluate
perplexity delta -> (optionally) compress to packed weights and export an
HF-schema quantized checkpoint.

Examples:
    python examples/llm_ptq.py --preset INT4_AWQ_CFG --model tinyllama
    python examples/llm_ptq.py --recipe llama_fp8 --export-dir /tmp/out
    python examples/llm_ptq.py --preset NVFP4_DEFAULT_CFG --compress
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # repo-checkout import path

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_model(name: str, seed: int = 0):
    """``name`` is a registered config name OR a path to a mounted Hugging
    Face checkpoint directory (config.json + safetensors shards), streamed
    via models.load_hf_checkpoint (reference: hf_ptq.py --pyt_ckpt_path)."""
    import os

    from modelopt_tpu.core import ModelBundle
    from modelopt_tpu.models import (
        Decoder, deepseek_v2_lite_config, gpt2_config, gpt_oss_20b_config,
        gemma3_4b_config, llama3_8b_config, load_hf_checkpoint, qwen3_config,
        qwen3_moe_config, tiny_gptoss_test_config, tiny_mla_test_config,
        tiny_test_config, tinyllama_config,
    )

    if os.path.isdir(name):
        return load_hf_checkpoint(name, example_len=64)
    cfgs = {
        "tiny": lambda: tiny_test_config(),
        "tiny-mla": lambda: tiny_mla_test_config(),
        "gpt2": gpt2_config,
        "tinyllama": lambda: tinyllama_config(num_layers=4),  # trimmed for demo
        "llama3-8b": llama3_8b_config,
        "deepseek-v2-lite": deepseek_v2_lite_config,
        "tiny-gptoss": lambda: tiny_gptoss_test_config(),
        "gpt-oss-20b": gpt_oss_20b_config,
        "qwen3-8b": qwen3_config,
        "gemma3-4b": gemma3_4b_config,
        "qwen3-moe-30b": qwen3_moe_config,
    }
    cfg = cfgs[name]()
    module = Decoder(cfg)
    ids = jnp.zeros((2, 64), jnp.int32)
    variables = jax.jit(module.init)(jax.random.PRNGKey(seed), ids)
    return ModelBundle(module=module, variables=dict(variables), example_inputs=(ids,))


def main():
    import modelopt_tpu.quant as mtq
    from modelopt_tpu.recipe import load_recipe, run_recipe
    from modelopt_tpu.utils import perplexity, synthetic_token_batches

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny",
                    help="tiny | gpt2 | tinyllama | llama3-8b | /path/to/hf_checkpoint_dir")
    ap.add_argument("--preset", default=None, help="e.g. INT4_AWQ_CFG / FP8_KV_CFG")
    ap.add_argument("--recipe", default=None, help="e.g. llama_fp8 / llama_int4_awq")
    ap.add_argument("--override", action="append", default=[], help="dotlist a.b=c")
    ap.add_argument("--calib-batches", type=int, default=8)
    ap.add_argument("--calib-batch-size", type=int, default=2,
                    help="0 = auto-tune to the largest size that fits "
                         "device memory (utils.dataset.get_max_batch_size)")
    ap.add_argument("--compress", action="store_true")
    ap.add_argument("--export-dir", default=None)
    ap.add_argument("--eval-text", default=None,
                    help="local text file for real-data perplexity (needs --tokenizer)")
    ap.add_argument("--tokenizer", default=None,
                    help="local tokenizer dir for --eval-text")
    args = ap.parse_args()

    from modelopt_tpu.utils.dataset import create_forward_loop, get_max_batch_size

    bundle = build_model(args.model)
    cfg = bundle.module.cfg
    bs = args.calib_batch_size
    if bs == 0:
        bs = get_max_batch_size(bundle, max_sample_length=64, cap=64)
        print(f"auto-tuned calibration batch size: {bs}")
    if args.eval_text:
        from transformers import AutoTokenizer

        from modelopt_tpu.utils.dataset import text_file_token_batches

        tok = AutoTokenizer.from_pretrained(
            args.tokenizer or args.model, local_files_only=True
        )
        eval_batches = text_file_token_batches(args.eval_text, tok, 4, 2, 512)
        batches = text_file_token_batches(args.eval_text, tok,
                                          args.calib_batches, bs, 512)
    else:
        batches = synthetic_token_batches(cfg.vocab_size, args.calib_batches, bs, 64)
        eval_batches = synthetic_token_batches(cfg.vocab_size, 4, 2, 64, seed=99)

    forward_loop = create_forward_loop(batches)

    ppl_base = perplexity(bundle, eval_batches)
    t0 = time.time()
    if args.recipe:
        recipe = load_recipe(args.recipe, args.override + (
            [f"export_dir={args.export_dir}"] if args.export_dir else []
        ))
        q = run_recipe(bundle, recipe, forward_loop)
    else:
        preset = args.preset or "FP8_DEFAULT_CFG"
        q = mtq.quantize(bundle, preset, forward_loop)
        if args.compress:
            q = mtq.compress(q)
        if args.export_dir:
            from modelopt_tpu.export import export_hf_checkpoint

            export_hf_checkpoint(q, args.export_dir)
    calib_s = time.time() - t0
    ppl_q = perplexity(q, eval_batches)

    mtq.print_quant_summary(q)
    print(f"\ncalibration wall-clock: {calib_s:.1f}s")
    print(f"perplexity: base {ppl_base:.3f} -> quantized {ppl_q:.3f} "
          f"(delta {100*(ppl_q/ppl_base-1):+.2f}%)")


if __name__ == "__main__":
    main()
