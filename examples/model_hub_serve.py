"""Deploy a PRE-QUANTIZED checkpoint directory straight into the serving
engine (reference: examples/model_hub — deploying pre-quantized HF-hub
checkpoints on TRT-LLM/vLLM/SGLang; here the engine is built in).

Two modes:
  * --checkpoint <dir>: load an existing quantized checkpoint (config.json
    + hf_quant_config.json + safetensors) and serve it. Packed weights are
    repacked BIT-EXACTLY into the Pallas-friendly layout — no dequantize ->
    requantize round trip.
  * default: no network access here, so the script first manufactures a
    "hub" checkpoint (quantize a random-init model + export_hf_checkpoint)
    and then loads it back cold, exactly as a hub download would be.

    python examples/model_hub_serve.py --preset W4A8_INT8_DYNAMIC_CFG
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # repo-checkout import path

import argparse
import tempfile
import time

import jax.numpy as jnp
import numpy as np

from examples.llm_ptq import build_model


def main():
    import modelopt_tpu.quant as mtq
    from modelopt_tpu.export import export_hf_checkpoint
    from modelopt_tpu.models import load_quantized_checkpoint
    from modelopt_tpu.serve import ServingEngine

    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None,
                    help="pre-quantized checkpoint dir; default: export one")
    ap.add_argument("--model", default="tiny")
    ap.add_argument("--preset", default="W4A8_INT8_DYNAMIC_CFG")
    ap.add_argument("--requests", type=int, default=6)
    ap.add_argument("--max-new", type=int, default=24)
    args = ap.parse_args()

    ckpt = args.checkpoint
    if ckpt is None:
        # manufacture the "hub" checkpoint: quantize + export
        bundle = build_model(args.model)
        cfg = bundle.module.cfg
        calib = jnp.asarray(
            np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 64)),
            jnp.int32)
        q = mtq.quantize(bundle, args.preset, lambda f: f(calib))
        ckpt = tempfile.mkdtemp(prefix="hub_ckpt_")
        export_hf_checkpoint(q, ckpt)
        print(f"exported quantized checkpoint -> {ckpt}")

    t0 = time.time()
    loaded = load_quantized_checkpoint(ckpt)
    n_packed = len(loaded.records[-1].metadata.get("compressed", []))
    print(f"loaded {ckpt} in {time.time() - t0:.1f}s: "
          f"{n_packed} weights repacked bit-exact, "
          f"algo={loaded.metadata['hf_quant_config']['quantization']['quant_algo']}")

    eng = ServingEngine(loaded, max_batch=4, max_seq_len=256,
                        prefill_buckets=(32, 64))
    rng = np.random.default_rng(1)
    vocab = loaded.module.cfg.vocab_size
    reqs = [
        eng.submit(rng.integers(0, vocab, int(rng.integers(4, 24))).tolist(),
                   max_new_tokens=args.max_new, temperature=0.8, top_p=0.95)
        for _ in range(args.requests)
    ]
    t0 = time.time()
    eng.run()
    dt = time.time() - t0
    done = sum(r.done for r in reqs)
    toks = sum(len(r.out_tokens) for r in reqs)
    print(f"served {done}/{len(reqs)} requests, {toks} tokens "
          f"in {dt:.1f}s ({toks / dt:.0f} tok/s)")
    for r in reqs[:2]:
        print("  sample:", r.out_tokens[:8])


if __name__ == "__main__":
    main()
