"""Regenerate QUALITY.json — the quantization-quality ladder artifact.

Runs on CPU in ~2-3 minutes: trains a tiny decoder on a fixed synthetic
Markov language, quantizes it with each headline format+algorithm (real
calibration), and records held-out perplexity delta + logits-KL vs bf16.
See modelopt_tpu/utils/quality.py for methodology; orderings are pinned by
tests/unit/quant/test_quality_ladder.py. bench.py embeds the committed
QUALITY.json in its aux output so the driver records it every round.

Reference analogue: the MMLU-delta accuracy table at
/root/reference/examples/benchmark.md:37-40 (no real weights/tokenizer can
be mounted here — zero egress — so the evidence is synthetic-but-trained,
regenerable, and regression-pinned).
"""

import json
import os
import time


def main():
    import jax

    # QUALITY_BIG=1: larger trained LM (8L/384d/4k-vocab, ~17M params) on
    # the default device (the attached TPU when present) — the profile the
    # committed artifact uses. Default: the small CPU profile the CI
    # ladder-pins mirror (tests/unit/quant/test_quality_ladder.py) matches.
    big = os.environ.get("QUALITY_BIG", "0") == "1"
    if not big:
        jax.config.update("jax_platforms", "cpu")

    from modelopt_tpu.utils.quality import qat_recovery, quality_ladder

    model_kw = dict(vocab=4096, hidden=384, layers=8) if big else {}
    steps = 600 if big else 400
    t0 = time.time()
    result = quality_ladder(steps=steps, seed=0, log=True, **model_kw)
    # QAT-recovery rungs for BOTH aggressive 4-bit formats (reference QAT
    # table shape, benchmark.md:58-63) — recovered mxfp4 must land under
    # the plain int4-RTN delta (pinned by test_quality_ladder)
    recovery = qat_recovery(steps=steps, seed=0, preset="MXFP4_DEFAULT_CFG",
                            log=True, **model_kw)
    recovery_nvfp4 = qat_recovery(steps=steps, seed=0,
                                  preset="NVFP4_DEFAULT_CFG", log=True,
                                  **model_kw)
    fp8 = result["rungs"]["fp8"]
    out = {
        "metric": "quality_delta_ppl_fp8_tiny_lm",
        "value": fp8["delta_ppl"],
        "unit": "delta_ppl",
        "vs_baseline": None,
        "summary": {
            "bf16_ppl": result["bf16_ppl"],
            **{k: v["delta_ppl"] for k, v in result["rungs"].items()},
            # controlled: quantized-QAT vs an EQUALLY-finetuned bf16
            # model (extra training improves an undertrained base by
            # itself; the frozen-baseline delta would read negative)
            "mxfp4_qat_recovered": recovery["qat_delta_vs_finetuned_bf16"],
            "nvfp4_qat_recovered": recovery_nvfp4["qat_delta_vs_finetuned_bf16"],
        },
        "rungs": result["rungs"],
        # the reference's QAT-recovery table shape (benchmark.md:58-63)
        "qat_recovery": recovery,
        "qat_recovery_nvfp4": recovery_nvfp4,
        "profile": ("8L/384d/4k-vocab, 600 steps, default device" if big
                    else "4L/128d/256-vocab, 400 steps, CPU"),
        "method": "decoder trained on a fixed synthetic Markov language; "
                  "held-out ppl delta + mean logits-KL vs bf16; real "
                  "calibration per algorithm",
        "wall_s": round(time.time() - t0, 1),
    }
    path = os.path.join(os.path.dirname(__file__) or ".", "QUALITY.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
