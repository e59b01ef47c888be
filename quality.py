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

    jax.config.update("jax_platforms", "cpu")

    from modelopt_tpu.utils.quality import qat_recovery, quality_ladder

    t0 = time.time()
    result = quality_ladder(steps=400, seed=0, log=True)
    recovery = qat_recovery(steps=400, seed=0, log=True)
    fp8 = result["rungs"]["fp8"]
    out = {
        "metric": "quality_delta_ppl_fp8_tiny_lm",
        "value": fp8["delta_ppl"],
        "unit": "delta_ppl",
        "vs_baseline": None,
        "summary": {
            "bf16_ppl": result["bf16_ppl"],
            **{k: v["delta_ppl"] for k, v in result["rungs"].items()},
        },
        "rungs": result["rungs"],
        # the reference's QAT-recovery table shape (benchmark.md:58-63)
        "qat_recovery": recovery,
        "method": "tiny 4L/128d decoder trained 400 steps on a fixed "
                  "synthetic Markov language; held-out ppl delta + mean "
                  "logits-KL vs bf16; real calibration per algorithm",
        "wall_s": round(time.time() - t0, 1),
    }
    path = os.path.join(os.path.dirname(__file__) or ".", "QUALITY.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
