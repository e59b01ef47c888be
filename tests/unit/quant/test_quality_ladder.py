"""Pin the quantization-quality ladder orderings on a trained model.

This is the CI mirror of the committed QUALITY.json artifact (regenerated
by `python quality.py`, embedded in bench.py aux): a tiny decoder trained
on a fixed synthetic Markov language, each format calibrated for real, and
scored by held-out ppl / logits-KL vs bf16. The *orderings* are the
regression surface — the same ladder shape the reference's MMLU table
shows (reference: examples/benchmark.md:37-40 — FP8 lossless-ish, 4-bit
formats cost more, better algorithms recover).
"""

import pytest

from modelopt_tpu.utils.quality import quality_ladder

LADDER = (
    ("FP8_DEFAULT_CFG", "fp8"),
    ("INT8_SMOOTHQUANT_CFG", "int8_sq"),
    ("NVFP4_DEFAULT_CFG", "nvfp4"),
    ("MXFP4_DEFAULT_CFG", "mxfp4"),
    ("INT4_BLOCKWISE_WEIGHT_ONLY_CFG", "w4a16_rtn"),
    ("INT4_AWQ_CFG", "w4a16_awq"),
    ("GPTQ", "w4a16_gptq"),
    ("NVFP4_SVDQUANT_CFG", "nvfp4_svdquant"),
)


@pytest.fixture(scope="module")
def ladder():
    # batch 16 halves the CI fixture cost; orderings unchanged
    return quality_ladder(steps=200, seed=0, ladder=LADDER, batch=16)


class TestQualityLadder:
    def test_model_actually_trained(self, ladder):
        # Markov-chain conditional entropy => ppl ~4.4; untrained = 256
        assert ladder["bf16_ppl"] < 8.0

    def test_quantization_never_helps_materially(self, ladder):
        for label, r in ladder["rungs"].items():
            assert r["delta_ppl"] > -0.05, (label, r)
            assert r["kl_vs_bf16"] > 0.0, (label, r)

    def test_fp8_near_lossless(self, ladder):
        fp8 = ladder["rungs"]["fp8"]
        assert fp8["delta_ppl"] < 0.05
        # fp8 beats every 4-bit rung; int8_sq (per-channel scales +
        # smoothquant) may legitimately edge out per-tensor fp8
        for label, r in ladder["rungs"].items():
            if label not in ("fp8", "int8_sq"):
                assert fp8["kl_vs_bf16"] < r["kl_vs_bf16"], (label, r)

    def test_gptq_beats_rtn(self, ladder):
        assert (ladder["rungs"]["w4a16_gptq"]["kl_vs_bf16"]
                < ladder["rungs"]["w4a16_rtn"]["kl_vs_bf16"])

    def test_awq_not_worse_than_rtn(self, ladder):
        assert (ladder["rungs"]["w4a16_awq"]["kl_vs_bf16"]
                <= ladder["rungs"]["w4a16_rtn"]["kl_vs_bf16"] * 1.05)

    def test_int8_beats_4bit(self, ladder):
        # 8-bit smoothquant sits between fp8 and every 4-bit format
        int8 = ladder["rungs"]["int8_sq"]["kl_vs_bf16"]
        assert int8 < ladder["rungs"]["nvfp4"]["kl_vs_bf16"]
        assert int8 < ladder["rungs"]["w4a16_rtn"]["kl_vs_bf16"]

    def test_svdquant_recovers_nvfp4(self, ladder):
        # the low-rank 16-bit branch absorbs outliers the e2m1 grid
        # cannot represent (reference: SVDQuant positioning)
        assert (ladder["rungs"]["nvfp4_svdquant"]["kl_vs_bf16"]
                < ladder["rungs"]["nvfp4"]["kl_vs_bf16"])

    def test_nvfp4_not_worse_than_mxfp4(self, ladder):
        # two-level e4m3 block-16 scales recover more than pow2 e8m0
        # block-32 (the reference's own nvfp4-vs-mxfp4 positioning)
        assert (ladder["rungs"]["nvfp4"]["kl_vs_bf16"]
                <= ladder["rungs"]["mxfp4"]["kl_vs_bf16"] * 1.05)


def test_qat_recovers_ptq_damage():
    """Reference shape: PTQ val-loss damage largely recovered by QAT
    (benchmark.md:58-63, PTQ 3.321 -> QAT 1.294). On the tiny trained LM
    with MXFP4 (the most damaging ladder rung), STE finetuning must
    recover most of the ppl delta."""
    from modelopt_tpu.utils.quality import qat_recovery

    r = qat_recovery(steps=200, seed=0, qat_steps=60, batch=16)
    assert r["ptq_delta_ppl"] > 0.05          # PTQ caused real damage
    assert r["qat_delta_ppl"] < r["ptq_delta_ppl"] * 0.6
    # the CONTROLLED gap (vs an equally-finetuned bf16 model) must also
    # land well inside the PTQ damage — extra training alone doesn't
    # explain the recovery
    assert r["qat_delta_vs_finetuned_bf16"] < r["ptq_delta_ppl"] * 0.8
