"""AutoQuantize mixed-precision search tests
(reference analogue: tests/unit/torch/quantization/test_autoquant.py)."""

import jax.numpy as jnp
import numpy as np

import modelopt_tpu.quant as mtq
from modelopt_tpu.quant.algorithms.autoquant import effective_bits
from modelopt_tpu.quant.qspec import BlockSpec, QuantizerSpec

from tests._test_utils.models import simple_mlp_bundle


def test_effective_bits():
    assert effective_bits(None) == 16.0
    assert effective_bits(QuantizerSpec(num_bits=(4, 3))) == 8.0
    b4 = effective_bits(QuantizerSpec(num_bits=4, block=BlockSpec(sizes=((0, 128),))))
    assert 4.0 < b4 < 4.5  # int4 + fp32 scales / 128
    nv = effective_bits(QuantizerSpec(
        num_bits=(2, 1),
        block=BlockSpec(sizes=((0, 16),), scale_format="e4m3", two_level=True),
    ))
    assert 4.0 < nv < 5.0  # e2m1 + e4m3 scale per 16


class TestAutoQuantize:
    def _bundle(self):
        b = simple_mlp_bundle(in_dim=256, hidden=256, out=64, batch=16)
        return b, b.example_inputs[0]

    def test_budget_respected(self):
        bundle, x = self._bundle()
        q, state = mtq.auto_quantize(
            bundle,
            constraints={"effective_bits": 9.0},
            quantization_formats=("INT4_BLOCKWISE_WEIGHT_ONLY_CFG",
                                  "INT8_WEIGHT_ONLY_CFG", None),
            forward_loop=lambda f: f(x),
        )
        assert state["achieved_bits"] <= 9.0 + 1e-6
        out = q.apply(x)
        assert np.isfinite(np.asarray(out)).all()

    def test_tight_budget_forces_low_bits(self):
        bundle, x = self._bundle()
        q, state = mtq.auto_quantize(
            bundle,
            constraints={"effective_bits": 4.5},
            quantization_formats=("INT4_BLOCKWISE_WEIGHT_ONLY_CFG",
                                  "INT8_WEIGHT_ONLY_CFG", None),
            forward_loop=lambda f: f(x),
        )
        assert state["achieved_bits"] <= 4.5
        # all groups at int4
        assert all(c == 0 for c in state["choice"])

    def test_loose_budget_prefers_high_bits_where_it_matters(self):
        bundle, x = self._bundle()
        q, state = mtq.auto_quantize(
            bundle,
            constraints={"effective_bits": 6.5},
            quantization_formats=("INT4_BLOCKWISE_WEIGHT_ONLY_CFG",
                                  "INT8_WEIGHT_ONLY_CFG", None),
            forward_loop=lambda f: f(x),
        )
        # mixed: at least one int8 and at least one int4 pick
        assert 4.0 < state["achieved_bits"] <= 6.5
        base = bundle.apply(x)
        rel = float(jnp.linalg.norm(q.apply(x) - base) / jnp.linalg.norm(base))
        assert rel < 0.2

    def test_kl_method_runs(self):
        bundle, x = self._bundle()
        q, state = mtq.auto_quantize(
            bundle,
            constraints={"effective_bits": 8.0},
            quantization_formats=("INT8_WEIGHT_ONLY_CFG", None),
            forward_loop=lambda f: f(x),
            method="kl",
        )
        assert np.isfinite(np.asarray(q.apply(x))).all()
