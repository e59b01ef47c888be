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

    def test_gradient_method_budget_and_scores(self, tmp_path):
        """Taylor/Fisher gradient scoring (one backward per batch, jitted
        [G, F] score matrix) respects the budget and persists a resumable
        score checkpoint (reference: algorithms.py:1441 gradient searcher,
        searcher.py:268 save_search_checkpoint)."""
        bundle, x = self._bundle()
        ckpt = str(tmp_path / "autoq.json")
        q, state = mtq.auto_quantize(
            bundle,
            constraints={"effective_bits": 9.0},
            quantization_formats=("INT4_BLOCKWISE_WEIGHT_ONLY_CFG",
                                  "INT8_WEIGHT_ONLY_CFG", None),
            forward_loop=lambda f: f(x),
            method="gradient",
            checkpoint=ckpt,
        )
        assert state["achieved_bits"] <= 9.0 + 1e-6
        assert np.isfinite(np.asarray(q.apply(x))).all()
        scores = np.asarray(state["scores"])
        # int4 must never score better (lower) than int8 for the same group
        assert (scores[:, 0] >= scores[:, 1] - 1e-12).all()
        # unquantized format scores 0
        np.testing.assert_allclose(scores[:, 2], 0.0)

        # resume: checkpoint scores are reused verbatim (no re-scoring)
        import json

        saved = json.load(open(ckpt))
        saved["scores"] = (np.asarray(saved["scores"]) * 0 + 1.5).tolist()
        json.dump(saved, open(ckpt, "w"))
        _, state2 = mtq.auto_quantize(
            bundle,
            constraints={"effective_bits": 9.0},
            quantization_formats=("INT4_BLOCKWISE_WEIGHT_ONLY_CFG",
                                  "INT8_WEIGHT_ONLY_CFG", None),
            forward_loop=lambda f: f(x),
            method="gradient",
            checkpoint=ckpt,
        )
        np.testing.assert_allclose(np.asarray(state2["scores"]), 1.5)

    def test_gradient_scores_track_downstream_sensitivity(self):
        """A layer whose output barely affects the loss must score lower
        than an identical layer that dominates it — the property the
        local-MSE proxy cannot see."""
        import flax.linen as nn
        import jax

        from modelopt_tpu.core import ModelBundle
        from modelopt_tpu.nn import QuantDense
        from modelopt_tpu.quant.algorithms.autoquant import _gradient_scores
        from modelopt_tpu.quant.algorithms.capture import (
            capture_inputs, fused_groups, quant_linears)
        from modelopt_tpu.core.bundle import apply_mode
        from modelopt_tpu.quant.config import get_config

        class TwoBranch(nn.Module):
            @nn.compact
            def __call__(self, x):
                a = QuantDense(32, name="loud")(x)
                b = QuantDense(32, name="quiet")(x)
                return a + 1e-3 * b

        m = TwoBranch()
        x = jax.random.normal(jax.random.PRNGKey(1), (8, 16), jnp.float32)
        variables = m.init(jax.random.PRNGKey(0), x)
        bundle = ModelBundle(module=m, variables=dict(variables),
                             example_inputs=(x,))
        captured = capture_inputs(bundle, lambda f: f(x))
        probe = apply_mode(bundle, "quantize",
                           get_config("INT4_BLOCKWISE_WEIGHT_ONLY_CFG"))
        groups = fused_groups(quant_linears(probe, captured))
        fmts = [get_config("INT4_BLOCKWISE_WEIGHT_ONLY_CFG")]
        scores = _gradient_scores(bundle, groups, fmts,
                                  lambda f: f(x), None, 1024)
        by_name = {g[0].dense_path: scores[i, 0] for i, g in enumerate(groups)}
        assert by_name["quiet"] < by_name["loud"] * 1e-3

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
