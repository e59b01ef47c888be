"""2:4 weight sparsity + attention sparsity tests
(reference analogue: tests/unit/torch/sparsity/)."""

import jax
import jax.numpy as jnp
import numpy as np

import modelopt_tpu.sparsity as mts
import modelopt_tpu.quant as mtq
from modelopt_tpu.sparsity.magnitude import create_nm_mask

from tests._test_utils.models import simple_mlp_bundle


class TestMask:
    def test_2_4_structure(self, rng):
        w = jnp.asarray(rng.standard_normal((64, 16)), jnp.float32)
        mask = create_nm_mask(w, 2, 4)
        m = np.asarray(mask).reshape(16, 4, 16)
        np.testing.assert_array_equal(m.sum(1), 2)  # exactly 2 of 4 kept
        # kept entries are the largest-magnitude ones
        wa = np.abs(np.asarray(w)).reshape(16, 4, 16)
        kept_min = np.where(m, wa, np.inf).min(1)
        dropped_max = np.where(~m, wa, -np.inf).max(1)
        assert np.all(kept_min >= dropped_max)


class TestSparsify:
    def test_magnitude_mode(self, rng):
        bundle = simple_mlp_bundle(in_dim=32, hidden=64)
        s = mts.sparsify(bundle, "sparse_magnitude")
        assert "mask" in s.variables["sparse"]["fc1"]
        x = bundle.example_inputs[0]
        out_s = s.apply(x)
        # manual: mask applied to weights
        p = s.variables["params"]
        m1 = s.variables["sparse"]["fc1"]["mask"]
        h = jnp.maximum(x @ (p["fc1"]["kernel"] * m1) + p["fc1"]["bias"], 0)
        assert not np.allclose(np.asarray(out_s), np.asarray(bundle.apply(x)))
        # lm_head excluded
        assert "lm_head" not in s.variables["sparse"]

    def test_sparsegpt_beats_magnitude(self, rng):
        bundle = simple_mlp_bundle(in_dim=64, hidden=64, batch=32)
        x = bundle.example_inputs[0]
        base = bundle.apply(x)

        def err(b):
            return float(jnp.linalg.norm(b.apply(x) - base) / jnp.linalg.norm(base))

        e_mag = err(mts.sparsify(bundle, "sparse_magnitude"))
        e_gpt = err(mts.sparsify(bundle, "sparsegpt", {"forward_loop": lambda f: f(x)}))
        assert e_gpt < e_mag

    def test_export_folds(self, rng):
        bundle = simple_mlp_bundle(in_dim=32, hidden=64)
        x = bundle.example_inputs[0]
        s = mts.sparsify(bundle, "sparse_magnitude")
        e = mts.export_sparse(s)
        assert "sparse" not in e.variables
        np.testing.assert_allclose(
            np.asarray(e.apply(x)), np.asarray(s.apply(x)), rtol=1e-6
        )
        # folded weights are actually 50% zero
        w = np.asarray(e.variables["params"]["fc1"]["kernel"])
        assert abs((w == 0).mean() - 0.5) < 0.02

    def test_sparse_plus_quantize(self, rng):
        bundle = simple_mlp_bundle(in_dim=256, hidden=256)
        x = bundle.example_inputs[0]
        s = mts.sparsify(bundle, "sparse_magnitude")
        q = mtq.quantize(s, mtq.INT8_DEFAULT_CFG, lambda f: f(x))
        out = q.apply(x)
        assert out.shape == x.shape[:1] + (16,)
        # chained records
        assert [r.mode for r in q.records] == ["sparse_magnitude", "quantize"]

    def test_save_restore_sparse(self, rng, tmp_path):
        from modelopt_tpu.core import restore, save

        bundle = simple_mlp_bundle(in_dim=32, hidden=64)
        x = bundle.example_inputs[0]
        s = mts.sparsify(bundle, "sparse_magnitude")
        save(s, str(tmp_path / "ck"))
        r = restore(simple_mlp_bundle(in_dim=32, hidden=64, seed=9), str(tmp_path / "ck"))
        np.testing.assert_allclose(np.asarray(r.apply(x)), np.asarray(s.apply(x)), rtol=1e-6)


class TestAttentionSparsity:
    def test_sliding_window(self):
        from modelopt_tpu.core import ModelBundle
        from modelopt_tpu.models import Decoder, tiny_test_config
        from modelopt_tpu.sparsity.attention_sparsity import sparsify_attention

        cfg = tiny_test_config(dtype=jnp.float32)
        m = Decoder(cfg)
        ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 32)), jnp.int32)
        variables = m.init(jax.random.PRNGKey(0), ids)
        bundle = ModelBundle(module=m, variables=dict(variables), example_inputs=(ids,))
        sw = sparsify_attention(bundle, window=8, sink=2)
        base, _ = bundle.apply(ids)
        out, _ = sw.apply(ids)
        # early tokens (inside window) identical; late tokens differ
        np.testing.assert_allclose(np.asarray(out[:, :8]), np.asarray(base[:, :8]), atol=1e-5)
        assert not np.allclose(np.asarray(out[:, -1]), np.asarray(base[:, -1]))
