"""Distributed quantization invariants on the 8-virtual-device CPU mesh.

The reference maintains amax consistency across DP/TP/EP with explicit
all-reduces and resharding hooks (model_calib.py:390-498, quant_module
modelopt_post_restore); under GSPMD these must hold by construction. These
tests pin that: calibration statistics and quantized outputs are identical
whatever mesh the model is sharded over — including the reference's
TP=8->4->8 invariant (model_calib.py:409).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

import modelopt_tpu.quant as mtq
from modelopt_tpu.core import ModelBundle
from modelopt_tpu.models import Decoder, tiny_test_config
from modelopt_tpu.parallel import make_mesh, shard_variables, spec_for_path, variable_shardings


def lm_bundle():
    cfg = tiny_test_config(dtype=jnp.float32, hidden_size=64, intermediate_size=128)
    m = Decoder(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (8, 16)), jnp.int32)
    variables = m.init(jax.random.PRNGKey(0), ids)
    return ModelBundle(module=m, variables=dict(variables), example_inputs=(ids,))


class TestPartitionRules:
    def test_specs(self):
        assert spec_for_path("layers_0/attn/q_proj/kernel") == P(None, "tp")
        assert spec_for_path("layers_0/attn/o_proj/kernel") == P("tp", None)
        assert spec_for_path("layers_0/mlp/down_proj/kernel") == P("tp", None)
        assert spec_for_path("layers_0/moe/gate_proj/kernel") == P("ep", None, "tp")
        assert spec_for_path("layers_0/input_norm/scale") == P()

    def test_mesh_axis_filtering(self):
        mesh = make_mesh({"dp": 4, "tp": 2})
        spec = spec_for_path("layers_0/moe/gate_proj/kernel", mesh=mesh)
        assert spec == P(None, None, "tp")  # 'ep' dropped

    def test_indivisible_dims_replicated(self):
        mesh = make_mesh({"dp": 1, "tp": 8})
        bundle = lm_bundle()
        sh = variable_shardings(bundle.variables, mesh)
        # q_proj kernel [64, 64]: 64 % 8 == 0 -> sharded on tp
        s = sh["params"]["layers_0"]["attn"]["q_proj"]["kernel"]
        assert s.spec == P(None, "tp")


class TestShardedCalibration:
    def _calibrate(self, mesh_axes):
        bundle = lm_bundle()
        ids = bundle.example_inputs[0]
        if mesh_axes is None:
            q = mtq.quantize(bundle, mtq.FP8_KV_CFG, lambda f: f(ids))
            return q, None
        mesh = make_mesh(mesh_axes)
        with mesh:
            sharded = bundle.replace(variables=shard_variables(bundle.variables, mesh))
            ids_sh = jax.device_put(ids, NamedSharding(mesh, P("dp", None)))
            q = mtq.quantize(sharded, mtq.FP8_KV_CFG, lambda f: f(ids_sh))
            return q, mesh

    def test_amax_matches_unsharded(self):
        q_ref, _ = self._calibrate(None)
        q_tp, _ = self._calibrate({"dp": 2, "tp": 4})
        a_ref = jax.tree.map(np.asarray, q_ref.variables["quant"])
        a_tp = jax.tree.map(np.asarray, q_tp.variables["quant"])
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6), a_ref, a_tp
        )

    def test_tp_reshard_invariance(self):
        """TP=2 and TP=8 calibrations produce identical scales."""
        q2, _ = self._calibrate({"dp": 4, "tp": 2})
        q8, _ = self._calibrate({"dp": 1, "tp": 8})
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6
            ),
            q2.variables["quant"], q8.variables["quant"],
        )

    def test_sharded_quantized_forward_matches(self):
        q_ref, _ = self._calibrate(None)
        q_tp, mesh = self._calibrate({"dp": 2, "tp": 4})
        ids = q_ref.example_inputs[0]
        out_ref, _ = q_ref.apply(ids)
        with mesh:
            out_tp, _ = q_tp.apply(ids)
        np.testing.assert_allclose(
            np.asarray(out_tp), np.asarray(out_ref), rtol=2e-4, atol=2e-4
        )


class TestShardedServing:
    def test_engine_on_mesh(self):
        from modelopt_tpu.serve import ServingEngine

        bundle = lm_bundle()
        ids = bundle.example_inputs[0]
        mesh = make_mesh({"dp": 1, "tp": 8})
        with mesh:
            sharded = bundle.replace(variables=shard_variables(bundle.variables, mesh))
            q = mtq.quantize(sharded, mtq.FP8_DEFAULT_CFG, lambda f: f(ids))
            eng = ServingEngine(q, max_batch=2, max_seq_len=64, prefill_buckets=(16,))
            req = eng.submit([5, 17, 42], max_new_tokens=5)
            eng.run()
        assert req.done and len(req.out_tokens) == 5
        # matches unsharded quantized greedy
        q_ref = mtq.quantize(bundle, mtq.FP8_DEFAULT_CFG, lambda f: f(ids))
        eng2 = ServingEngine(q_ref, max_batch=2, max_seq_len=64, prefill_buckets=(16,))
        req2 = eng2.submit([5, 17, 42], max_new_tokens=5)
        eng2.run()
        assert req.out_tokens == req2.out_tokens


def test_mla_tp_reshard_invariance():
    """MLA models produce identical logits under tp=1 vs tp=4 sharding
    (per-head expansions column-parallel, latent projections replicated)."""
    import jax.numpy as jnp

    from modelopt_tpu.models import Decoder, tiny_mla_test_config
    from modelopt_tpu.parallel.mesh import make_mesh, shard_variables

    cfg = tiny_mla_test_config(num_experts=0, n_shared_experts=0,
                               first_k_dense=0, dtype=jnp.float32)
    m = Decoder(cfg)
    ids = jnp.asarray([[5, 3, 7, 2]], jnp.int32)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), ids)
    ref = m.apply(v, ids)
    ref = np.asarray(ref[0] if isinstance(ref, tuple) else ref, np.float32)
    mesh = make_mesh({"dp": 2, "tp": 4})
    with mesh:
        vs = shard_variables(dict(v), mesh)
        out = jax.jit(lambda vv, ii: m.apply(vv, ii))(vs, ids)
    got = np.asarray(out[0] if isinstance(out, tuple) else out, np.float32)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
