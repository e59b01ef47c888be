"""Mesh-sharded serving engine: weights/KV sharded over a (dp, tp, ep)
mesh must produce the same tokens as the single-device engine — one
compiled decode program, GSPMD collectives (SURVEY §2.10; BASELINE's
multi-host scaling target). Runs on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import modelopt_tpu.quant as mtq
from modelopt_tpu.core import ModelBundle
from modelopt_tpu.models import Decoder, tiny_test_config
from modelopt_tpu.parallel import make_mesh
from modelopt_tpu.serve import ServingEngine

PROMPTS = [[5, 17, 42, 7], [9, 9, 1, 30], [2, 4, 33, 8, 12], [11, 3]]


def _bundle(num_experts=0):
    cfg = tiny_test_config(
        dtype=jnp.float32, hidden_size=64,
        num_experts=num_experts, experts_per_token=2 if num_experts else 2,
    )
    m = Decoder(cfg)
    ids = jnp.zeros((1, 8), jnp.int32)
    variables = m.init(jax.random.PRNGKey(0), ids)
    return ModelBundle(module=m, variables=dict(variables),
                       example_inputs=(ids,))


def _generate(bundle, mesh=None, n=6, **engine_kw):
    eng = ServingEngine(bundle, max_batch=4, max_seq_len=64,
                        prefill_buckets=(16,), mesh=mesh, **engine_kw)
    reqs = [eng.submit(p, max_new_tokens=n) for p in PROMPTS]
    eng.run()
    assert all(r.done for r in reqs)
    return [r.out_tokens for r in reqs]


class TestMeshEngine:
    def test_tp_dp_parity_with_single_device(self):
        bundle = _bundle()
        want = _generate(bundle)
        mesh = make_mesh({"dp": 2, "tp": 4})
        got = _generate(bundle, mesh=mesh)
        assert got == want

    def test_tp_ep_parity_moe(self):
        bundle = _bundle(num_experts=4)
        want = _generate(bundle)
        mesh = make_mesh({"ep": 2, "tp": 4})
        got = _generate(bundle, mesh=mesh)
        assert got == want

    def test_quantized_fp8kv_parity(self):
        bundle = _bundle()
        ids = jnp.asarray(
            np.random.default_rng(0).integers(0, 256, (2, 16)), jnp.int32)
        qb = mtq.quantize(bundle, mtq.FP8_KV_CFG, lambda fn: fn(ids))
        want = _generate(qb, kv_dtype=jnp.float8_e4m3fn)
        mesh = make_mesh({"dp": 2, "tp": 4})
        got = _generate(qb, mesh=mesh, kv_dtype=jnp.float8_e4m3fn)
        assert got == want

    def test_hybrid_mamba_parity(self):
        """Hybrid (Mamba2 + attention) bundle under a dp x tp mesh: the
        mixer in/out projections shard (mcore COL/ROW rules), conv/SSM
        state slots shard over dp slots + tp lanes via kv_cache_shardings,
        and decode tokens match the single-device engine exactly."""
        from modelopt_tpu.models import tiny_hybrid_test_config

        cfg = tiny_hybrid_test_config(dtype=jnp.float32,
                                      param_dtype=jnp.float32,
                                      max_position_embeddings=128)
        m = Decoder(cfg)
        ids = jnp.zeros((1, 8), jnp.int32)
        v = m.init(jax.random.PRNGKey(0), ids)
        bundle = ModelBundle(module=m, variables=dict(v),
                             example_inputs=(ids,))
        want = _generate(bundle)
        mesh = make_mesh({"dp": 4, "tp": 2})
        got = _generate(bundle, mesh=mesh)
        assert got == want
        # the mixer weights really shard
        eng = ServingEngine(bundle, max_batch=4, max_seq_len=64,
                            prefill_buckets=(16,), mesh=mesh)
        mix = None
        for i in range(cfg.num_layers):
            lp = eng._vars["params"].get(f"layers_{i}", {})
            if "mixer" in lp:
                mix = lp["mixer"]
                break
        assert mix is not None
        assert "tp" in str(mix["in_proj"]["kernel"].sharding.spec)

    def test_weights_actually_sharded(self):
        bundle = _bundle()
        mesh = make_mesh({"dp": 2, "tp": 4})
        eng = ServingEngine(bundle, max_batch=4, max_seq_len=64,
                            prefill_buckets=(16,), mesh=mesh)
        k = eng._vars["params"]["layers_0"]["mlp"]["gate_proj"]["kernel"]
        assert "tp" in str(k.sharding.spec)
        # KV cache head-dim sharded over tp, slots over dp
        ck = eng.cache["k"][0]
        assert ck.sharding.spec[-1] == "tp" or ck.sharding.spec[0] == "dp"

    def test_paged_mesh_rejected(self):
        bundle = _bundle()
        mesh = make_mesh({"dp": 2, "tp": 4})
        with pytest.raises(NotImplementedError, match="dense KV cache"):
            ServingEngine(bundle, max_batch=4, max_seq_len=64, mesh=mesh,
                          paged=True, prefill_buckets=(16,))

    def test_burst_decode_on_mesh(self):
        bundle = _bundle()
        want = _generate(bundle, n=8)
        mesh = make_mesh({"dp": 2, "tp": 4})
        got = _generate(bundle, mesh=mesh, n=8, multi_step=4)
        assert got == want
