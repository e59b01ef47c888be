"""Export tests: file structure, reference naming conventions, dequant
round trips (reference analogue: tests/unit/torch/export/)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import modelopt_tpu.quant as mtq
from modelopt_tpu.core import ModelBundle
from modelopt_tpu.export import export_hf_checkpoint
from modelopt_tpu.models import Decoder, tiny_test_config


def lm_bundle(**over):
    cfg = tiny_test_config(dtype=jnp.float32, hidden_size=64,
                           intermediate_size=256, **over)
    m = Decoder(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 16)), jnp.int32)
    variables = m.init(jax.random.PRNGKey(0), ids)
    return ModelBundle(module=m, variables=dict(variables), example_inputs=(ids,))


def load_state(d):
    from safetensors.numpy import load_file

    return load_file(os.path.join(d, "model.safetensors"))


class TestExport:
    def test_int4_awq_export(self, tmp_path, rng):
        bundle = lm_bundle()
        ids = bundle.example_inputs[0]
        q = mtq.quantize(bundle, mtq.INT4_BLOCKWISE_WEIGHT_ONLY_CFG, lambda f: f(ids))
        state = export_hf_checkpoint(q, str(tmp_path))
        assert os.path.exists(tmp_path / "model.safetensors")
        qc = json.load(open(tmp_path / "hf_quant_config.json"))
        assert qc["quantization"]["quant_algo"] == "W4A16_AWQ"
        assert qc["quantization"]["group_size"] == 128
        # packed weight + scales present: reference pack_int4_in_uint8 layout
        # (uint8 [out/2, in], two's-complement nibbles over output pairs)
        w = state["model.layers.0.mlp.down_proj.weight"]
        s = state["model.layers.0.mlp.down_proj.weight_scale"]
        I, O = 256, 64
        assert w.dtype == np.uint8 and w.shape == (O // 2, I)
        assert s.shape == (O, I // 128)
        # dequant round trip matches original within int4 step
        orig = np.asarray(q.variables["params"]["layers_0"]["mlp"]["down_proj"]["kernel"]).T
        lo = (w & 0xF).astype(np.int8)
        hi = (w >> 4).astype(np.int8)
        lo = np.where(lo >= 8, lo - 16, lo)  # sign-extend the nibble
        hi = np.where(hi >= 8, hi - 16, hi)
        deq = np.zeros((O, I), np.float32)
        deq[0::2] = lo
        deq[1::2] = hi
        deq3 = deq.reshape(O, I // 128, 128) * s[..., None]
        orig3 = orig.reshape(O, I // 128, 128)
        step = np.abs(orig3).max(-1, keepdims=True) / 7.0
        assert np.all(np.abs(deq3 - orig3) <= step * 0.51 + 1e-7)

    def test_fp8_kv_export(self, tmp_path):
        bundle = lm_bundle()
        ids = bundle.example_inputs[0]
        q = mtq.quantize(bundle, mtq.FP8_KV_CFG, lambda f: f(ids))
        state = export_hf_checkpoint(q, str(tmp_path))
        qc = json.load(open(tmp_path / "hf_quant_config.json"))
        assert qc["quantization"]["quant_algo"] == "FP8"
        assert qc["quantization"]["kv_cache_quant_algo"] == "FP8"
        assert "model.layers.0.self_attn.k_scale" in state
        assert "model.layers.0.self_attn.q_proj.input_scale" in state
        assert state["model.layers.0.self_attn.q_proj.weight"].dtype.name.startswith(
            "float8"
        ) or state["model.layers.0.self_attn.q_proj.weight"].dtype == np.uint8
        # lm_head excluded -> fp16
        assert state["lm_head.weight"].dtype == np.float16

    def test_nvfp4_export(self, tmp_path):
        bundle = lm_bundle()
        ids = bundle.example_inputs[0]
        q = mtq.quantize(bundle, mtq.NVFP4_DEFAULT_CFG, lambda f: f(ids))
        state = export_hf_checkpoint(q, str(tmp_path))
        qc = json.load(open(tmp_path / "hf_quant_config.json"))
        assert qc["quantization"]["quant_algo"] == "NVFP4"
        w = state["model.layers.0.mlp.down_proj.weight"]
        assert w.dtype == np.uint8 and w.shape == (64, 128)  # [O, I/2]
        assert "model.layers.0.mlp.down_proj.weight_scale_2" in state


class TestShardedStreamingExport:
    """reference: unified_export_hf_streaming.py:445 — sharded output +
    index json, bounded host residency; round-trips through LazyStateDict."""

    def test_sharded_export_and_lazy_reload(self, tmp_path):
        bundle = lm_bundle()
        ids = bundle.example_inputs[0]
        q = mtq.quantize(bundle, mtq.FP8_DEFAULT_CFG, lambda f: f(ids))
        index = export_hf_checkpoint(q, str(tmp_path), max_shard_bytes=64 * 1024)
        idx_file = tmp_path / "model.safetensors.index.json"
        assert idx_file.exists()
        idx = json.load(open(idx_file))
        shards = set(idx["weight_map"].values())
        assert len(shards) > 1  # the byte budget actually split the export
        for s in shards:
            assert (tmp_path / s).exists()
        assert idx["metadata"]["total_size"] > 0
        # every mapped tensor is readable through the lazy shard reader
        from modelopt_tpu.models import LazyStateDict

        sd = LazyStateDict(str(tmp_path))
        assert set(sd) == set(idx["weight_map"])
        t = sd["model.layers.0.mlp.down_proj.weight"]
        assert t is not None

    def test_sharded_matches_single_file(self, tmp_path):
        bundle = lm_bundle()
        ids = bundle.example_inputs[0]
        q = mtq.quantize(bundle, mtq.FP8_DEFAULT_CFG, lambda f: f(ids))
        single = export_hf_checkpoint(q, str(tmp_path / "single"))
        export_hf_checkpoint(q, str(tmp_path / "sharded"),
                             max_shard_bytes=64 * 1024)
        from modelopt_tpu.models import LazyStateDict

        sd = LazyStateDict(str(tmp_path / "sharded"))
        assert set(sd) == set(single)
        import torch

        for k in list(single)[:12]:
            t = sd[k]
            # fp8 torch tensors don't convert to numpy: bit-compare
            tv = (t.view(torch.uint8) if t.dtype == torch.float8_e4m3fn
                  else t).numpy()
            s = single[k]
            sv = s.view(np.uint8) if s.dtype.itemsize == 1 and "float8" in s.dtype.name else s
            np.testing.assert_array_equal(tv, np.asarray(sv))


class TestFamilyExportRoundtrip:
    """Unquantized export -> re-import -> logit match pins the reverse name
    maps for the newer families (qk-norm, MLA, MoE expert unstacking)."""

    def _roundtrip(self, cfg, tmp_path, atol=8e-2):
        import jax

        from modelopt_tpu.core import ModelBundle
        from modelopt_tpu.models import Decoder
        from modelopt_tpu.models.hf_import import from_hf

        m = Decoder(cfg)
        ids = jnp.asarray([[5, 3, 7, 2]], jnp.int32)
        v = jax.jit(m.init)(jax.random.PRNGKey(0), ids)
        b = ModelBundle(module=m, variables=dict(v), example_inputs=(ids,))
        # exporter wants a quantize record; apply an all-disabled config so
        # weights export as plain fp16 (pure name-map round trip)
        b = mtq.quantize(
            b, {"quant_cfg": {"*": {"enable": False}}, "algorithm": None}
        )
        export_hf_checkpoint(b, str(tmp_path))
        state = load_state(str(tmp_path))
        hf_cfg = json.load(open(tmp_path / "config.json"))
        b2 = from_hf(state, hf_cfg)
        o1 = b.apply(ids)
        o2 = b2.apply(ids)
        l1 = np.asarray(o1[0] if isinstance(o1, tuple) else o1, np.float32)
        l2 = np.asarray(o2[0] if isinstance(o2, tuple) else o2, np.float32)
        # fp16 export round-trip noise only
        np.testing.assert_allclose(l1, l2, rtol=atol, atol=atol)

    def test_qwen3_roundtrip(self, tmp_path):
        from modelopt_tpu.models import qwen3_config

        self._roundtrip(qwen3_config(
            vocab_size=128, hidden_size=64, num_layers=2, num_heads=4,
            num_kv_heads=2, head_dim=16, intermediate_size=96,
            max_position_embeddings=64,
        ), tmp_path)

    def test_deepseek_mla_moe_roundtrip(self, tmp_path):
        from modelopt_tpu.models import tiny_mla_test_config

        self._roundtrip(tiny_mla_test_config(), tmp_path)

    def test_moe_quantized_export_unstacks_experts(self, tmp_path, rng):
        import jax

        from modelopt_tpu.core import ModelBundle
        from modelopt_tpu.models import Decoder, tiny_test_config

        cfg = tiny_test_config(num_experts=4, experts_per_token=2)
        m = Decoder(cfg)
        ids = jnp.zeros((2, 8), jnp.int32)
        v = jax.jit(m.init)(jax.random.PRNGKey(0), ids)
        b = ModelBundle(module=m, variables=dict(v), example_inputs=(ids,))
        q = mtq.quantize(b, "INT4_AWQ_CFG", lambda f: f(ids))
        state = export_hf_checkpoint(q, str(tmp_path))
        # mixtral naming, per-expert tensors, packed weights + scales
        k = "model.layers.0.block_sparse_moe.experts.3.w1.weight"
        assert k in state, sorted(state)[:8]
        assert state[k].dtype == np.uint8
        assert k.rsplit(".weight", 1)[0] + ".weight_scale" in state

    def test_gptoss_roundtrip(self, tmp_path):
        from modelopt_tpu.models import tiny_gptoss_test_config

        self._roundtrip(tiny_gptoss_test_config(), tmp_path)

    def test_gemma3_roundtrip(self, tmp_path):
        from modelopt_tpu.models import tiny_gemma3_test_config

        self._roundtrip(tiny_gemma3_test_config(), tmp_path)

    def test_phi_fused_roundtrip(self, tmp_path):
        """phi3/4-style fused qkv/gate_up projections round-trip (their
        name-map entries were missing: exports silently DROPPED the fused
        attention/MLP weights before this test existed)."""
        from modelopt_tpu.models import tiny_test_config

        self._roundtrip(tiny_test_config(
            fused_qkv=True, fused_gate_up=True,
        ), tmp_path)

    def test_nemotron_roundtrip(self, tmp_path):
        from modelopt_tpu.models import tiny_test_config

        self._roundtrip(tiny_test_config(
            activation="relu2", norm="layernorm1p",
            partial_rotary_factor=0.5,
        ), tmp_path)
