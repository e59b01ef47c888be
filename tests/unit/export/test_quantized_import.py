"""Pre-quantized checkpoint import (model_hub workload): export -> load ->
bit-exact repack + matching logits (reference analogue: examples/model_hub,
deploying pre-quantized HF-hub checkpoints)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import modelopt_tpu.quant as mtq
from modelopt_tpu.core import ModelBundle
from modelopt_tpu.export import export_hf_checkpoint
from modelopt_tpu.models import Decoder, load_quantized_checkpoint, tiny_test_config

pytest.importorskip("safetensors")


def lm_bundle(**over):
    cfg = tiny_test_config(dtype=jnp.float32, hidden_size=64,
                           intermediate_size=256, **over)
    m = Decoder(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 16)),
                      jnp.int32)
    variables = m.init(jax.random.PRNGKey(0), ids)
    return ModelBundle(module=m, variables=dict(variables),
                       example_inputs=(ids,))


def _logits(bundle, ids):
    out = bundle.apply(ids)
    return np.asarray(out[0] if isinstance(out, tuple) else out, np.float32)


class TestQuantizedImport:
    def test_int4_roundtrip_bit_exact(self, tmp_path):
        bundle = lm_bundle()
        ids = bundle.example_inputs[0]
        q = mtq.quantize(bundle, mtq.INT4_BLOCKWISE_WEIGHT_ONLY_CFG,
                         lambda f: f(ids))
        state = export_hf_checkpoint(q, str(tmp_path))
        loaded = load_quantized_checkpoint(str(tmp_path),
                                           param_dtype=jnp.float32)
        # packed weights landed in the quant collection, kernels deleted
        lq = loaded.variables["quant"]["layers_0"]["mlp"]["down_proj"]["qweight"]
        assert "kernel" not in loaded.variables["params"]["layers_0"]["mlp"][
            "down_proj"]
        # bit-exact vs the disk codes: dequantize both ways
        from modelopt_tpu.quant.qtensor import dequantize_int4

        ours = np.asarray(dequantize_int4(
            {k: jnp.asarray(v) for k, v in lq.items()}, 128))
        w = state["model.layers.0.mlp.down_proj.weight"]
        s = state["model.layers.0.mlp.down_proj.weight_scale"]
        lo = (w & 0xF).astype(np.int8)
        hi = (w >> 4).astype(np.int8)
        lo = np.where(lo >= 8, lo - 16, lo)
        hi = np.where(hi >= 8, hi - 16, hi)
        O, I = s.shape[0], w.shape[1]
        deq = np.zeros((O, I), np.float32)
        deq[0::2], deq[1::2] = lo, hi
        disk = (deq.reshape(O, I // 128, 128) * s[..., None]).reshape(O, I)
        np.testing.assert_array_equal(ours, disk.T)
        # logits match the fake-quant original within bf16 compute noise
        # (config_from_hf defaults the imported module to bf16 compute; the
        # repack itself is pinned bit-exact above)
        ref = _logits(q, ids)
        got = _logits(loaded, ids)
        np.testing.assert_allclose(got, ref, rtol=6e-2, atol=6e-2)

    def test_fp8_kv_scales_import(self, tmp_path):
        bundle = lm_bundle()
        ids = bundle.example_inputs[0]
        q = mtq.quantize(bundle, mtq.FP8_KV_CFG, lambda f: f(ids))
        export_hf_checkpoint(q, str(tmp_path))
        loaded = load_quantized_checkpoint(str(tmp_path),
                                           param_dtype=jnp.float32)
        lq = loaded.variables["quant"]["layers_0"]
        # input_scale round-trips exactly to the calibrated amax
        orig_amax = float(np.asarray(
            q.variables["quant"]["layers_0"]["attn"]["q_proj"][
                "input_quantizer"]["amax"]).reshape(-1)[0])
        got_amax = float(np.asarray(
            lq["attn"]["q_proj"]["input_quantizer"]["amax"]))
        np.testing.assert_allclose(got_amax, orig_amax, rtol=1e-6)
        # KV amax present (FP8 KV scales clamp to >= 1.0 on export, so the
        # reimported amax is >= 448 for small-activation test models)
        assert float(np.asarray(lq["attn"]["k_quantizer"]["amax"])) >= 448.0
        # logits: EXACT match once the two conventions that intentionally
        # don't round-trip are normalized out — (a) FP8 KV scales clamp to
        # >= 1.0 on export (reference quant_utils.py
        # get_kv_cache_scaling_factor), (b) unquantized params (norms /
        # embeddings / lm_head) are stored fp16 on disk. Everything the
        # importer reconstructs (packed codes, scales, amax) is bit-exact.
        import jax.tree_util as jtu

        def clamp_kv(path, leaf):
            keys = [str(getattr(p, "key", "")) for p in path]
            if "amax" in keys and any(
                    k.endswith(("k_quantizer", "v_quantizer")) for k in keys):
                return jnp.maximum(leaf, 448.0)
            return leaf

        qv = dict(q.variables)
        qv["quant"] = jtu.tree_map_with_path(clamp_kv, qv["quant"])
        q_clamped = q.replace(variables=qv)
        lp = jax.tree.map(lambda x: x, loaded.variables["params"])
        op = q_clamped.variables["params"]
        lp["embed_tokens"] = op["embed_tokens"]
        lp["final_norm"] = op["final_norm"]
        if "lm_head" in op:
            lp["lm_head"] = op["lm_head"]
        for i in range(bundle.module.cfg.num_layers):
            for nk in ("input_norm", "post_attn_norm"):
                lp[f"layers_{i}"][nk] = op[f"layers_{i}"][nk]
        loaded_fp32 = loaded.replace(
            variables={**loaded.variables, "params": lp})
        got = _logits(loaded_fp32, ids)
        ref = _logits(q_clamped, ids)
        np.testing.assert_allclose(got, ref, rtol=0, atol=1e-5)

    def test_w4a8_loaded_bundle_serves(self, tmp_path):
        from modelopt_tpu.serve import ServingEngine

        bundle = lm_bundle()
        ids = bundle.example_inputs[0]
        q = mtq.quantize(bundle, mtq.W4A8_INT8_DYNAMIC_CFG, lambda f: f(ids))
        export_hf_checkpoint(q, str(tmp_path))
        loaded = load_quantized_checkpoint(str(tmp_path))
        eng = ServingEngine(loaded, max_batch=2, max_seq_len=64,
                            prefill_buckets=(16,))
        req = eng.submit([5, 17, 42], max_new_tokens=4)
        eng.run()
        assert req.done and len(req.out_tokens) == 4

    def test_moe_experts_fold_bit_exact(self, tmp_path):
        bundle = lm_bundle(num_experts=4, experts_per_token=2)
        ids = bundle.example_inputs[0]
        q = mtq.quantize(bundle, mtq.INT4_BLOCKWISE_WEIGHT_ONLY_CFG,
                         lambda f: f(ids))
        state = export_hf_checkpoint(q, str(tmp_path))
        loaded = load_quantized_checkpoint(str(tmp_path),
                                           param_dtype=jnp.float32)
        moe_q = loaded.variables["quant"]["layers_0"]["moe"]
        assert "qweight" in moe_q["down_proj"]
        # folded layout matches compress(): dequantize expert 1's columns
        from modelopt_tpu.quant.qtensor import dequantize_int4

        qt = {k: jnp.asarray(v) for k, v in moe_q["down_proj"]["qweight"].items()}
        folded = np.asarray(dequantize_int4(qt, 128))
        N = folded.shape[1] // 4
        w = state["model.layers.0.block_sparse_moe.experts.1.w2.weight"]
        s = state["model.layers.0.block_sparse_moe.experts.1.w2.weight_scale"]
        lo = (w & 0xF).astype(np.int8)
        hi = (w >> 4).astype(np.int8)
        lo = np.where(lo >= 8, lo - 16, lo)
        hi = np.where(hi >= 8, hi - 16, hi)
        O, I = s.shape[0], w.shape[1]
        deq = np.zeros((O, I), np.float32)
        deq[0::2], deq[1::2] = lo, hi
        g = I // s.shape[1]
        disk = (deq.reshape(O, I // g, g) * s[..., None]).reshape(O, I)
        np.testing.assert_array_equal(folded[:, N:2 * N], disk.T)
        got = _logits(loaded, ids)
        ref = _logits(q, ids)
        np.testing.assert_allclose(got, ref, rtol=6e-2, atol=6e-2)


class TestMLARepack:
    """DeepSeek MLA projections repack DIRECTLY (no dequant fallback): the
    exporter writes HF-canonical INTERLEAVED rope rows, so the importer
    must apply the same output-column permutation the plain importer does
    (hf_import._deepseek_params) — in code space, bit-exactly."""

    def _mla_bundle(self):
        from modelopt_tpu.models import tiny_mla_test_config

        cfg = tiny_mla_test_config(dtype=jnp.float32,
                                   param_dtype=jnp.float32)
        m = Decoder(cfg)
        ids = jnp.asarray(np.random.default_rng(1).integers(0, 256, (2, 16)),
                          jnp.int32)
        v = jax.jit(m.init)(jax.random.PRNGKey(0), ids)
        return ModelBundle(module=m, variables=dict(v), example_inputs=(ids,))

    def test_mla_int4_direct_repack_bit_exact(self, tmp_path):
        import warnings as _w

        bundle = self._mla_bundle()
        cfg = bundle.module.cfg
        ids = bundle.example_inputs[0]
        q = mtq.quantize(bundle, mtq.INT4_BLOCKWISE_WEIGHT_ONLY_CFG,
                         lambda f: f(ids))
        state = export_hf_checkpoint(q, str(tmp_path))
        with _w.catch_warnings():
            _w.simplefilter("error")  # no dequant-fallback leftovers allowed
            loaded = load_quantized_checkpoint(str(tmp_path),
                                               param_dtype=jnp.float32)
        attn_q = loaded.variables["quant"]["layers_0"]["attn"]
        for name in ("q_a_proj", "q_b_proj", "kv_a_proj", "kv_b_proj",
                     "o_proj"):
            assert "qweight" in attn_q[name], name
            assert "kernel" not in loaded.variables["params"]["layers_0"][
                "attn"].get(name, {}), name
        # bit-exact: dequantized repacked q_b_proj == disk codes with the
        # de-interleave permutation applied on output rows
        from modelopt_tpu.quant.qtensor import dequantize_int4

        qt = {k: jnp.asarray(v) for k, v in
              attn_q["q_b_proj"]["qweight"].items()}
        g = cfg.q_lora_rank  # in_dim 32 < 128 -> group shrinks to in_dim
        ours = np.asarray(dequantize_int4(qt, g))
        w = state["model.layers.0.self_attn.q_b_proj.weight"]
        s = state["model.layers.0.self_attn.q_b_proj.weight_scale"]
        lo = (w & 0xF).astype(np.int8)
        hi = (w >> 4).astype(np.int8)
        lo = np.where(lo >= 8, lo - 16, lo)
        hi = np.where(hi >= 8, hi - 16, hi)
        O, I = s.shape[0], w.shape[1]
        deq = np.zeros((O, I), np.float32)
        deq[0::2], deq[1::2] = lo, hi
        disk = (deq.reshape(O, s.shape[1], -1) * s[..., None]).reshape(O, I)
        dn, dr, H = (cfg.qk_nope_head_dim, cfg.qk_rope_head_dim,
                     cfg.num_heads)
        rope_perm = np.concatenate([np.arange(0, dr, 2),
                                    np.arange(1, dr, 2)])
        head = np.concatenate([np.arange(dn), dn + rope_perm])
        qperm = (np.arange(H)[:, None] * (dn + dr) + head[None, :]).reshape(-1)
        np.testing.assert_array_equal(ours, disk[qperm].T)
        # logits match the fake-quant original (fp16-storage noise only on
        # the unquantized params)
        ref = _logits(q, ids)
        got = _logits(loaded, ids)
        np.testing.assert_allclose(got, ref, rtol=6e-2, atol=6e-2)

    def test_mla_nvfp4_logit_parity(self, tmp_path):
        bundle = self._mla_bundle()
        ids = bundle.example_inputs[0]
        q = mtq.quantize(bundle, mtq.NVFP4_DEFAULT_CFG, lambda f: f(ids))
        export_hf_checkpoint(q, str(tmp_path))
        loaded = load_quantized_checkpoint(str(tmp_path),
                                           param_dtype=jnp.float32)
        assert "qweight" in loaded.variables["quant"]["layers_0"]["attn"][
            "q_b_proj"]
        ref = _logits(q, ids)
        got = _logits(loaded, ids)
        np.testing.assert_allclose(got, ref, rtol=8e-2, atol=8e-2)


class TestOaiMxfp4Import:
    """Native gpt-oss (OpenAI MXFP4 release format) fused-stacked-expert
    checkpoints must repack BIT-EXACTLY into the folded MXFP4 qtensor
    layout — no dequant fallback (reference: quantization/plugins/
    huggingface.py fused gpt-oss experts; examples/gpt-oss/)."""

    MX_CFG = {
        "quant_cfg": {
            "*": {"enable": False},
            "*moe/gate_proj/weight_quantizer": {
                "enable": True, "num_bits": (2, 1),
                "block_sizes": {-2: 32, "type": "dynamic",
                                "scale_format": "e8m0", "two_level": False}},
            "*moe/up_proj/weight_quantizer": {
                "enable": True, "num_bits": (2, 1),
                "block_sizes": {-2: 32, "type": "dynamic",
                                "scale_format": "e8m0", "two_level": False}},
            "*moe/down_proj/weight_quantizer": {
                "enable": True, "num_bits": (2, 1),
                "block_sizes": {-2: 32, "type": "dynamic",
                                "scale_format": "e8m0", "two_level": False}},
        },
        "algorithm": None,
    }

    def _gptoss_bundle(self):
        from modelopt_tpu.models import tiny_gptoss_test_config

        cfg = tiny_gptoss_test_config(dtype=jnp.float32,
                                      param_dtype=jnp.float32)
        m = Decoder(cfg)
        ids = jnp.asarray(np.random.default_rng(2).integers(0, 256, (2, 16)),
                          jnp.int32)
        v = jax.jit(m.init)(jax.random.PRNGKey(0), ids)
        return ModelBundle(module=m, variables=dict(v), example_inputs=(ids,))

    @staticmethod
    def _unfold_to_oai(data, scale, E):
        """Invert the folded qtensor layout back to OAI blocks/scales:
        data [K/2, E*N] split-half packed -> blocks [E, N, K/32, 16];
        scale [K/32, E*N] -> [E, N, K/32]."""
        Khalf, EN = data.shape
        K, N = 2 * Khalf, EN // E
        codes = np.empty((K, EN), np.uint8)
        codes[:Khalf] = data & 0xF
        codes[Khalf:] = data >> 4
        per = codes.reshape(K, E, N).transpose(1, 2, 0)  # [E, N, K]
        # ascontiguousarray: ufuncs keep the transposed input's memory
        # order and safetensors serializes the raw buffer
        packed = np.ascontiguousarray(
            (per[..., 0::2] | (per[..., 1::2] << 4)).astype(np.uint8))
        blocks = packed.reshape(E, N, K // 32, 16)
        scales = scale.reshape(K // 32, E, N).transpose(1, 2, 0)
        return blocks, np.ascontiguousarray(scales)

    def _write_oai_checkpoint(self, qc, tmp_path):
        """Serialize a compressed tiny gpt-oss bundle in the OAI release
        layout (dense tensors f32 so logit parity is storage-noise-free)."""
        import json

        from safetensors.numpy import save_file

        cfg = qc.module.cfg
        p = qc.variables["params"]
        quant = qc.variables["quant"]
        E = cfg.num_experts
        def T(x):  # contiguous transpose: safetensors writes raw buffers
            return np.ascontiguousarray(np.asarray(x, np.float32).T)

        sd = {"model.embed_tokens.weight":
              np.asarray(p["embed_tokens"]["embedding"], np.float32),
              "model.norm.weight": np.asarray(p["final_norm"]["scale"],
                                              np.float32),
              "lm_head.weight": T(p["lm_head"]["kernel"])}
        for i in range(cfg.num_layers):
            lp = p[f"layers_{i}"]
            L = f"model.layers.{i}."
            for n in ("q_proj", "k_proj", "v_proj", "o_proj"):
                sd[L + f"self_attn.{n}.weight"] = T(
                    lp["attn"][n]["kernel"])
                sd[L + f"self_attn.{n}.bias"] = np.asarray(
                    lp["attn"][n]["bias"], np.float32)
            sd[L + "self_attn.sinks"] = np.asarray(lp["attn"]["sinks"],
                                                   np.float32)
            sd[L + "input_layernorm.weight"] = np.asarray(
                lp["input_norm"]["scale"], np.float32)
            sd[L + "post_attention_layernorm.weight"] = np.asarray(
                lp["post_attn_norm"]["scale"], np.float32)
            sd[L + "mlp.router.weight"] = T(lp["moe"]["router"]["kernel"])
            sd[L + "mlp.router.bias"] = np.asarray(
                lp["moe"]["router"]["bias"], np.float32)
            gb = np.asarray(lp["moe"]["gate_proj"]["bias"], np.float32)
            ub = np.asarray(lp["moe"]["up_proj"]["bias"], np.float32)
            gub = np.empty((E, gb.shape[1] * 2), np.float32)
            gub[:, 0::2], gub[:, 1::2] = gb, ub
            sd[L + "mlp.experts.gate_up_proj_bias"] = gub
            sd[L + "mlp.experts.down_proj_bias"] = np.asarray(
                lp["moe"]["down_proj"]["bias"], np.float32)
            lq = quant[f"layers_{i}"]["moe"]
            gB, gS = self._unfold_to_oai(
                np.asarray(lq["gate_proj"]["qweight"]["data"]),
                np.asarray(lq["gate_proj"]["qweight"]["scale"]), E)
            uB, uS = self._unfold_to_oai(
                np.asarray(lq["up_proj"]["qweight"]["data"]),
                np.asarray(lq["up_proj"]["qweight"]["scale"]), E)
            I2 = gB.shape[1] * 2
            guB = np.empty((E, I2, *gB.shape[2:]), np.uint8)
            guB[:, 0::2], guB[:, 1::2] = gB, uB
            guS = np.empty((E, I2, gS.shape[2]), np.uint8)
            guS[:, 0::2], guS[:, 1::2] = gS, uS
            sd[L + "mlp.experts.gate_up_proj_blocks"] = guB
            sd[L + "mlp.experts.gate_up_proj_scales"] = guS
            dB, dS = self._unfold_to_oai(
                np.asarray(lq["down_proj"]["qweight"]["data"]),
                np.asarray(lq["down_proj"]["qweight"]["scale"]), E)
            sd[L + "mlp.experts.down_proj_blocks"] = dB
            sd[L + "mlp.experts.down_proj_scales"] = dS
        # TPU fetches come back F-contiguous and safetensors writes raw
        # buffers — force C order on every tensor (hf_export.py:504 note)
        sd = {k: np.ascontiguousarray(v) for k, v in sd.items()}
        save_file(sd, str(tmp_path / "model.safetensors"))
        config = {
            "model_type": "gpt_oss", "vocab_size": cfg.vocab_size,
            "hidden_size": cfg.hidden_size,
            "num_hidden_layers": cfg.num_layers,
            "num_attention_heads": cfg.num_heads,
            "num_key_value_heads": cfg.kv_heads,
            "head_dim": cfg.dims_per_head,
            "intermediate_size": cfg.intermediate_size,
            "num_local_experts": cfg.num_experts,
            "num_experts_per_tok": cfg.experts_per_token,
            "layer_types": ["sliding_attention", "full_attention"],
            "sliding_window": 8, "rope_theta": 10000.0,
            "rope_scaling": {"rope_type": "yarn", "factor": 4.0,
                             "original_max_position_embeddings": 32},
            "max_position_embeddings": cfg.max_position_embeddings,
            "attention_bias": True, "rms_norm_eps": cfg.norm_eps,
            "tie_word_embeddings": False,
            "quantization_config": {"quant_method": "mxfp4"},
        }
        with open(tmp_path / "config.json", "w") as f:
            json.dump(config, f)

    def test_bit_exact_repack_and_logit_parity(self, tmp_path):
        from modelopt_tpu.models import load_oai_mxfp4_checkpoint

        bundle = self._gptoss_bundle()
        ids = bundle.example_inputs[0]
        q = mtq.quantize(bundle, self.MX_CFG, lambda f: f(ids))
        qc = mtq.compress(q)
        self._write_oai_checkpoint(qc, tmp_path)
        loaded = load_oai_mxfp4_checkpoint(str(tmp_path),
                                           param_dtype=jnp.float32)
        for i in range(2):
            for n in ("gate_proj", "up_proj", "down_proj"):
                ours = loaded.variables["quant"][f"layers_{i}"]["moe"][n][
                    "qweight"]
                ref = qc.variables["quant"][f"layers_{i}"]["moe"][n][
                    "qweight"]
                np.testing.assert_array_equal(np.asarray(ours["data"]),
                                              np.asarray(ref["data"]))
                np.testing.assert_array_equal(np.asarray(ours["scale"]),
                                              np.asarray(ref["scale"]))
                assert "kernel" not in loaded.variables["params"][
                    f"layers_{i}"]["moe"].get(n, {})
        ref_lg = _logits(qc, ids)
        got_lg = _logits(loaded, ids)
        np.testing.assert_allclose(got_lg, ref_lg, rtol=2e-4, atol=2e-4)


class TestPreQuantScale:
    """AWQ/SmoothQuant smoothing scales must round-trip: the exported
    weights carry the folded inverse, so a checkpoint without
    pre_quant_scale computes unscaled (showed up as ~4.5 logit error vs
    ~0.1 fp16-storage noise before the fix)."""

    def test_w4a8_awq_roundtrip(self, tmp_path):
        bundle = lm_bundle()
        ids = bundle.example_inputs[0]
        q = mtq.quantize(bundle, mtq.W4A8_INT8_DYNAMIC_CFG, lambda f: f(ids))
        state = export_hf_checkpoint(q, str(tmp_path))
        key = "model.layers.0.mlp.down_proj.pre_quant_scale"
        assert key in state, [k for k in state if "layers.0.mlp" in k]
        orig = np.asarray(
            q.variables["quant"]["layers_0"]["mlp"]["down_proj"][
                "input_quantizer"]["pre_quant_scale"], np.float32).reshape(-1)
        np.testing.assert_allclose(state[key].astype(np.float32), orig,
                                   rtol=1e-3, atol=1e-3)
        loaded = load_quantized_checkpoint(str(tmp_path),
                                           param_dtype=jnp.float32)
        got = np.asarray(
            loaded.variables["quant"]["layers_0"]["mlp"]["down_proj"][
                "input_quantizer"]["pre_quant_scale"], np.float32)
        np.testing.assert_allclose(got, orig.astype(np.float16), rtol=1e-3)
        l1, l2 = _logits(q, ids), _logits(loaded, ids)
        np.testing.assert_allclose(l2, l1, rtol=0.15, atol=0.15)

    def test_moe_awq_pre_quant_scale(self, tmp_path):
        bundle = lm_bundle(num_experts=4, experts_per_token=2)
        ids = bundle.example_inputs[0]
        q = mtq.quantize(bundle, mtq.INT4_AWQ_CFG, lambda f: f(ids))
        state = export_hf_checkpoint(q, str(tmp_path))
        key = "model.layers.0.block_sparse_moe.experts.1.w2.pre_quant_scale"
        assert key in state
        loaded = load_quantized_checkpoint(str(tmp_path),
                                           param_dtype=jnp.float32)
        moe_q = loaded.variables["quant"]["layers_0"]["moe"]["down_proj"]
        assert "pre_quant_scale" in moe_q["input_quantizer"]
        l1, l2 = _logits(q, ids), _logits(loaded, ids)
        np.testing.assert_allclose(l2, l1, rtol=0.15, atol=0.15)

    def test_phi_fused_w4a8_roundtrip(self, tmp_path):
        from modelopt_tpu.models import Decoder, tiny_test_config

        cfg = tiny_test_config(fused_qkv=True, fused_gate_up=True,
                               dtype=jnp.float32)
        m = Decoder(cfg)
        ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 16)),
                          jnp.int32)
        v = jax.jit(m.init)(jax.random.PRNGKey(0), ids)
        b = ModelBundle(module=m, variables=dict(v), example_inputs=(ids,))
        q = mtq.quantize(b, mtq.W4A8_INT8_DYNAMIC_CFG, lambda f: f(ids))
        state = export_hf_checkpoint(q, str(tmp_path))
        # fused projections export packed (their name-map entries were
        # missing: fused models silently dropped attention/MLP weights)
        assert "model.layers.0.self_attn.qkv_proj.weight" in state
        assert "model.layers.0.mlp.gate_up_proj.weight" in state
        loaded = load_quantized_checkpoint(str(tmp_path),
                                           param_dtype=jnp.float32)
        assert "qweight" in loaded.variables["quant"]["layers_0"]["attn"][
            "qkv_proj"]
        l1, l2 = _logits(q, ids), _logits(loaded, ids)
        np.testing.assert_allclose(l2, l1, rtol=0.15, atol=0.15)
