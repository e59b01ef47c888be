"""Synthetic compressed-bundle builder tests."""

import jax
import jax.numpy as jnp
import numpy as np

from modelopt_tpu.models import Decoder, make_cache, tiny_test_config
from modelopt_tpu.models.synthetic import build_compressed_bundle


def test_builder_packs_and_runs():
    cfg = tiny_test_config(hidden_size=256, intermediate_size=512,
                           dtype=jnp.float32, fused_qkv=True, fused_gate_up=True)
    m = Decoder(cfg)
    ids = jnp.zeros((2, 8), jnp.int32)
    b = build_compressed_bundle(m, (ids,), "INT4_BLOCKWISE_WEIGHT_ONLY_CFG")
    # kernels replaced by packed qweights
    assert "qweight" in b.variables["quant"]["layers_0"]["mlp"]["down_proj"]
    assert "down_proj" not in b.variables["params"]["layers_0"].get("mlp", {})
    # lm_head excluded by preset -> stays a normal kernel
    assert "kernel" in b.variables["params"]["lm_head"]
    out, _ = b.apply(ids)
    assert np.isfinite(np.asarray(out)).all()
    # records present so the quantize runtime context resolves specs
    assert [r.mode for r in b.records] == ["quantize", "compress"]
    # decode with cache
    cache = make_cache(cfg, 2, 32, dtype=jnp.float32)
    lg, _ = b.apply(ids[:, :1], cache)
    assert lg.shape == (2, 1, cfg.vocab_size)


def test_builder_memory_is_packed():
    cfg = tiny_test_config(hidden_size=256, intermediate_size=512,
                           dtype=jnp.float32)
    m = Decoder(cfg)
    ids = jnp.zeros((2, 8), jnp.int32)
    b = build_compressed_bundle(m, (ids,), "INT4_BLOCKWISE_WEIGHT_ONLY_CFG")
    full = m.init(jax.random.PRNGKey(0), ids)
    nb = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(b.variables))
    nf = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(full))
    assert nb < nf * 0.6


def test_builder_packs_moe_expert_kernels():
    """3-D expert kernels pack through the folded [in, E*out] view (same
    fold as quant/compress.py) and the compressed forward runs."""
    import dataclasses

    from modelopt_tpu.core.tree import get_in

    cfg = dataclasses.replace(tiny_test_config(), num_experts=4,
                              experts_per_token=2)
    m = Decoder(cfg)
    ids = jnp.zeros((2, 8), jnp.int32)
    preset = {"quant_cfg": {
        "*weight_quantizer": {"num_bits": 4, "block_sizes": {-2: 32}},
        "*input_quantizer": {"enable": False},
        "*output_quantizer": {"enable": False},
        "*lm_head*": {"enable": False}, "*router*": {"enable": False},
        "*embed*": {"enable": False}}, "algorithm": "max"}
    b = build_compressed_bundle(m, (ids,), preset)
    qw = get_in(b.variables["quant"], ("layers_0", "moe", "gate_proj",
                                       "qweight"))
    assert qw is not None and qw["data"].shape == (32, 512)
    assert get_in(b.variables["params"],
                  ("layers_0", "moe", "gate_proj", "kernel")) is None
    lg, _ = b.apply(ids)
    assert np.isfinite(np.asarray(lg, np.float32)).all()
