"""Streaming safetensors checkpoint loader: sharded + single-file layouts
(reference counterpart: the sharded checkpoint ingestion behind
examples/hf_ptq.py --model <dir>)."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

from modelopt_tpu.models import LazyStateDict, from_hf, load_hf_checkpoint


def _tiny_llama():
    cfg = transformers.LlamaConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, tie_word_embeddings=False,
    )
    m = transformers.LlamaForCausalLM(cfg)
    m.eval()
    return m, cfg


def _write_sharded(model, cfg, path, shards=3):
    """Write config.json + N safetensors shards + the HF index file."""
    from safetensors.torch import save_file

    sd = {k: v.contiguous() for k, v in model.state_dict().items()}
    keys = sorted(sd)
    per = -(-len(keys) // shards)
    weight_map = {}
    for s in range(shards):
        chunk = keys[s * per : (s + 1) * per]
        if not chunk:
            continue
        fname = f"model-{s + 1:05d}-of-{shards:05d}.safetensors"
        save_file({k: sd[k] for k in chunk}, str(path / fname))
        for k in chunk:
            weight_map[k] = fname
    (path / "model.safetensors.index.json").write_text(
        json.dumps({"weight_map": weight_map})
    )
    (path / "config.json").write_text(json.dumps(cfg.to_dict()))


def test_sharded_checkpoint_matches_in_memory_import(tmp_path):
    model, cfg = _tiny_llama()
    _write_sharded(model, cfg, tmp_path)

    loaded = load_hf_checkpoint(str(tmp_path), param_dtype=jnp.float32)
    direct = from_hf(model)

    ids = jnp.asarray(np.random.default_rng(0).integers(0, 96, (2, 8)), jnp.int32)
    out_l, _ = loaded.apply(ids)
    out_d, _ = direct.apply(ids)
    np.testing.assert_allclose(np.asarray(out_l), np.asarray(out_d),
                               rtol=2e-3, atol=2e-3)
    assert loaded.metadata["checkpoint_path"] == str(tmp_path)


def test_single_file_checkpoint_and_bf16_default(tmp_path):
    from safetensors.torch import save_file

    model, cfg = _tiny_llama()
    save_file({k: v.contiguous() for k, v in model.state_dict().items()},
              str(tmp_path / "model.safetensors"))
    (tmp_path / "config.json").write_text(json.dumps(cfg.to_dict()))

    bundle = load_hf_checkpoint(str(tmp_path))  # default bf16 params
    kernel = bundle.variables["params"]["layers_0"]["attn"]["q_proj"]["kernel"]
    assert kernel.dtype == jnp.bfloat16
    ids = jnp.zeros((1, 4), jnp.int32)
    logits, _ = bundle.apply(ids)
    assert np.isfinite(np.asarray(logits, np.float32)).all()


def test_lazy_state_dict_reads_tensors_on_demand(tmp_path):
    model, cfg = _tiny_llama()
    _write_sharded(model, cfg, tmp_path, shards=2)
    sd = LazyStateDict(str(tmp_path))
    assert "model.embed_tokens.weight" in sd
    t = sd["model.embed_tokens.weight"]
    assert tuple(t.shape) == (96, 32)
    assert len(sd) == len(model.state_dict())


def test_missing_checkpoint_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        LazyStateDict(str(tmp_path))
