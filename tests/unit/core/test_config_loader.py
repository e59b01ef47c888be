"""YAML $import composition + recipe schema tests
(reference analogue: tests/unit/torch/opt config loader tests)."""

import numpy as np
import pytest

from modelopt_tpu.core.config_loader import apply_dotlist, load_config
from modelopt_tpu.recipe import load_recipe, run_recipe


def test_import_composition(tmp_path):
    (tmp_path / "base.yaml").write_text("a: 1\nnested: {x: 1, y: 2}\n")
    (tmp_path / "child.yaml").write_text(
        "$import: base.yaml\nnested: {y: 3}\nb: 2\n"
    )
    cfg = load_config(str(tmp_path / "child.yaml"))
    assert cfg == {"a": 1, "b": 2, "nested": {"x": 1, "y": 3}}


def test_builtin_recipes_load():
    for name in ("llama_fp8", "llama_int4_awq", "llama_nvfp4"):
        r = load_recipe(name)
        assert r.quant_cfg["*lm_head*"] == {"enable": False}
    r = load_recipe("llama_int4_awq")
    assert r.algorithm == {"method": "awq_lite"}
    assert r.quant_cfg["*weight_quantizer"]["num_bits"] == 4


def test_dotlist_overrides():
    r = load_recipe("llama_fp8", ["calib.num_batches=2", "compress=true"])
    assert r.calib.num_batches == 2 and r.compress is True


def test_run_recipe_end_to_end(tmp_path):
    import jax
    import jax.numpy as jnp

    from modelopt_tpu.core import ModelBundle
    from modelopt_tpu.models import Decoder, tiny_test_config

    cfg = tiny_test_config(dtype=jnp.float32)
    m = Decoder(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 16)), jnp.int32)
    variables = m.init(jax.random.PRNGKey(0), ids)
    bundle = ModelBundle(module=m, variables=dict(variables), example_inputs=(ids,))

    r = load_recipe("llama_fp8", [
        "calib.num_batches=2", "calib.batch_size=2", "calib.seq_len=16",
        f"export_dir={tmp_path}/out",
    ])
    q = run_recipe(bundle, r)
    assert "quant" in q.variables
    import os

    assert os.path.exists(tmp_path / "out" / "hf_quant_config.json")


def test_dotlist_parse_types():
    cfg = apply_dotlist({"a": {"b": 1}}, ["a.b=2.5", "c=hello", "d=[1,2]"])
    assert cfg["a"]["b"] == 2.5 and cfg["c"] == "hello" and cfg["d"] == [1, 2]
