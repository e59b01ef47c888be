"""W8A8 dynamic int8 GEMM path tests."""

import jax.numpy as jnp
import numpy as np

import modelopt_tpu.quant as mtq
from modelopt_tpu.quant import qtensor as qt
from modelopt_tpu.quant.backends import int8_dynamic_gemm

from tests._test_utils.models import simple_mlp_bundle


def test_int8_dynamic_gemm_accuracy(rng):
    K, N, M = 128, 64, 32
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    packed = qt.quantize_int8(w)
    y = int8_dynamic_gemm(x, packed["data"], packed["scale"], jnp.float32)
    ref = x @ w
    rel = float(jnp.linalg.norm(y - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02  # int8 weights + int8 dynamic acts


def test_compressed_prefill_uses_int8_path(rng):
    """Large-M compressed int8 forward stays accurate (routes through the
    dynamic W8A8 path per the M>256 threshold)."""
    bundle = simple_mlp_bundle(in_dim=128, hidden=128, out=64, batch=512)
    x = bundle.example_inputs[0]
    q = mtq.quantize(bundle, mtq.INT8_DEFAULT_CFG, lambda f: f(x))
    c = mtq.compress(q)
    out = c.apply(x)
    base = bundle.apply(x)
    rel = float(jnp.linalg.norm(out - base) / jnp.linalg.norm(base))
    assert rel < 0.05
    assert np.isfinite(np.asarray(out)).all()
