"""GPipe pipeline parallelism: parity with the sequential decoder, gradient
flow (QAT under PP), and composition with dp on a 2x4 mesh.

Reference ambition: PP-tolerant quantization (SURVEY §2.10; the reference
syncs quantizer state across pipeline ranks via ParallelState,
modelopt/torch/utils/distributed.py:341). Here the whole schedule is one
jitted program, so 'sync' is vacuous — parity with the sequential model is
the invariant to pin.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import modelopt_tpu.quant as mtq
from modelopt_tpu.core import ModelBundle
from modelopt_tpu.models import Decoder, tiny_test_config
from modelopt_tpu.parallel import (
    make_mesh,
    pipeline_lm_forward,
    stack_pipeline_stages,
    stage_sharding,
    unstack_pipeline_stages,
)


def _bundle(num_layers=4, seed=0, **over):
    # f32 everywhere: parity failures then mean schedule bugs, not bf16
    # fusion-order rounding noise
    cfg = dataclasses.replace(
        tiny_test_config(), num_layers=num_layers,
        dtype=jnp.float32, param_dtype=jnp.float32, **over,
    )
    module = Decoder(cfg)
    ids = jnp.asarray(
        np.random.default_rng(seed).integers(0, cfg.vocab_size, (8, 16)), jnp.int32
    )
    variables = module.init(jax.random.PRNGKey(seed), ids)
    return ModelBundle(module=module, variables=dict(variables),
                       example_inputs=(ids,)), cfg, ids


def test_stack_roundtrip():
    bundle, cfg, _ = _bundle()
    stacked, rest = stack_pipeline_stages(bundle.variables, cfg.num_layers, 2)
    # leading dims [S, L/S]
    leaf = jax.tree.leaves(stacked)[0]
    assert leaf.shape[:2] == (2, 2)
    back = unstack_pipeline_stages(stacked, rest, cfg.num_layers)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        bundle.variables, back,
    )


@pytest.mark.parametrize("pp,mb", [(4, 4), (8, 8), (2, 4)])
def test_pipeline_matches_sequential(pp, mb):
    bundle, cfg, ids = _bundle(num_layers=8)
    mesh = make_mesh({"pp": pp}, devices=jax.devices()[:pp])
    seq_logits, _ = bundle.apply(ids)

    with mesh:
        pl = pipeline_lm_forward(cfg, bundle.variables, ids, mesh,
                                 num_microbatches=mb)
    np.testing.assert_allclose(
        np.asarray(pl, np.float32), np.asarray(seq_logits, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_pipeline_gradients_flow():
    """QAT under PP: grads reach every stage's weights."""
    bundle, cfg, ids = _bundle(num_layers=4)
    mesh = make_mesh({"pp": 4}, devices=jax.devices()[:4])
    stacked, rest = stack_pipeline_stages(bundle.variables, cfg.num_layers, 4)
    with mesh:
        stacked = stage_sharding(mesh)(stacked)

        def loss(stacked):
            varz = unstack_pipeline_stages(stacked, rest, cfg.num_layers)
            logits = pipeline_lm_forward(cfg, varz, ids, mesh,
                                         num_microbatches=4, stacked=stacked)
            return jnp.mean(jnp.square(logits.astype(jnp.float32)))

        g = jax.grad(loss)(stacked)
    gnorms = [float(jnp.linalg.norm(x.astype(jnp.float32)))
              for x in jax.tree.leaves(g)]
    assert all(np.isfinite(gnorms))
    # every stage's parameters get gradient signal
    stage_norms = jax.tree.map(
        lambda a: jnp.linalg.norm(a.reshape(a.shape[0], -1).astype(jnp.float32), axis=1),
        g,
    )
    per_stage = sum(jax.tree.leaves(stage_norms))
    assert np.all(np.asarray(per_stage) > 0)


def test_pipeline_with_quantized_layers():
    """Fake-quant (NVFP4 dynamic weights) inside the pipelined blocks."""
    from modelopt_tpu.nn.quantizer import quantization_active
    from modelopt_tpu.quant.config import QuantizeConfig

    bundle, cfg, ids = _bundle(num_layers=4)
    # layer-stack projections only: embed/lm_head run replicated outside
    # the pipeline (they are excluded from real presets too)
    cfgq = {
        "quant_cfg": {
            "*": {"enable": False},
            "*proj/weight_quantizer": {"enable": True, "num_bits": 4,
                                       "block_sizes": {0: 16, "type": "dynamic"}},
        },
        "algorithm": None,
    }
    q = mtq.quantize(bundle, cfgq, None)
    seq_logits = q.apply(ids)
    seq_logits = seq_logits[0] if isinstance(seq_logits, tuple) else seq_logits

    mesh = make_mesh({"pp": 4}, devices=jax.devices()[:4])
    qc = QuantizeConfig.from_dict(cfgq)
    with mesh, quantization_active(qc):
        pl = pipeline_lm_forward(cfg, q.variables, ids, mesh, num_microbatches=4)
    np.testing.assert_allclose(
        np.asarray(pl, np.float32), np.asarray(seq_logits, np.float32),
        rtol=3e-2, atol=3e-2,
    )


def test_pipeline_dp_composition():
    """pp=4 x dp=2 mesh: batch replicated logits still match sequential."""
    bundle, cfg, ids = _bundle(num_layers=4)
    mesh = make_mesh({"dp": 2, "pp": 4})
    seq_logits, _ = bundle.apply(ids)
    with mesh:
        pl = pipeline_lm_forward(cfg, bundle.variables, ids, mesh,
                                 num_microbatches=4)
    np.testing.assert_allclose(
        np.asarray(pl, np.float32), np.asarray(seq_logits, np.float32),
        rtol=2e-2, atol=2e-2,
    )
