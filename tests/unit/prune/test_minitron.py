"""Minitron pruning tests (reference analogue:
tests/gpu_megatron minitron tests, on the native decoder instead)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import modelopt_tpu.prune as mtp
import modelopt_tpu.quant as mtq
from modelopt_tpu.core import ModelBundle
from modelopt_tpu.models import Decoder, tiny_test_config
from modelopt_tpu.utils import perplexity, synthetic_token_batches


def lm_bundle(**over):
    cfg = tiny_test_config(dtype=jnp.float32, **over)
    m = Decoder(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (4, 32)), jnp.int32)
    variables = m.init(jax.random.PRNGKey(0), ids)
    return ModelBundle(module=m, variables=dict(variables), example_inputs=(ids,)), cfg


class TestMinitron:
    def test_importances_shapes(self):
        bundle, cfg = lm_bundle()
        imps = mtp.estimate_importances(bundle)
        assert imps["kv_groups"].shape == (2, 2)
        assert imps["ffn"].shape == (2, cfg.intermediate_size)
        assert imps["hidden"].shape == (cfg.hidden_size,)
        assert imps["layers"].shape == (2,)

    def test_ffn_prune(self):
        bundle, cfg = lm_bundle()
        p = mtp.prune(bundle, constraints={"intermediate_size": 64})
        assert p.module.cfg.intermediate_size == 64
        k = p.variables["params"]["layers_0"]["mlp"]["gate_proj"]["kernel"]
        assert k.shape == (cfg.hidden_size, 64)
        logits, _ = p.apply(*bundle.example_inputs)
        assert logits.shape[-1] == cfg.vocab_size

    def test_kv_group_prune(self):
        bundle, cfg = lm_bundle()
        p = mtp.prune(bundle, constraints={"num_kv_heads": 1})
        assert p.module.cfg.num_kv_heads == 1
        assert p.module.cfg.num_heads == 2  # G=2 preserved
        logits, _ = p.apply(*bundle.example_inputs)
        assert np.isfinite(np.asarray(logits)).all()

    def test_layer_drop(self):
        bundle, cfg = lm_bundle()
        p = mtp.prune(bundle, constraints={"num_layers": 1})
        assert p.module.cfg.num_layers == 1
        assert "layers_1" not in p.variables["params"]
        logits, _ = p.apply(*bundle.example_inputs)
        assert np.isfinite(np.asarray(logits)).all()

    def test_hidden_prune(self):
        bundle, cfg = lm_bundle()
        p = mtp.prune(bundle, constraints={"hidden_size": 32})
        assert p.variables["params"]["embed_tokens"]["embedding"].shape[1] == 32
        logits, _ = p.apply(*bundle.example_inputs)
        assert np.isfinite(np.asarray(logits)).all()

    def test_combined_prune_better_than_random(self):
        """Importance-pruned FFN should hurt perplexity less than pruning
        the *least* important channels (sanity of the ranking)."""
        bundle, cfg = lm_bundle(intermediate_size=128)
        batches = synthetic_token_batches(cfg.vocab_size, 2, 4, 32)
        imps = mtp.estimate_importances(bundle)
        good = mtp.prune(bundle, constraints={"intermediate_size": 96})
        # adversarial: invert importances
        import modelopt_tpu.prune.minitron as M

        inv = dict(imps)
        orig = M.estimate_importances
        try:
            M.estimate_importances = lambda *a, **k: {
                **imps, "ffn": -imps["ffn"],
            }
            bad = mtp.prune(bundle, constraints={"intermediate_size": 96})
        finally:
            M.estimate_importances = orig
        ppl_good = perplexity(good, batches)
        ppl_bad = perplexity(bad, batches)
        assert ppl_good <= ppl_bad * 1.05

    def test_prune_then_quantize(self):
        bundle, cfg = lm_bundle()
        p = mtp.prune(bundle, constraints={"intermediate_size": 64})
        ids = bundle.example_inputs[0]
        q = mtq.quantize(p, mtq.INT8_DEFAULT_CFG, lambda f: f(ids))
        logits, _ = q.apply(ids)
        assert np.isfinite(np.asarray(logits)).all()


class TestMambaPruning:
    """Mamba-head pruning on hybrid models (reference: mcore_minitron
    mamba_num_heads/mamba_head_dim pruning + hybrid layer handling)."""

    def _bundle(self):
        import numpy as np

        from modelopt_tpu.models import tiny_hybrid_test_config

        cfg = tiny_hybrid_test_config(dtype=jnp.float32,
                                      param_dtype=jnp.float32)
        m = Decoder(cfg)
        ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 16)),
                          jnp.int32)
        v = m.init(jax.random.PRNGKey(0), ids)
        return ModelBundle(module=m, variables=dict(v),
                           example_inputs=(ids,))

    def test_mamba_head_prune_runs_and_decodes(self):
        import numpy as np

        from modelopt_tpu.models import make_cache

        bundle = self._bundle()
        ids = bundle.example_inputs[0]
        pruned = mtp.minitron_prune(bundle, {"mamba_num_heads": 2})
        cfg = pruned.module.cfg
        assert cfg.mamba_num_heads == 2
        mix = pruned.variables["params"]["layers_0"]["mixer"]
        d_in = 2 * cfg.mamba_head_dim
        assert mix["A_log"].shape == (2,)
        assert mix["out_proj"]["kernel"].shape[0] == d_in
        assert mix["in_proj"]["kernel"].shape[1] == (
            2 * d_in + 2 * cfg.mamba_groups * cfg.mamba_state_dim + 2)
        logits, _ = pruned.apply(ids)
        assert np.isfinite(np.asarray(logits)).all()
        # pruned hybrid still decodes exactly (step == full forward)
        cache = make_cache(cfg, 2, 32)
        fn = jax.jit(pruned.make_fn())
        outs = []
        for t in range(ids.shape[1]):
            lg, cache = fn(pruned.variables, ids[:, t:t + 1], cache)
            outs.append(np.asarray(lg[:, 0]))
        np.testing.assert_allclose(
            np.stack(outs, axis=1), np.asarray(logits),
            rtol=2e-3, atol=2e-3)

    def test_mamba_prune_keeps_important_heads(self):
        import numpy as np

        bundle = self._bundle()
        imps = mtp.estimate_importances(bundle)
        assert imps["mamba_heads"] is not None
        assert set(imps["mamba_heads"]) == {0, 2}  # the M layers
        assert imps["mamba_heads"][0].shape == (4,)

    def test_depth_prune_reslices_hybrid_pattern(self):
        import numpy as np

        bundle = self._bundle()
        pruned = mtp.minitron_prune(bundle, {"num_layers": 2})
        cfg = pruned.module.cfg
        assert cfg.num_layers == 2
        assert len(cfg.hybrid_pattern) == 2
        ids = bundle.example_inputs[0]
        logits, _ = pruned.apply(ids)
        assert np.isfinite(np.asarray(logits)).all()
