"""LoRA / QLoRA tests (reference analogue: tests/unit/torch/peft/)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

import modelopt_tpu.peft as mtpf
import modelopt_tpu.quant as mtq
from modelopt_tpu.core import ModelBundle
from modelopt_tpu.models import Decoder, tiny_test_config
from modelopt_tpu.utils import lm_cross_entropy


def lm_bundle():
    cfg = tiny_test_config(dtype=jnp.float32)
    m = Decoder(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (4, 32)), jnp.int32)
    variables = m.init(jax.random.PRNGKey(0), ids)
    return ModelBundle(module=m, variables=dict(variables), example_inputs=(ids,))


class TestLoRA:
    def test_identity_at_init(self):
        bundle = lm_bundle()
        ids = bundle.example_inputs[0]
        l = mtpf.update_model(bundle, mtpf.LoRAConfig(rank=4))
        assert "lora_a" in l.variables["lora"]["layers_0"]["attn"]["q_proj"]
        base, _ = bundle.apply(ids)
        out, _ = l.apply(ids)
        np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-6)

    def test_train_only_adapters(self):
        bundle = lm_bundle()
        ids = bundle.example_inputs[0]
        l = mtpf.update_model(bundle, mtpf.LoRAConfig(rank=4))
        apply_fn = l.make_fn()
        frozen = {k: v for k, v in l.variables.items() if k != "lora"}

        def loss_fn(lora, batch):
            logits, _ = apply_fn({**frozen, "lora": lora}, batch)
            return lm_cross_entropy(logits[:, :-1], batch[:, 1:])

        tx = optax.adam(1e-2)
        lora = l.variables["lora"]
        opt = tx.init(lora)
        step = jax.jit(lambda lo, o, b: _step(loss_fn, tx, lo, o, b))
        l0 = None
        for _ in range(8):
            lora, opt, loss = step(lora, opt, ids)
            l0 = l0 or float(loss)
        assert float(loss) < l0
        # base params untouched by construction (never in the optimizer)

    def test_merge_lora(self):
        bundle = lm_bundle()
        ids = bundle.example_inputs[0]
        l = mtpf.update_model(bundle, mtpf.LoRAConfig(rank=4, seed=3))
        # perturb b so adapters are non-trivial
        lora = jax.tree_util.tree_map_with_path(
            lambda p, x: x + 0.01 if str(getattr(p[-1], "key", "")) == "lora_b" else x,
            l.variables["lora"],
        )
        l = l.replace(variables={**l.variables, "lora": lora})
        merged = mtpf.merge_lora(l)
        assert "lora" not in merged.variables
        np.testing.assert_allclose(
            np.asarray(merged.apply(ids)[0]), np.asarray(l.apply(ids)[0]),
            rtol=1e-4, atol=1e-5,
        )

    def test_qlora_compressed_base(self):
        bundle = lm_bundle()
        ids = bundle.example_inputs[0]
        q = mtq.quantize(bundle, mtq.INT8_DEFAULT_CFG, lambda f: f(ids))
        c = mtq.compress(q)
        l = mtpf.update_model(c, mtpf.LoRAConfig(rank=4))
        # adapters attach to remaining fp kernels... compressed kernels have
        # no params entry; ensure it still applies and runs
        out, _ = l.apply(ids)
        assert np.isfinite(np.asarray(out)).all()

    def test_qlora_fakequant_base(self):
        bundle = lm_bundle()
        ids = bundle.example_inputs[0]
        q = mtq.quantize(bundle, mtq.NVFP4_DEFAULT_CFG, lambda f: f(ids))
        l = mtpf.update_model(q, mtpf.LoRAConfig(rank=4))
        base, _ = q.apply(ids)
        out, _ = l.apply(ids)
        np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-5)

    def test_disable_enable(self):
        bundle = lm_bundle()
        ids = bundle.example_inputs[0]
        l = mtpf.update_model(bundle, mtpf.LoRAConfig(rank=4))
        lora = jax.tree_util.tree_map_with_path(
            lambda p, x: x + 0.05 if str(getattr(p[-1], "key", "")) == "lora_b" else x,
            l.variables["lora"],
        )
        l = l.replace(variables={**l.variables, "lora": lora})
        off = mtpf.disable_adapters(l)
        np.testing.assert_allclose(
            np.asarray(off.apply(ids)[0]), np.asarray(bundle.apply(ids)[0]), atol=1e-6
        )
        on = mtpf.enable_adapters(off)
        assert not np.allclose(np.asarray(on.apply(ids)[0]), np.asarray(bundle.apply(ids)[0]))


def _step(loss_fn, tx, lora, opt, batch):
    loss, g = jax.value_and_grad(loss_fn)(lora, batch)
    upd, opt = tx.update(g, opt, lora)
    return optax.apply_updates(lora, upd), opt, loss
