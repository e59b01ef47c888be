"""Quantization-aware training utilities.

QAT in this framework is just training a quantized bundle: fake-quant ops
carry straight-through estimators (fake_quant.py), so ``jax.grad`` through a
PHASE_QUANT apply is already QAT (reference counterpart: QATTrainer,
plugins/transformers_trainer.py:186, and the STE autograd fns
tensor_quant.py:291-317).

This module adds:
  * make_qat_step — a jitted train step over a quantized bundle (optionally
    with LSQ-style trainable amax);
  * qat_finetune — a minimal training loop (reference: llm_qat
    simple_qat_train.py);
  * QAD — quantization-aware distillation against the unquantized teacher
    (reference: QADTrainer, transformers_trainer.py:414).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..core.bundle import PHASE_QUANT, ModelBundle
from ..utils.evaluate import lm_cross_entropy


def _amax_mask(quant_tree):
    """Pytree of bools: True for amax leaves (LSQ-trainable)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: any(
            getattr(k, "key", None) and str(getattr(k, "key")).startswith("amax")
            for k in path
        ),
        quant_tree,
    )


def make_qat_step(
    bundle: ModelBundle,
    tx: optax.GradientTransformation,
    loss_fn: Optional[Callable] = None,
    learn_amax: bool = False,
):
    """Returns (init_state, step) where step(state, batch) -> (state, loss).

    state = (params, quant, opt_state). ``learn_amax=True`` enables
    LSQ-style learned ranges: amax leaves in the quant collection receive
    gradients (the fake-quant scale path is differentiable); other quant
    state stays frozen (reference: lsq mode, model_calib.py:2296).
    """
    apply_fn = bundle.make_fn(phase=PHASE_QUANT)
    rest = {k: v for k, v in bundle.variables.items() if k not in ("params", "quant")}
    quant0 = bundle.variables.get("quant", {})

    if loss_fn is None:

        def loss_fn(logits, batch):
            logits = logits[0] if isinstance(logits, tuple) else logits
            return lm_cross_entropy(logits[:, :-1], batch[:, 1:])

    def full_loss(params, quant, batch):
        out = apply_fn({"params": params, "quant": quant, **rest}, batch)
        return loss_fn(out, batch)

    mask = _amax_mask(quant0) if learn_amax else None

    def init_state():
        params = bundle.variables["params"]
        if learn_amax:
            opt_state = tx.init((params, quant0))
        else:
            opt_state = tx.init(params)
        return (params, quant0, opt_state)

    @jax.jit
    def step(state, batch):
        params, quant, opt_state = state
        if learn_amax:
            loss, grads = jax.value_and_grad(full_loss, argnums=(0, 1))(
                params, quant, batch
            )
            gq = jax.tree.map(
                lambda g, m: g if m else jnp.zeros_like(g), grads[1], mask
            )
            updates, opt_state = tx.update((grads[0], gq), opt_state, (params, quant))
            params, quant = optax.apply_updates((params, quant), updates)
        else:
            loss, grads = jax.value_and_grad(full_loss)(params, quant, batch)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
        return (params, quant, opt_state), loss

    return init_state, step


def qat_finetune(
    bundle: ModelBundle,
    batches,
    learning_rate: float = 1e-4,
    learn_amax: bool = False,
    loss_fn: Optional[Callable] = None,
) -> tuple[ModelBundle, list]:
    """Minimal QAT loop; returns (finetuned bundle, losses)."""
    tx = optax.adamw(learning_rate)
    init_state, step = make_qat_step(bundle, tx, loss_fn=loss_fn, learn_amax=learn_amax)
    state = init_state()
    losses = []
    for batch in batches:
        state, loss = step(state, batch)
        losses.append(float(loss))
    params, quant, _ = state
    return (
        bundle.replace(variables={**bundle.variables, "params": params, "quant": quant}),
        losses,
    )


def make_qad_loss(
    student: ModelBundle, teacher: ModelBundle, alpha: float = 0.5,
    temperature: float = 2.0,
):
    """Quantization-aware distillation loss: CE + KD from the (typically
    unquantized) teacher (reference: QADTrainer)."""
    from ..distill.losses import logits_distillation_loss

    s_apply = student.make_fn(phase=PHASE_QUANT)
    t_apply = teacher.make_fn()
    t_rest = teacher.variables

    def loss(params, quant, batch):
        rest = {k: v for k, v in student.variables.items() if k not in ("params", "quant")}
        s_out = s_apply({"params": params, "quant": quant, **rest}, batch)
        s_logits = s_out[0] if isinstance(s_out, tuple) else s_out
        t_out = t_apply(t_rest, batch)
        t_logits = t_out[0] if isinstance(t_out, tuple) else t_out
        ce = lm_cross_entropy(s_logits[:, :-1], batch[:, 1:])
        kd = logits_distillation_loss(s_logits, jax.lax.stop_gradient(t_logits), temperature)
        return alpha * ce + (1 - alpha) * kd

    return loss
