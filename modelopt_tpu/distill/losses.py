"""Distillation losses (reference: modelopt/torch/distill/losses.py:28,74,199)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def logits_distillation_loss(student_logits, teacher_logits, temperature: float = 1.0):
    """KL(teacher || student) with temperature scaling, scaled by T^2
    (reference: losses.py:28 LogitsDistillationLoss)."""
    t = temperature
    s = jax.nn.log_softmax(student_logits.astype(jnp.float32) / t, axis=-1)
    p = jax.nn.softmax(teacher_logits.astype(jnp.float32) / t, axis=-1)
    logp = jax.nn.log_softmax(teacher_logits.astype(jnp.float32) / t, axis=-1)
    kl = jnp.sum(p * (logp - s), axis=-1)
    return jnp.mean(kl) * (t * t)


def mft_loss(student_logits, teacher_logits, targets, corrective_fraction: float = 0.3):
    """Minifinetuning loss: blend teacher distribution with a corrected one
    that boosts the ground-truth token (reference: losses.py:74 MFTLoss)."""
    p_t = jax.nn.softmax(teacher_logits.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(targets, student_logits.shape[-1], dtype=jnp.float32)
    p_corr = (1 - corrective_fraction) * p_t + corrective_fraction * onehot
    logs = jax.nn.log_softmax(student_logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.sum(p_corr * logs, axis=-1))


def mgd_loss(student_feat, teacher_feat, proj=None):
    """Masked generative distillation on intermediate features, simplified to
    feature-MSE with optional projection (reference: losses.py:199 MGDLoss)."""
    s = student_feat.astype(jnp.float32)
    if proj is not None:
        s = s @ proj
    t = teacher_feat.astype(jnp.float32)
    return jnp.mean((s - t) ** 2)
