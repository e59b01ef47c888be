"""Distillation mode + loss builders
(reference: modelopt/torch/distill/mode.py:46 kd_loss, distillation_model.py:35).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..core.bundle import ModelBundle, apply_mode
from ..core.mode import ModeDescriptor, ModeRegistry
from ..utils.evaluate import lm_cross_entropy
from .losses import logits_distillation_loss

DistillModeRegistry = ModeRegistry("distill")


@dataclasses.dataclass
class DistillConfig:
    teacher: Optional[ModelBundle] = None  # not serialized; re-attach on restore
    criterion: str = "logits_kl"  # "logits_kl" | "mft" | feature specs
    temperature: float = 2.0
    kd_weight: float = 0.5  # balance vs task CE (StaticLossBalancer analogue)
    # intermediate-feature KD: list of (student_module_path, teacher_module_path)
    layer_pairs: tuple = ()

    def to_dict(self):
        return {
            "criterion": self.criterion,
            "temperature": self.temperature,
            "kd_weight": self.kd_weight,
            "layer_pairs": list(map(list, self.layer_pairs)),
        }


@DistillModeRegistry.register
class KDLossMode(ModeDescriptor):
    """Records that this model is a distillation student. The teacher is
    runtime state (too big to serialize into the mode stack — the reference
    also re-supplies it on restore)."""

    name = "kd_loss"

    def convert(self, bundle, config):
        return bundle, {}

    def config_from_dict(self, d):
        return DistillConfig(**{k: v for k, v in d.items() if k != "teacher"})

    def config_to_dict(self, c):
        return c.to_dict() if isinstance(c, DistillConfig) else dict(c)


@DistillModeRegistry.register
class ExportStudentMode(ModeDescriptor):
    name = "export_student"

    def convert(self, bundle, config):
        return bundle, {}


def convert(bundle: ModelBundle, config: DistillConfig) -> ModelBundle:
    """(reference: mtd.convert, distill/distillation.py)"""
    if isinstance(config, dict):
        config = DistillConfig(**config)
    return apply_mode(bundle, "kd_loss", config)


def export_student(bundle: ModelBundle) -> ModelBundle:
    """Drop distillation records (reference: export_student mode)."""
    records = tuple(r for r in bundle.records if r.mode != "kd_loss")
    return bundle.replace(records=records)


def make_kd_loss_fn(student: ModelBundle, config: DistillConfig) -> Callable:
    """Build loss(params, batch) combining task CE + KD terms. Intermediate
    features come from linen capture_intermediates (the hook replacement)."""
    teacher = config.teacher
    assert teacher is not None, "DistillConfig.teacher required to build the loss"
    t_apply = teacher.make_fn()
    use_feats = bool(config.layer_pairs)

    def student_apply(variables, batch):
        with student.contexts():
            if use_feats:
                out, state = student.module.apply(
                    variables, batch, capture_intermediates=True, mutable=["intermediates"]
                )
                return out, state["intermediates"]
            return student.module.apply(variables, batch), None

    def teacher_apply(batch):
        with teacher.contexts():
            if use_feats:
                out, state = teacher.module.apply(
                    teacher.variables, batch,
                    capture_intermediates=True, mutable=["intermediates"],
                )
                return out, state["intermediates"]
            return teacher.module.apply(teacher.variables, batch), None

    def _get_feat(intermediates, path):
        node = intermediates
        for part in path.split("/"):
            node = node[part]
        val = node["__call__"][0]
        return val[0] if isinstance(val, tuple) else val

    def loss_fn(params, batch):
        variables = {**student.variables, "params": params}
        (s_out, s_feats) = student_apply(variables, batch)
        s_logits = s_out[0] if isinstance(s_out, tuple) else s_out
        (t_out, t_feats) = teacher_apply(batch)
        t_logits = t_out[0] if isinstance(t_out, tuple) else t_out
        t_logits = jax.lax.stop_gradient(t_logits)

        ce = lm_cross_entropy(s_logits[:, :-1], batch[:, 1:])
        kd = logits_distillation_loss(s_logits, t_logits, config.temperature)
        total = (1 - config.kd_weight) * ce + config.kd_weight * kd
        if use_feats:
            from .losses import mgd_loss

            for sp, tp in config.layer_pairs:
                sf = _get_feat(s_feats, sp)
                tf = jax.lax.stop_gradient(_get_feat(t_feats, tp))
                total = total + mgd_loss(sf, tf) / len(config.layer_pairs)
        return total

    return loss_fn
