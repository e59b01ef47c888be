"""Knowledge distillation — import as ``mtd``
(reference: modelopt/torch/distill/).

The reference wraps student+teacher into a ``DistillationModel`` nn.Module
with forward hooks (distillation_model.py:35). Functionally: a distillation
setup is (student bundle, teacher bundle, criterion) and a pure loss
function; intermediate-layer losses use linen's ``capture_intermediates``
instead of hooks.
"""

from .distillation import (
    DistillConfig,
    convert,
    export_student,
    make_kd_loss_fn,
)
from .losses import logits_distillation_loss, mft_loss, mgd_loss

__all__ = [
    "DistillConfig",
    "convert",
    "export_student",
    "logits_distillation_loss",
    "make_kd_loss_fn",
    "mft_loss",
    "mgd_loss",
]
