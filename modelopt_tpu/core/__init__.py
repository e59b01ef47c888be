"""Core optimization framework: mode registry, replayable transform stack,
save/restore. The JAX re-architecture of the reference's ``modelopt.torch.opt``
(reference: modelopt/torch/opt/conversion.py, mode.py, dynamic.py).

Key difference by design: the reference mutates nn.Module classes in place and
records a mode stack as a module attribute; here a model is an immutable
``ModelBundle`` (linen module + variables pytree + records), and every mode is
a pure ``bundle -> bundle`` transform. Replayability falls out of purity.
"""

from .bundle import (
    PHASE_CALIB,
    PHASE_OFF,
    PHASE_QUANT,
    ModelBundle,
    apply_mode,
    modelopt_state,
    restore,
    restore_from_modelopt_state,
    save,
)
from .mode import ModeDescriptor, ModeRegistry, get_mode

__all__ = [
    "PHASE_CALIB",
    "PHASE_OFF",
    "PHASE_QUANT",
    "ModelBundle",
    "ModeDescriptor",
    "ModeRegistry",
    "apply_mode",
    "get_mode",
    "modelopt_state",
    "restore",
    "restore_from_modelopt_state",
    "save",
]
