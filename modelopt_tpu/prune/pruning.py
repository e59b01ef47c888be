"""mtp.prune entry point (reference: modelopt/torch/prune/pruning.py:31).

Modes:
  * "minitron": activation-importance width/depth pruning of decoders
    (reference: plugins/mcore_minitron.py)
  * "magnitude": data-free variant using weight norms as importances
"""

from __future__ import annotations

from ..core.bundle import ModelBundle
from .minitron import minitron_prune


def prune(
    bundle: ModelBundle,
    mode: str = "minitron",
    constraints: dict | None = None,
    forward_loop=None,
) -> ModelBundle:
    if mode not in ("minitron", "magnitude"):
        raise ValueError(f"unknown prune mode {mode!r}")
    constraints = constraints or {}
    if mode == "magnitude":
        forward_loop = None  # importance falls back to the example batch
    return minitron_prune(bundle, constraints, forward_loop)
