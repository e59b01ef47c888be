"""Structured pruning — import as ``mtp``
(reference: modelopt/torch/prune/)."""

from .minitron import estimate_importances, minitron_prune
from .pruning import prune
from .vit import vit_prune

__all__ = ["estimate_importances", "minitron_prune", "prune", "vit_prune"]
