"""Speculative decoding — import as ``mtsp``
(reference: modelopt/torch/speculative/)."""

from .convert import convert
from .decoding import speculative_decode
from .eagle import EagleConfig, EagleModel, make_eagle_train_step
from .medusa import MedusaConfig, MedusaModel, make_medusa_train_step

__all__ = [
    "EagleConfig",
    "EagleModel",
    "MedusaConfig",
    "MedusaModel",
    "convert",
    "make_eagle_train_step",
    "make_medusa_train_step",
    "speculative_decode",
]
