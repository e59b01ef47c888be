"""Speculative decoding — import as ``mtsp``
(reference: modelopt/torch/speculative/)."""

from .bench import bench_engine_modes, format_report, random_token_prompts
from .convert import convert
from .decoding import speculative_decode
from .dflash import DFlashConfig, DFlashModel, make_dflash_train_step
from .eagle import (EagleConfig, EagleModel, calibrate_draft_vocab,
                    make_eagle_train_step)
from .medusa import MedusaConfig, MedusaModel, make_medusa_train_step

__all__ = [
    "DFlashConfig",
    "DFlashModel",
    "bench_engine_modes",
    "format_report",
    "random_token_prompts",
    "EagleConfig",
    "EagleModel",
    "MedusaConfig",
    "MedusaModel",
    "convert",
    "make_dflash_train_step",
    "calibrate_draft_vocab",
    "make_eagle_train_step",
    "make_medusa_train_step",
    "speculative_decode",
]
