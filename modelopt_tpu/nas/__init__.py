"""Neural architecture search — import as ``mtn``
(reference: modelopt/torch/nas/)."""

from .puzzle import (
    build_layer_libraries,
    build_library_and_stats,
    build_replacement_library,
    collect_block_io,
    make_recovery_step,
    puzzle_search,
    sew,
)
from .search import Hparam, convert, export, profile, search, search_space

__all__ = ["Hparam", "build_layer_libraries", "build_library_and_stats",
           "build_replacement_library", "collect_block_io", "convert",
           "export", "make_recovery_step", "profile", "puzzle_search",
           "search", "search_space", "sew"]
