"""Neural architecture search — import as ``mtn``
(reference: modelopt/torch/nas/)."""

from .search import Hparam, convert, export, profile, search, search_space

__all__ = ["Hparam", "convert", "export", "profile", "search", "search_space"]
