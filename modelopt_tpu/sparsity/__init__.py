"""Weight sparsity — import as ``mts``
(reference: modelopt/torch/sparsity/__init__.py)."""

from .magnitude import create_nm_mask
from .sparsification import export_sparse, sparsify
from . import attention_sparsity  # noqa: F401

__all__ = ["create_nm_mask", "export_sparse", "sparsify", "attention_sparsity"]
