"""Weight sparsity — import as ``mts``
(reference: modelopt/torch/sparsity/__init__.py)."""

from .magnitude import create_nm_mask
from .sparsification import export_sparse, sparsify
from . import attention_sparsity  # noqa: F401
from . import skip_softmax  # noqa: F401
from .ruler import (RULER_TASKS, RulerDatasetBuilder, RulerTask,
                    calibrate_with_ruler)
from . import vsa  # noqa: F401
from .attention_sparsity import sparsify_attention_vsa
from .vsa import VSAConfig, video_sparse_attention, vsa_stats
from .skip_softmax import (
    SkipSoftmaxConfig,
    calibrate_skip_softmax,
    ruler_needle_batches,
    sparsify_attention_dynamic,
)

__all__ = [
    "SkipSoftmaxConfig",
    "VSAConfig",
    "attention_sparsity",
    "calibrate_skip_softmax",
    "create_nm_mask",
    "export_sparse",
    "ruler_needle_batches",
    "RULER_TASKS",
    "RulerDatasetBuilder",
    "RulerTask",
    "calibrate_with_ruler",
    "skip_softmax",
    "sparsify",
    "sparsify_attention_dynamic",
    "sparsify_attention_vsa",
    "video_sparse_attention",
    "vsa",
    "vsa_stats",
]
