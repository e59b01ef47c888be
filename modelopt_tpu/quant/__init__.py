"""Quantization package — import as ``mtq``
(reference: modelopt/torch/quantization/__init__.py).
"""

from .api import (
    CALIB_ALGORITHMS,
    calibrate,
    compute_quantization_mse,
    fold_weight,
    disable_quantizer,
    enable_quantizer,
    max_calibrate,
    print_quant_summary,
    quantize,
    quantizer_specs,
    register_calib_algorithm,
    validate_calibration,
)
from .config import (  # noqa: F401 — preset names re-exported
    FP8_2D_BLOCKWISE_WEIGHT_ONLY_CFG,
    FP8_DEFAULT_CFG,
    FP8_AFFINE_KV_CFG,
    FP8_KV_CFG,
    FP8_PER_CHANNEL_PER_TOKEN_CFG,
    FP8_WEIGHT_ONLY_CFG,
    INT4_AWQ_CFG,
    INT4_AWQ_CLIP_CFG,
    INT4_AWQ_FULL_CFG,
    INT4_BLOCKWISE_WEIGHT_ONLY_CFG,
    INT8_DEFAULT_CFG,
    INT8_SMOOTHQUANT_CFG,
    INT8_WEIGHT_ONLY_CFG,
    KV_CACHE_FP8,
    KV_CACHE_NVFP4,
    MXFP4_DEFAULT_CFG,
    MXFP4_MLP_WEIGHT_ONLY_CFG,
    MXFP6_DEFAULT_CFG,
    MXFP8_DEFAULT_CFG,
    MXINT8_DEFAULT_CFG,
    NVFP4_AWQ_CLIP_CFG,
    NVFP4_AWQ_FULL_CFG,
    NVFP4_AWQ_LITE_CFG,
    NVFP4_DEFAULT_CFG,
    NVFP4_EXPERTS_ONLY_CFG,
    NVFP4_FOUR_OVER_SIX_CFG,
    NVFP4_KV_CFG,
    NVFP4_KV_ROTATE_CFG,
    NVFP4_MLP_ONLY_CFG,
    NVFP4_SVDQUANT_CFG,
    NVFP4_WEIGHT_ONLY_CFG,
    W4A16_NVFP4_CFG,
    W4A8_AWQ_BETA_CFG,
    W4A8_INT8KV_CFG,
    W4A8_INT8_DYNAMIC_CFG,
    W4A8_MXFP4_FP8_CFG,
    W4A8_NVFP4_FP8_CFG,
    INT8_KV_CFG,
    MIXED_MXFP8_NVFP4_EXPERTS_CFG,
    QuantizeConfig,
    choices,
    get_config,
)
from .algorithms.autoquant import auto_quantize, effective_bits
from .compress import compress
from .fake_quant import fake_quantize, reduce_amax
from .qspec import BlockSpec, QuantizerSpec
from . import algorithms  # noqa: F401  (registers smoothquant/awq/mse/gptq/svdquant)
