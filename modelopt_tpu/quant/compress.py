"""Real quantization: replace fp kernels with packed QTensors.

``mtq.compress(bundle)`` (reference: modelopt/torch/quantization/compress.py:196
+ the real_quantize mode, mode.py:165). Eligible 2-D kernels (weight
quantizer enabled + format compressible) are packed via quant/qtensor.py,
deleted from ``params``, and stored in the ``'quant'`` collection as
``qweight`` — QuantDense then routes through the compressed-GEMM dispatch
(quant/backends.py). HBM footprint drops 2-4x and decode becomes
packed-weight-bound."""

from __future__ import annotations

from ..core.bundle import ModelBundle, apply_mode
from ..core.mode import ModeDescriptor
from ..core.tree import del_in, get_in, set_in
from .mode import QuantizeModeRegistry
from .qtensor import compressible_format, quantize_qtensor


def _compress_variables(bundle: ModelBundle):
    from .api import quantizer_specs

    variables = bundle.variables
    compressed = []
    for path, specs in quantizer_specs(bundle):
        if not path.endswith("/weight_quantizer") or not specs:
            continue
        spec = specs[0]
        if not spec.enable:
            continue
        dense_path = path.rsplit("/weight_quantizer", 1)[0]
        kpath = tuple(dense_path.split("/")) + ("kernel",)
        kernel = get_in(variables.get("params", {}), kpath)
        if kernel is None or kernel.ndim not in (2, 3):
            continue
        if kernel.ndim == 3:
            # MoE expert kernels [E, in, out] compress through the FOLDED
            # [in, E*out] view (same fold as calibration — in-dim blocks
            # map 1:1, per-expert scales fall out of distinct columns);
            # QuantEinsum re-associates its einsums so the fold never
            # transposes at inference. Positive-axis (explicit per-expert)
            # specs don't fold.
            axes = tuple(spec.axis or ())
            if spec.block is not None:
                axes = axes + tuple(int(a) for a, _ in spec.block.sizes)
            if any(a >= 0 for a in axes):
                continue
            E, fin, fout = kernel.shape
            kernel = kernel.transpose(1, 0, 2).reshape(fin, E * fout)
        if compressible_format(spec, kernel.shape) is None:
            continue
        qt, fmt = quantize_qtensor(kernel, spec)
        variables = {
            **variables,
            "params": del_in(variables["params"], kpath),
            "quant": set_in(
                variables.get("quant", {}),
                tuple(dense_path.split("/")) + ("qweight",),
                qt,
            ),
        }
        compressed.append(dense_path)
    return variables, compressed


@QuantizeModeRegistry.register
class CompressModeDescriptor(ModeDescriptor):
    name = "compress"

    def convert(self, bundle: ModelBundle, config):
        variables, compressed = _compress_variables(bundle)
        return bundle.replace(variables=variables), {"compressed": compressed}

    def config_from_dict(self, d):
        return d or {}

    def config_to_dict(self, config):
        return config or {}


def compress(bundle: ModelBundle) -> ModelBundle:
    """Pack all eligible quantized weights (reference: compress.py:196)."""
    if not any(r.mode == "quantize" for r in bundle.records):
        raise ValueError("compress() requires a quantized model")
    return apply_mode(bundle, "compress", {})
