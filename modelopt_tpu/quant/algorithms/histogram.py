"""Histogram-based amax calibration: percentile and entropy variants
(reference: modelopt/torch/quantization/calib/histogram.py:35,
_compute_amax_entropy :210, _compute_amax_mse :285 — the MSE variant lives
in mse.py here).

Functional recast: instead of stateful per-quantizer histogram buffers, the
capture pass provides activation samples and the amax is computed directly —
same estimator, no mutable calibrator objects.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...core.tree import get_in, set_in
from ..api import max_calibrate, register_calib_algorithm
from .capture import capture_inputs, quant_linears


def percentile_amax(x: np.ndarray, percentile: float) -> float:
    return float(np.percentile(np.abs(x), percentile))


def entropy_amax(x: np.ndarray, num_bits: int = 8, num_bins: int = 2048) -> float:
    """Pick amax minimizing KL(P || Q) between the fp histogram P and its
    quantized coarsening Q — the classic TensorRT entropy calibrator."""
    absx = np.abs(x).ravel()
    amax0 = float(absx.max()) or 1e-8
    hist, edges = np.histogram(absx, bins=num_bins, range=(0, amax0))
    hist = hist.astype(np.float64)
    nlevels = 2 ** (num_bits - 1)
    best_kl, best_amax = np.inf, amax0
    # candidate cut points from 1/16 of the range upward (outliers can
    # stretch the histogram range far beyond the useful mass)
    start = max(nlevels, num_bins // 16)
    for stop in range(start, num_bins + 1, max(1, num_bins // 64)):
        p = hist[:stop].copy()
        p[-1] += hist[stop:].sum()  # clip outliers into the last bin
        if p.sum() == 0:
            continue
        # coarsen to nlevels then expand back
        factor = stop / nlevels
        q = np.zeros(stop)
        for i in range(nlevels):
            lo, hi = int(i * factor), max(int((i + 1) * factor), int(i * factor) + 1)
            chunk = p[lo:hi]
            nz = (chunk > 0).sum()
            if nz:
                q[lo:hi] = np.where(chunk > 0, chunk.sum() / nz, 0)
        pn, qn = p / p.sum(), q / max(q.sum(), 1e-12)
        mask = pn > 0
        kl = float(np.sum(pn[mask] * np.log(pn[mask] / np.maximum(qn[mask], 1e-12))))
        if kl < best_kl:
            best_kl, best_amax = kl, edges[stop]
    return best_amax


def _histogram_calibrate(bundle, forward_loop, method: str, percentile: float,
                         max_tokens: int):
    bundle = max_calibrate(bundle, forward_loop)  # weights + fallback amax
    captured = capture_inputs(bundle, forward_loop, max_tokens=max_tokens)
    variables = bundle.variables
    for info in quant_linears(bundle, captured):
        aspec = info.aspec
        if aspec is None or not aspec.enable or aspec.dynamic:
            continue
        if aspec.block is not None or aspec.axis is not None:
            continue  # static per-tensor only
        qpath = tuple(info.dense_path.split("/")) + ("input_quantizer", "amax")
        if get_in(variables.get("quant", {}), qpath) is None:
            continue
        x = np.asarray(info.x)
        if method == "percentile":
            amax = percentile_amax(x, percentile)
        else:
            nb = aspec.num_bits if not aspec.is_fp else 8
            amax = entropy_amax(x, num_bits=int(nb) if isinstance(nb, int) else 8)
        variables = {
            **variables,
            "quant": set_in(variables["quant"], qpath, jnp.float32(amax)),
        }
    return bundle.replace(variables=variables)


@register_calib_algorithm("percentile")
def percentile_calibrate(bundle, forward_loop=None, percentile: float = 99.9,
                         max_tokens: int = 4096):
    return _histogram_calibrate(bundle, forward_loop, "percentile", percentile, max_tokens)


@register_calib_algorithm("entropy")
def entropy_calibrate(bundle, forward_loop=None, max_tokens: int = 4096):
    return _histogram_calibrate(bundle, forward_loop, "entropy", 99.9, max_tokens)
