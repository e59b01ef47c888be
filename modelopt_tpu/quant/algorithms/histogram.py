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


def entropy_amax(x: np.ndarray, num_bits: int = 8, num_bins: int = 2048,
                 stride: int = 1, start_bin: int = 128) -> float:
    """Pick amax minimizing KL(P || Q) between the fp histogram P and its
    quantized coarsening Q — the classic TensorRT entropy calibrator.

    Semantics match the reference scan exactly (reference:
    quantization/calib/histogram.py:210 _compute_amax_entropy): zero-bin
    smoothing (bins[0]=bins[1]), candidate cuts from ``start_bin`` with
    ``stride`` 1, per-chunk averages over *nonzero* bins only, outlier tail
    clipped into the reference density's last bin (not the coarsened one),
    and ties broken toward the LARGEST cut. The per-candidate coarsening is
    vectorized with bincount instead of the reference's Counter loops."""
    absx = np.abs(x).ravel()
    amax0 = float(absx.max()) or 1e-8
    hist, edges = np.histogram(absx, bins=num_bins, range=(0, amax0))
    bins = hist.astype(np.float64)
    bins[0] = bins[1]  # the zero bin carries no scale information
    nlevels = 1 << (num_bits - 1)
    start = max(start_bin, nlevels)
    divergences = []
    with np.errstate(divide="ignore", invalid="ignore"):
        for i in range(start, num_bins + 1, stride):
            p = bins[:i]
            nz = p > 0
            # chunk id per bin: integer form of digitize(range(i),
            # linspace(0, i, nlevels+1)) - 1 — exact because nlevels is a
            # power of two, so every edge i*j/nlevels is float-exact
            dig = (np.arange(i) * nlevels) // i
            sums = np.bincount(dig[nz], weights=p[nz], minlength=nlevels)
            cnts = np.bincount(dig[nz], minlength=nlevels)
            avg = np.divide(sums, cnts, out=np.zeros(nlevels), where=cnts > 0)
            q = np.where(nz, avg[dig], 0.0)
            ref = p.copy()
            ref[-1] += bins[i:].sum()
            rsum, qsum = ref.sum(), q.sum()
            if rsum == 0 or qsum == 0:
                divergences.append(np.inf)
                continue
            pn, qn = ref / rsum, q / qsum
            mask = pn > 0
            ratio = pn[mask] / qn[mask]  # inf where the coarsening dropped mass
            divergences.append(float(np.sum(pn[mask] * np.log(ratio))))
    div = np.asarray(divergences)
    # last argmin: on ties keep the widest range (reference :277)
    last_argmin = len(div) - 1 - int(np.argmin(div[::-1]))
    return float(edges[start + last_argmin * stride])


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
