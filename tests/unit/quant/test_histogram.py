"""Histogram (percentile/entropy) calibration tests."""

import jax.numpy as jnp
import numpy as np

import modelopt_tpu.quant as mtq
from modelopt_tpu.quant.algorithms.histogram import entropy_amax, percentile_amax

from tests._test_utils.models import simple_mlp_bundle


def outlier_bundle():
    bundle = simple_mlp_bundle(in_dim=32, hidden=64, batch=64)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((64, 32)).astype(np.float32)
    x[0, 0] = 100.0  # single extreme outlier
    return bundle.replace(example_inputs=(jnp.asarray(x),))


def test_percentile_ignores_outlier():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(10000).astype(np.float32)
    x[0] = 1000.0
    a = percentile_amax(x, 99.9)
    assert a < 10  # outlier ignored


def _entropy_amax_bruteforce(x, num_bits=8, num_bins=2048, start_bin=128):
    """Naive per-candidate loop with the published TensorRT-entropy
    semantics (zero-bin smoothing, nonzero-bin chunk averages, tail clipped
    into the reference density, last-argmin tie-break) — the oracle the
    vectorized entropy_amax must match bin-for-bin."""
    absx = np.abs(x).ravel()
    amax0 = float(absx.max())
    hist, edges = np.histogram(absx, bins=num_bins, range=(0, amax0))
    bins = hist.astype(np.float64)
    bins[0] = bins[1]
    nlevels = 1 << (num_bits - 1)
    divs = []
    for i in range(start_bin, num_bins + 1):
        space = np.linspace(0, i, num=nlevels + 1)
        dig = np.digitize(range(i), space) - 1
        dig[bins[:i] == 0] = -1
        counts = np.zeros(nlevels)
        for idx, d in enumerate(dig):
            if d != -1:
                counts[d] += bins[idx]
        from collections import Counter

        for key, val in Counter(dig).items():
            if key != -1:
                counts[key] = counts[key] / val
        q = np.zeros(i)
        for idx, d in enumerate(dig):
            if d != -1:
                q[idx] = counts[d]
        ref = bins[:i].copy()
        ref[-1] += bins[i:].sum()
        pn = ref / ref.sum()
        qn = q / q.sum() if q.sum() else np.zeros(i)
        mask = pn > 0
        with np.errstate(divide="ignore"):
            divs.append(float(np.sum(
                pn[mask] * np.log(pn[mask] / np.where(qn[mask] > 0, qn[mask], 0.0)))))
    divs = np.asarray(divs)
    last_argmin = len(divs) - 1 - int(np.argmin(divs[::-1]))
    return float(edges[start_bin + last_argmin])


def test_entropy_amax_matches_bruteforce_on_spiky_distribution():
    """The vectorized stride-1 scan must pick the identical cut as the
    naive reference-semantics oracle where it matters most: a spiky
    multi-modal distribution whose KL curve has several local minima
    (reference: calib/histogram.py:210-285 scans every bin; the round-3
    implementation stepped 32 bins at a time and missed these)."""
    rng = np.random.default_rng(7)
    x = np.concatenate([
        rng.standard_normal(30000) * 0.5,
        rng.standard_normal(500) * 4.0 + 12.0,   # spike far into the tail
        np.full(20, 40.0),                       # extreme outliers
    ]).astype(np.float32)
    got = entropy_amax(x, num_bits=8)
    want = _entropy_amax_bruteforce(x, num_bits=8)
    assert got == want
    # and the cut clips the outliers but keeps the 12-ish spike
    assert 10.0 < got < 40.0


def test_entropy_amax_clips_when_tail_carries_mass():
    """When the tail has real (binned) mass, the KL scan clips outliers."""
    rng = np.random.default_rng(0)
    x = np.concatenate([
        rng.standard_normal(30000) * 0.5,
        np.abs(rng.standard_normal(2000)) * 8.0,  # continuous tail mass
        np.full(10, 60.0),
    ]).astype(np.float32)
    a = entropy_amax(x, num_bits=8)
    assert 1.0 < a < 60.0


def test_entropy_amax_isolated_outliers_keep_full_range():
    """Reference semantics: if every bin between the mass and isolated
    outliers is empty, all narrower cuts coarsen the clipped tail to zero
    density (KL=inf) and the scan keeps the full range — same choice the
    reference's scan makes (calib/histogram.py:258-262)."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal(20000).astype(np.float32)
    x[:5] = 500.0
    a = entropy_amax(x, num_bits=8)
    assert a == np.float32(500.0)


def test_percentile_calibrate_clips_outlier():
    bundle = outlier_bundle()
    x = bundle.example_inputs[0]
    cfg = dict(mtq.INT8_DEFAULT_CFG)
    cfg["algorithm"] = {"method": "percentile", "percentile": 99.0}
    q = mtq.quantize(bundle, cfg, lambda f: f(x))
    a_pct = float(q.variables["quant"]["fc1"]["input_quantizer"]["amax"])
    q_max = mtq.quantize(bundle, mtq.INT8_DEFAULT_CFG, lambda f: f(x))
    a_max = float(q_max.variables["quant"]["fc1"]["input_quantizer"]["amax"])
    assert a_max == 100.0 and a_pct < 10.0


def test_entropy_calibrate_runs():
    bundle = outlier_bundle()
    x = bundle.example_inputs[0]
    cfg = dict(mtq.INT8_DEFAULT_CFG)
    cfg["algorithm"] = "entropy"
    q = mtq.quantize(bundle, cfg, lambda f: f(x))
    out = q.apply(x)
    assert np.isfinite(np.asarray(out)).all()


def test_nvfp4_headroom_leaves_room():
    import jax.numpy as jnp
    import modelopt_tpu.quant as mtq
    from modelopt_tpu.quant.algorithms.nvfp4_headroom import headroom_amax

    rng = np.random.default_rng(0)
    x = rng.standard_normal((512, 64)).astype(np.float32)
    a = headroom_amax(x, 16, 1.0, 99.99, rho=64.0)
    assert a > np.abs(x).max()  # headroom above the observed max here

    # end-to-end: amax var ends up larger than max-calibrated
    bundle = outlier_bundle()
    xb = bundle.example_inputs[0]
    cfg = dict(mtq.NVFP4_DEFAULT_CFG)
    cfg["algorithm"] = "nvfp4_act_headroom"
    q = mtq.quantize(bundle, cfg, lambda f: f(xb))
    q_max = mtq.quantize(bundle, mtq.NVFP4_DEFAULT_CFG, lambda f: f(xb))
    a_h = float(q.variables["quant"]["fc1"]["input_quantizer"]["amax"])
    a_m = float(q_max.variables["quant"]["fc1"]["input_quantizer"]["amax"])
    assert a_h != a_m
    out = q.apply(xb)
    assert np.isfinite(np.asarray(out)).all()
