"""AutoQuantize: per-layer mixed-precision format search under an
effective-bits budget (reference: modelopt/torch/quantization/algorithms.py
AutoQuantizeGradientSearcher :1441, AutoQuantizeKLDivSearcher :1783,
LP selection via BaseSearcher.LPS searcher.py:312 — PuLP replaced by
scipy.optimize.milp/HiGHS).

Scoring methods:
  * "local" (default): per-group output-MSE proxy on captured activations —
    score(g, f) = ||x_g (Q_f(W_g) - W_g)||^2, cheap (no extra forwards);
  * "kl": KL divergence of model logits with only group g quantized at
    format f vs. unquantized (faithful but #groups x #formats forwards).

Fused siblings (q/k/v, gate/up) share one decision variable, mirroring the
reference's grouping rules (algorithms.py:641-657).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ...core.bundle import ModelBundle, apply_mode
from ..config import QuantizeConfig, get_config
from ..qspec import QuantizerSpec
from .capture import (
    capture_inputs,
    fq_with_amax,
    fused_groups,
    quant_linears,
    weight_amax_map,
)


def effective_bits(spec: QuantizerSpec | None) -> float:
    """Weight bits incl. scale overhead (reference: QuantRecipe num_bits)."""
    if spec is None or not spec.enable:
        return 16.0
    if spec.is_fp:
        f = spec.fp_format
        bits = 1.0 + f.exp_bits + f.man_bits
    else:
        bits = float(spec.num_bits)
    if spec.block is not None:
        sizes = dict(spec.block.sizes)
        bsz = next((v for k, v in sizes.items()), 128) or 128
        scale_bits = 8.0 if spec.block.scale_format else 32.0
        bits += scale_bits / bsz
    return bits


def _weight_spec_of(fmt_cfg: QuantizeConfig, dense_path: str):
    specs = fmt_cfg.resolve(dense_path + "/weight_quantizer")
    return specs[0] if specs else None


def _local_scores(groups, fmt_cfgs):
    """scores[g][f] = sum over members of ||x (Q(W)-W)||^2 / ntokens."""
    scores = np.zeros((len(groups), len(fmt_cfgs)))
    for gi, group in enumerate(groups):
        for fi, fmt_cfg in enumerate(fmt_cfgs):
            s = 0.0
            for info in group:
                if fmt_cfg is None:
                    continue  # unquantized: score 0
                spec = _weight_spec_of(fmt_cfg, info.dense_path)
                if spec is None or not spec.enable:
                    continue
                amax = weight_amax_map(info.kernel, spec)
                wq = fq_with_amax(info.kernel, amax, spec)
                diff = (info.x @ (wq - info.kernel)).astype(jnp.float32)
                s += float(jnp.mean(diff**2))
            scores[gi, fi] = s
    return scores


def _solve_selection(scores, bits, weights, budget_bits):
    """Pick one format per group: min total score s.t. weighted avg bits <=
    budget. Binary LP via scipy HiGHS; greedy fallback."""
    G, F = scores.shape
    try:
        from scipy.optimize import Bounds, LinearConstraint, milp

        c = scores.flatten()
        # one-hot per group
        A_onehot = np.zeros((G, G * F))
        for g in range(G):
            A_onehot[g, g * F : (g + 1) * F] = 1
        # bits constraint: sum_g w_g * bits_f x_gf <= budget * sum w_g
        A_bits = (np.repeat(weights, F) * np.tile(bits, G))[None, :]
        res = milp(
            c,
            constraints=[
                LinearConstraint(A_onehot, 1, 1),
                LinearConstraint(A_bits, -np.inf, budget_bits * weights.sum()),
            ],
            integrality=np.ones(G * F),
            bounds=Bounds(0, 1),
        )
        if res.success:
            x = res.x.reshape(G, F)
            return [int(np.argmax(row)) for row in x]
    except Exception:
        pass
    # greedy: start at lowest bits, upgrade best score-reduction per bit
    choice = [int(np.argmin(bits))] * G
    def total_bits(ch):
        return float(sum(weights[g] * bits[ch[g]] for g in range(G)) / weights.sum())
    improved = True
    while improved:
        improved = False
        best = None
        for g in range(G):
            for f in range(len(bits)):
                if bits[f] <= bits[choice[g]]:
                    continue
                new = list(choice)
                new[g] = f
                if total_bits(new) > budget_bits:
                    continue
                gain = (scores[g, choice[g]] - scores[g, f]) / max(
                    weights[g] * (bits[f] - bits[choice[g]]), 1e-9
                )
                if gain > 0 and (best is None or gain > best[0]):
                    best = (gain, g, f)
        if best:
            choice[best[1]] = best[2]
            improved = True
    return choice


def auto_quantize(
    bundle: ModelBundle,
    constraints: dict | None = None,
    quantization_formats=("NVFP4_DEFAULT_CFG", "FP8_DEFAULT_CFG", None),
    forward_loop=None,
    method: str = "local",
    max_tokens: int = 1024,
):
    """Search per-layer formats, apply the best mixed-precision config, and
    calibrate (reference: mtq.auto_quantize, model_quant.py:269).

    Returns (quantized bundle, search_state dict).
    """
    constraints = constraints or {"effective_bits": 4.8}
    budget = float(constraints["effective_bits"])
    fmt_cfgs = [get_config(f) if f is not None else None for f in quantization_formats]

    # capture once on a throwaway quantize attachment (capture phase works on
    # plain bundles thanks to the global phase context)
    captured = capture_inputs(bundle, forward_loop, max_tokens=max_tokens)
    base_cfg = fmt_cfgs[0] if fmt_cfgs[0] is not None else get_config("FP8_DEFAULT_CFG")
    probe = apply_mode(bundle, "quantize", base_cfg)
    infos = quant_linears(probe, captured)
    groups = fused_groups(infos)

    scores = _local_scores(groups, fmt_cfgs)
    if method == "kl":
        scores = _kl_scores(bundle, groups, fmt_cfgs, scores)
    bits = np.asarray([
        effective_bits(_weight_spec_of(f, groups[0][0].dense_path) if f else None)
        for f in fmt_cfgs
    ])
    weights = np.asarray([sum(i.kernel.size for i in g) for g in groups], dtype=float)
    choice = _solve_selection(scores, bits, weights, budget)

    # build the mixed config: per-dense rules from the chosen format
    rules = {"*": {"enable": False}}
    for g, group in enumerate(groups):
        fmt = fmt_cfgs[choice[g]]
        for info in group:
            if fmt is None:
                continue
            for qname in ("weight_quantizer", "input_quantizer", "output_quantizer"):
                specs = fmt.resolve(f"{info.dense_path}/{qname}")
                if specs:
                    rules[f"{info.dense_path}/{qname}"] = specs[0].to_dict()
                else:
                    rules[f"{info.dense_path}/{qname}"] = {"enable": False}
    mixed = QuantizeConfig.from_dict({"quant_cfg": rules, "algorithm": "max"})

    from ..api import calibrate

    out = apply_mode(bundle, "quantize", mixed)
    out = calibrate(out, "max", forward_loop)
    state = {
        "groups": [[i.dense_path for i in g] for g in groups],
        "choice": [int(c) for c in choice],
        "scores": scores.tolist(),
        "achieved_bits": float(
            (weights * bits[np.asarray(choice)]).sum() / weights.sum()
        ),
        "formats": [f if isinstance(f, str) else None for f in quantization_formats],
    }
    return out, state


def _kl_scores(bundle, groups, fmt_cfgs, local_scores):
    """Refine scores with output-KL per (group, format): quantize only that
    group at that format and compare logits on the example batch."""
    if not bundle.example_inputs:
        return local_scores
    ids = bundle.example_inputs[0]
    base_out = bundle.apply(ids)
    base_logits = base_out[0] if isinstance(base_out, tuple) else base_out
    base_lp = jax.nn.log_softmax(base_logits.astype(jnp.float32), -1)
    scores = np.array(local_scores)
    for gi, group in enumerate(groups):
        for fi, fmt in enumerate(fmt_cfgs):
            if fmt is None:
                scores[gi, fi] = 0.0
                continue
            rules = {"*": {"enable": False}}
            for info in group:
                for qname in ("weight_quantizer", "input_quantizer"):
                    specs = fmt.resolve(f"{info.dense_path}/{qname}")
                    rules[f"{info.dense_path}/{qname}"] = (
                        specs[0].to_dict() if specs else {"enable": False}
                    )
            cfg = QuantizeConfig.from_dict({"quant_cfg": rules, "algorithm": "max"})
            from ..api import quantize as _q

            qb = _q(bundle, cfg, None)
            out = qb.apply(ids)
            logits = out[0] if isinstance(out, tuple) else out
            p = jax.nn.softmax(base_logits.astype(jnp.float32), -1)
            lp_q = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            scores[gi, fi] = float(jnp.mean(jnp.sum(p * (base_lp - lp_q), -1)))
    return scores
