"""AutoQuantize: per-layer mixed-precision format search under an
effective-bits budget (reference: modelopt/torch/quantization/algorithms.py
AutoQuantizeGradientSearcher :1441, AutoQuantizeKLDivSearcher :1783,
LP selection via BaseSearcher.LPS searcher.py:312 — PuLP replaced by
scipy.optimize.milp/HiGHS).

Scoring methods:
  * "gradient": the reference's primary searcher — a second-order Taylor /
    Fisher approximation of the loss change from quantizing each layer:
    score(g, f) = sum((dL/d_out * (out_q - out))^2), with dL/d_out for
    EVERY layer obtained in ONE backward pass via output perturbations
    (reference: algorithms.py:1432 _get_auto_quantize_score). All
    (group, format) scores for a batch are computed inside one jitted call
    — no per-score host syncs.
  * "local" (default): per-group output-MSE proxy on captured activations —
    score(g, f) = ||x_g (Q_f(W_g) - W_g)||^2, cheap (no extra forwards);
  * "kl": KL divergence of model logits with only group g quantized at
    format f vs. unquantized (faithful but #groups x #formats forwards).

Scoring is resumable: pass ``checkpoint`` (a file path) and the computed
scores are persisted after the scoring stage; a rerun with the same groups
and formats skips straight to selection (reference:
opt/searcher.py:268-311 save/load_search_checkpoint).

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


def _default_loss(logits, *args):
    """Next-token NLL for integer-id inputs (the log-likelihood loss the
    Fisher substitution assumes); mean-square energy otherwise."""
    ids = args[0] if args else None
    if ids is not None and jnp.issubdtype(jnp.asarray(ids).dtype, jnp.integer) \
            and ids.ndim >= 2 and ids.shape[-1] > 1:
        from ...utils.evaluate import lm_cross_entropy

        return lm_cross_entropy(logits[:, :-1], ids[:, 1:])
    return jnp.mean(jnp.square(logits.astype(jnp.float32)))


def _gradient_scores(bundle, groups, fmt_cfgs, forward_loop, loss_func,
                     max_tokens: int):
    """scores[g][f] = sum over batches/members of
    sum((grad_out * (x @ (Q_f(W) - W)))^2) — grad_out from one backward
    pass per batch via output perturbations; member scores for ALL formats
    jitted together, one [G, F] device array per batch."""
    from ...core.bundle import PHASE_CAPTURE
    from ...core.tree import flatten_with_paths
    from ...nn.quantizer import output_perturbations

    fwd = bundle.make_fn(phase=PHASE_CAPTURE, mutable=["quant_capture"])
    loss_func = loss_func or _default_loss
    member_meta = [
        [(info.dense_path, info.kernel, int(info.kernel.shape[1]))
         for info in group]
        for group in groups
    ]
    paths = sorted({p for g in member_meta for p, _, _ in g})
    out_feats = {p: f for g in member_meta for p, _, f in g}
    specs_per_fmt = [
        {p: (_weight_spec_of(fmt, p) if fmt is not None else None)
         for p in paths}
        for fmt in fmt_cfgs
    ]

    @jax.jit
    def score_batch(variables, *args):
        lead = args[0].shape[:-1] if args[0].ndim > 1 else args[0].shape
        perturbs = {
            p: jnp.zeros(tuple(lead) + (out_feats[p],), jnp.float32)
            for p in paths
        }

        def f(perturbs):
            with output_perturbations(perturbs):
                out, muts = fwd(variables, *args)
            logits = out[0] if isinstance(out, tuple) else out
            return loss_func(logits, *args), muts

        (_, muts), grads = jax.value_and_grad(f, has_aux=True)(perturbs)
        xs = {}
        for path, val in flatten_with_paths(muts.get("quant_capture", {})):
            vals = val if isinstance(val, tuple) else (val,)
            dense = path.rsplit("/input_quantizer/", 1)[0]
            xs[dense] = jnp.concatenate([v for v in vals], axis=0)

        rows = []
        for group in member_meta:
            row = []
            for fi, _ in enumerate(fmt_cfgs):
                s = jnp.float32(0.0)
                for dense, kernel, _ in group:
                    spec = specs_per_fmt[fi][dense]
                    if spec is None or not spec.enable or dense not in xs:
                        continue
                    x = xs[dense].astype(jnp.float32)
                    g = grads[dense].reshape(-1, grads[dense].shape[-1])
                    n = x.shape[0]
                    if n > max_tokens:
                        stride = n // max_tokens
                        x = x[::stride][:max_tokens]
                        g = g[::stride][:max_tokens]
                    amax = weight_amax_map(kernel, spec)
                    dw = fq_with_amax(kernel, amax, spec) - kernel
                    d = jnp.clip((x @ dw) * g.astype(jnp.float32), -1e10, 1e10)
                    s = s + jnp.sum(jnp.square(d))
                row.append(s)
            rows.append(jnp.stack(row))
        return jnp.stack(rows)  # [G, F]

    totals = None

    def model_fn(*args, **kwargs):
        nonlocal totals
        batch = score_batch(bundle.variables, *args)
        totals = batch if totals is None else totals + batch
        return None

    if forward_loop is not None:
        forward_loop(model_fn)
    elif bundle.example_inputs:
        model_fn(*bundle.example_inputs)
    else:
        raise ValueError("gradient scoring needs a forward_loop or example_inputs")
    return np.asarray(totals, dtype=np.float64)


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
    loss_func=None,
    checkpoint: str | None = None,
):
    """Search per-layer formats, apply the best mixed-precision config, and
    calibrate (reference: mtq.auto_quantize, model_quant.py:269).

    ``method="gradient"`` uses the reference's primary Taylor/Fisher score
    (one backward per calibration batch; ``loss_func(logits, *batch)``
    defaults to next-token NLL). ``checkpoint`` persists scores so an
    interrupted search resumes at the selection stage.

    Returns (quantized bundle, search_state dict).
    """
    import json
    import os

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

    ckpt_key = {
        "groups": [[i.dense_path for i in g] for g in groups],
        "formats": [f if isinstance(f, str) else None for f in quantization_formats],
        "method": method,
    }
    scores = None
    if checkpoint and os.path.exists(checkpoint):
        with open(checkpoint) as f:
            saved = json.load(f)
        if {k: saved.get(k) for k in ckpt_key} == ckpt_key:
            scores = np.asarray(saved["scores"])
    if scores is None:
        if method == "gradient":
            scores = _gradient_scores(bundle, groups, fmt_cfgs, forward_loop,
                                      loss_func, max_tokens)
        else:
            scores = _local_scores(groups, fmt_cfgs)
            if method == "kl":
                scores = _kl_scores(bundle, groups, fmt_cfgs, scores)
        if checkpoint:
            with open(checkpoint, "w") as f:
                json.dump({**ckpt_key, "scores": scores.tolist()}, f)
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
