"""Puzzletron-lite: heterogeneous per-layer architecture search.

The reference's Puzzletron builds a *replacement library* per block
(attention removal, FFN shrink, ...), scores each subblock replacement, and
solves a MIP to pick one replacement per layer under a budget, then "sews"
the chosen blocks together (reference: modelopt/torch/puzzletron/,
mip/run_puzzle.py). This is the same pipeline on the native decoder:

  1. library: per-layer options {keep, no_attn, ffn/2, no_attn+ffn/2};
  2. scoring: output-KL of the model with ONLY that layer replaced
     (candidates materialized by pytree slicing — no DynamicModules);
  3. selection: scipy-HiGHS MIP minimizing total KL under a parameter
     budget;
  4. sewing: slice/drop params once and set ``DecoderConfig.layer_plan``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core.bundle import ModelBundle
from ..models.transformer import Decoder
from ..prune.minitron import _top_idx, estimate_importances


def build_replacement_library(cfg) -> list:
    """Per-layer candidate options (first = keep)."""
    half = max(1, cfg.intermediate_size // 2)
    return [
        (),
        (("no_attn", True),),
        (("ffn", half),),
        (("no_attn", True), ("ffn", half)),
    ]


def _materialize(bundle: ModelBundle, plan: tuple, ffn_keep: dict) -> ModelBundle:
    """Slice/drop params per plan; returns a runnable heterogeneous bundle.
    ``ffn_keep[layer]`` = importance-ranked channel indices to keep."""
    cfg = bundle.module.cfg
    params = dict(bundle.variables["params"])
    for i, entry in enumerate(plan):
        opts = dict(entry)
        layer = dict(params[f"layers_{i}"])
        if opts.get("no_attn"):
            layer.pop("attn", None)
            layer.pop("input_norm", None)
        if "ffn" in opts:
            idx = ffn_keep[i][: int(opts["ffn"])]
            mlp = dict(layer["mlp"])
            mlp["gate_proj"] = {**mlp["gate_proj"], "kernel": mlp["gate_proj"]["kernel"][:, idx]}
            mlp["up_proj"] = {**mlp["up_proj"], "kernel": mlp["up_proj"]["kernel"][:, idx]}
            mlp["down_proj"] = {**mlp["down_proj"], "kernel": mlp["down_proj"]["kernel"][idx, :]}
            layer["mlp"] = mlp
        params[f"layers_{i}"] = layer
    new_cfg = dataclasses.replace(cfg, layer_plan=plan)
    return bundle.replace(
        module=Decoder(new_cfg), variables={**bundle.variables, "params": params}
    )


def _params_count(tree) -> int:
    return sum(x.size for x in jax.tree.leaves(tree))


def puzzle_search(
    bundle: ModelBundle,
    constraints: dict,
    forward_loop=None,
    library=None,
):
    """constraints: {"params_ratio": r in (0, 1]} — keep <= r of decoder
    params. Returns (sewed bundle, info). (reference: run_puzzle.py)"""
    cfg = bundle.module.cfg
    L = cfg.num_layers
    lib = library or build_replacement_library(cfg)
    ids = bundle.example_inputs[0]
    base_out = bundle.apply(ids)
    base_logits = base_out[0] if isinstance(base_out, tuple) else base_out
    base_lp = jax.nn.log_softmax(base_logits.astype(jnp.float32), -1)
    base_p = jnp.exp(base_lp)

    imps = estimate_importances(bundle, forward_loop)
    ffn_keep = {
        i: _top_idx(imps["ffn"][i], cfg.intermediate_size) for i in range(L)
    }

    def kl_of(b):
        out = b.apply(ids)
        logits = out[0] if isinstance(out, tuple) else out
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        return float(jnp.mean(jnp.sum(base_p * (base_lp - lp), -1)))

    keep_plan = tuple(() for _ in range(L))
    scores = np.zeros((L, len(lib)))
    costs = np.zeros((L, len(lib)))
    layer_params = [
        _params_count(bundle.variables["params"][f"layers_{i}"]) for i in range(L)
    ]
    for i in range(L):
        for o, entry in enumerate(lib):
            if o == 0:
                costs[i, o] = layer_params[i]
                continue
            plan = tuple(entry if j == i else () for j in range(L))
            cand = _materialize(bundle, plan, ffn_keep)
            scores[i, o] = kl_of(cand)
            costs[i, o] = _params_count(cand.variables["params"][f"layers_{i}"])

    total_layer_params = float(sum(layer_params))
    budget = constraints.get("params_ratio", 0.75) * total_layer_params

    choice = _solve(scores, costs, budget)
    plan = tuple(lib[choice[i]] for i in range(L))
    sewed = _materialize(bundle, plan, ffn_keep)
    return sewed, {
        "plan": [list(map(list, p)) for p in plan],
        "kl_scores": scores.tolist(),
        "params_before": int(total_layer_params),
        "params_after": int(sum(costs[i, choice[i]] for i in range(L))),
        "model_kl": kl_of(sewed),
    }


def _solve(scores, costs, budget):
    L, O = scores.shape
    try:
        from scipy.optimize import Bounds, LinearConstraint, milp

        c = scores.flatten()
        A_onehot = np.zeros((L, L * O))
        for i in range(L):
            A_onehot[i, i * O : (i + 1) * O] = 1
        A_cost = costs.flatten()[None, :]
        res = milp(
            c,
            constraints=[
                LinearConstraint(A_onehot, 1, 1),
                LinearConstraint(A_cost, -np.inf, budget),
            ],
            integrality=np.ones(L * O),
            bounds=Bounds(0, 1),
        )
        if res.success:
            return [int(np.argmax(res.x[i * O : (i + 1) * O])) for i in range(L)]
    except Exception:
        pass
    # greedy fallback: cheapest-score replacements until under budget
    choice = [0] * L
    while sum(costs[i, choice[i]] for i in range(L)) > budget:
        best = None
        for i in range(L):
            for o in range(O):
                if costs[i, o] >= costs[i, choice[i]]:
                    continue
                rate = (scores[i, o] - scores[i, choice[i]]) / max(
                    costs[i, choice[i]] - costs[i, o], 1
                )
                if best is None or rate < best[0]:
                    best = (rate, i, o)
        if best is None:
            break
        choice[best[1]] = best[2]
    return choice
