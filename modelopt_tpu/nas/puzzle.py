"""Puzzletron: heterogeneous per-layer architecture search.

The reference's Puzzletron builds a *replacement library* per block
(attention removal, FFN shrink, KV reduction, ...), scores each subblock
replacement, solves a MIP to pick one replacement per layer under a budget,
"sews" the chosen blocks together, and offers *bypassed training* to recover
accuracy of the sewed model (reference: modelopt/torch/puzzletron/ —
mip/run_puzzle.py selection, sewing_kit/ stitching, bypassed-training
tools). Same pipeline on the native decoder:

  1. library: per-layer options over {attention removal, FFN fractions,
     KV-group reduction, full-block bypass} — plus DONOR layers taken from
     another bundle (the reference's anymodel/sewing-kit story: stitch
     subblocks of a different parent into the plan);
  2. scoring: output-KL of the model with ONLY that layer replaced
     (candidates materialized by pytree slicing — no DynamicModules);
  3. selection: scipy-HiGHS MIP minimizing total KL under a parameter
     budget (greedy knapsack fallback);
  4. sewing: slice/drop/graft params once; the runtime ``layer_plan`` is
     DERIVED from the sewed params, so donor layers of any compatible
     geometry run without special cases;
  5. recovery: ``make_recovery_step`` distills the teacher's logits into the
     sewed student, training ONLY the touched layers (bypassed training).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core.bundle import ModelBundle
from ..models.transformer import Decoder
from ..prune.minitron import _top_idx, estimate_importances


def build_replacement_library(cfg, donors=()) -> list:
    """Per-layer candidate options (first = keep). Entries are tuples of
    (knob, value) pairs; ("donor", name) grafts the donor's layer."""
    lib = [()]
    ffns = sorted(  # 3/4, 1/2, 1/4 of intermediate_size
        {max(1, (3 * cfg.intermediate_size) // 4),
         max(1, cfg.intermediate_size // 2),
         max(1, cfg.intermediate_size // 4)},
        reverse=True,
    )
    lib.append((("no_attn", True),))
    for f in ffns:
        lib.append((("ffn", f),))
    if cfg.kv_heads > 1:
        lib.append((("kv", max(1, cfg.kv_heads // 2)),))
    lib.append((("no_attn", True), ("ffn", ffns[1]),))
    lib.append((("no_attn", True), ("no_mlp", True),))  # full bypass
    for name in donors:
        lib.append((("donor", name),))
    return lib


def _opts_from_layer(layer: dict, cfg) -> tuple:
    """Derive the runtime layer_plan entry from sewed params — donor layers
    of any compatible geometry are described by their actual shapes."""
    opts = []
    if "attn" not in layer:
        opts.append(("no_attn", True))
    else:
        kh = layer["attn"]["k_proj"]["kernel"].shape[1] // cfg.dims_per_head
        if kh != cfg.kv_heads:
            opts.append(("kv", int(kh)))
    if "mlp" not in layer:
        opts.append(("no_mlp", True))
    else:
        inter = layer["mlp"]["gate_proj"]["kernel"].shape[1]
        if inter != cfg.intermediate_size:
            opts.append(("ffn", int(inter)))
    return tuple(opts)


def _replace_layer(layer: dict, entry: tuple, ffn_keep, kv_keep, donors) -> dict:
    """Apply one library entry to one layer's params."""
    opts = dict(entry)
    if "donor" in opts:
        return donors[opts["donor"]]
    layer = dict(layer)
    if opts.get("no_attn"):
        layer.pop("attn", None)
        layer.pop("input_norm", None)
    elif "kv" in opts:
        kv_idx = np.sort(kv_keep[: int(opts["kv"])])
        attn = dict(layer["attn"])
        hd = attn["q_proj"]["kernel"].shape[0]
        KH_old = kv_keep.shape[0]
        D = attn["k_proj"]["kernel"].shape[1] // KH_old
        G = attn["q_proj"]["kernel"].shape[1] // (KH_old * D)
        qk = attn["q_proj"]["kernel"].reshape(hd, KH_old, G, D)[:, kv_idx]
        attn["q_proj"] = {**attn["q_proj"], "kernel": qk.reshape(hd, -1)}
        for name in ("k_proj", "v_proj"):
            kk = attn[name]["kernel"].reshape(hd, KH_old, D)[:, kv_idx]
            attn[name] = {**attn[name], "kernel": kk.reshape(hd, -1)}
        ok = attn["o_proj"]["kernel"].reshape(KH_old, G, D, hd)[kv_idx]
        attn["o_proj"] = {**attn["o_proj"], "kernel": ok.reshape(-1, hd)}
        layer["attn"] = attn
    if opts.get("no_mlp"):
        layer.pop("mlp", None)
        layer.pop("post_attn_norm", None)
    elif "ffn" in opts:
        idx = np.sort(ffn_keep[: int(opts["ffn"])])
        mlp = dict(layer["mlp"])
        mlp["gate_proj"] = {**mlp["gate_proj"], "kernel": mlp["gate_proj"]["kernel"][:, idx]}
        mlp["up_proj"] = {**mlp["up_proj"], "kernel": mlp["up_proj"]["kernel"][:, idx]}
        mlp["down_proj"] = {**mlp["down_proj"], "kernel": mlp["down_proj"]["kernel"][idx, :]}
        layer["mlp"] = mlp
    return layer


def sew(bundle: ModelBundle, plan: tuple, ffn_keep=None, kv_keep=None,
        donors=None) -> ModelBundle:
    """Materialize a heterogeneous bundle from a per-layer plan (the
    sewing-kit step). ``donors`` maps name -> donor bundle with the same
    hidden size; its layer i params replace layer i wholesale."""
    cfg = bundle.module.cfg
    params = dict(bundle.variables["params"])
    imps = None
    if ffn_keep is None or kv_keep is None:
        imps = estimate_importances(bundle)
    if ffn_keep is None:
        ffn_keep = {
            i: _top_idx(imps["ffn"][i], cfg.intermediate_size)
            for i in range(cfg.num_layers)
        }
    if kv_keep is None:
        kv_keep = {
            i: _top_idx(imps["kv_groups"][i], cfg.kv_heads)
            for i in range(cfg.num_layers)
        }
    donor_params = {
        name: d.variables["params"] for name, d in (donors or {}).items()
    }
    new_plan = []
    for i, entry in enumerate(plan):
        dd = {
            name: p[f"layers_{i}"] for name, p in donor_params.items()
            if f"layers_{i}" in p
        }
        layer = _replace_layer(params[f"layers_{i}"], entry, ffn_keep[i],
                               kv_keep[i], dd)
        params[f"layers_{i}"] = layer
        new_plan.append(_opts_from_layer(layer, cfg))
    new_cfg = dataclasses.replace(cfg, layer_plan=tuple(new_plan))
    return bundle.replace(
        module=Decoder(new_cfg), variables={**bundle.variables, "params": params}
    )


def _params_count(tree) -> int:
    return sum(x.size for x in jax.tree.leaves(tree))


def _layer_deploy_costs(layer: dict, cfg, deployment: dict):
    """(memory_bytes, decode_latency_ms) of one sewed layer at a deployment
    point — the reference MIP's per-subblock memory/runtime columns
    (reference: puzzletron/mip/run_puzzle.py solves under latency/memory
    budgets, not just parameters). Memory = weights + this layer's KV cache;
    latency = a bandwidth cost model of one decode step (weight-bound
    GEMMs + KV reads at the chip's achievable GB/s — decode on TPU is
    HBM-bound, so bytes/bandwidth is the honest first-order model; swap in
    ``nas.profile(measure_latency=True)`` for measured numbers when a chip
    is attached)."""
    batch = deployment.get("batch", 1)
    seq = deployment.get("seq_len", cfg.max_position_embeddings)
    kv_itemsize = deployment.get("kv_itemsize", 2)
    param_itemsize = deployment.get("param_itemsize", 2)
    gbps = deployment.get("achievable_gbps", 650.0)
    weight_bytes = _params_count(layer) * param_itemsize
    kv_bytes = 0
    if "attn" in layer:
        kh = layer["attn"]["k_proj"]["kernel"].shape[1] // cfg.dims_per_head
        kv_bytes = 2 * batch * seq * kh * cfg.dims_per_head * kv_itemsize
    # one decode step streams the layer's weights once + reads the KV cache
    latency_ms = (weight_bytes + kv_bytes) / (gbps * 1e9) * 1e3
    return float(weight_bytes + kv_bytes), latency_ms


def puzzle_search(
    bundle: ModelBundle,
    constraints: dict,
    forward_loop=None,
    library=None,
    donors=None,
):
    """Multi-budget MIP selection (reference: mip/run_puzzle.py — the
    reference solves per-subblock selection under memory AND runtime
    budgets; same here, with a TPU bandwidth cost model).

    constraints — any combination of:
      "params_ratio": r in (0, 1]    keep <= r of decoder params
      "memory_gb": g                 weights + KV cache at the deployment
                                     point <= g (per chip)
      "latency_ms": t                modeled decode-step latency <= t
      "deployment": {batch, seq_len, kv_itemsize, param_itemsize,
                     achievable_gbps}   the serving point the memory/latency
                                     columns are evaluated at

    ``donors``: {name: ModelBundle} whose layers join the library
    (anymodel stitching). Returns (sewed bundle, info)."""
    cfg = bundle.module.cfg
    L = cfg.num_layers
    donors = donors or {}
    lib = library or build_replacement_library(cfg, donors=tuple(donors))
    ids = bundle.example_inputs[0]
    base_out = bundle.apply(ids)
    base_logits = base_out[0] if isinstance(base_out, tuple) else base_out
    base_lp = jax.nn.log_softmax(base_logits.astype(jnp.float32), -1)
    base_p = jnp.exp(base_lp)

    imps = estimate_importances(bundle, forward_loop)
    ffn_keep = {
        i: _top_idx(imps["ffn"][i], cfg.intermediate_size) for i in range(L)
    }
    kv_keep = {i: _top_idx(imps["kv_groups"][i], cfg.kv_heads) for i in range(L)}

    def kl_of(b):
        out = b.apply(ids)
        logits = out[0] if isinstance(out, tuple) else out
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        return float(jnp.mean(jnp.sum(base_p * (base_lp - lp), -1)))

    deployment = constraints.get("deployment", {})
    scores = np.zeros((L, len(lib)))
    costs = np.zeros((L, len(lib)))
    mem = np.zeros((L, len(lib)))
    lat = np.zeros((L, len(lib)))
    layer_params = [
        _params_count(bundle.variables["params"][f"layers_{i}"]) for i in range(L)
    ]
    for i in range(L):
        for o, entry in enumerate(lib):
            if o == 0:
                costs[i, o] = layer_params[i]
                mem[i, o], lat[i, o] = _layer_deploy_costs(
                    bundle.variables["params"][f"layers_{i}"], cfg, deployment)
                continue
            if dict(entry).get("donor") and f"layers_{i}" not in donor_paramset(
                donors, dict(entry)["donor"]
            ):
                scores[i, o] = 1e9  # donor has no such layer: never chosen
                costs[i, o] = layer_params[i]
                mem[i, o], lat[i, o] = mem[i, 0], lat[i, 0]
                continue
            plan = tuple(entry if j == i else () for j in range(L))
            cand = sew(bundle, plan, ffn_keep, kv_keep, donors)
            layer = cand.variables["params"][f"layers_{i}"]
            scores[i, o] = kl_of(cand)
            costs[i, o] = _params_count(layer)
            mem[i, o], lat[i, o] = _layer_deploy_costs(layer, cfg, deployment)

    total_layer_params = float(sum(layer_params))
    budgets = []
    if "params_ratio" in constraints or not (
            "memory_gb" in constraints or "latency_ms" in constraints):
        budgets.append(
            (costs, constraints.get("params_ratio", 0.75) * total_layer_params))
    if "memory_gb" in constraints:
        budgets.append((mem, constraints["memory_gb"] * 1e9))
    if "latency_ms" in constraints:
        budgets.append((lat, float(constraints["latency_ms"])))

    choice = _solve(scores, budgets)
    plan = tuple(lib[choice[i]] for i in range(L))
    sewed = sew(bundle, plan, ffn_keep, kv_keep, donors)
    return sewed, {
        "plan": [list(map(list, p)) for p in plan],
        "kl_scores": scores.tolist(),
        "params_before": int(total_layer_params),
        "params_after": int(sum(costs[i, choice[i]] for i in range(L))),
        "memory_gb_after": float(sum(mem[i, choice[i]] for i in range(L))) / 1e9,
        "latency_ms_after": float(sum(lat[i, choice[i]] for i in range(L))),
        "model_kl": kl_of(sewed),
    }


def donor_paramset(donors: dict, name: str):
    return donors[name].variables["params"]


def _solve(scores, budgets):
    """One replacement per layer, minimize total KL under every budget in
    ``budgets`` = [(cost_matrix [L, O], limit), ...] (HiGHS MILP; greedy
    best-rate knapsack fallback driven by the most-violated budget).
    (reference: puzzletron/mip/run_puzzle.py multi-budget MIP)"""
    L, O = scores.shape
    try:
        from scipy.optimize import Bounds, LinearConstraint, milp

        c = scores.flatten()
        A_onehot = np.zeros((L, L * O))
        for i in range(L):
            A_onehot[i, i * O : (i + 1) * O] = 1
        cons = [LinearConstraint(A_onehot, 1, 1)]
        for costs, budget in budgets:
            cons.append(LinearConstraint(costs.flatten()[None, :],
                                         -np.inf, budget))
        res = milp(
            c,
            constraints=cons,
            integrality=np.ones(L * O),
            bounds=Bounds(0, 1),
        )
        if res.success:
            return [int(np.argmax(res.x[i * O : (i + 1) * O])) for i in range(L)]
    except Exception:
        pass
    # greedy fallback: fix the most-violated budget with the best
    # KL-per-cost replacement until every budget holds
    choice = [0] * L

    def violation():
        worst = None
        for costs, budget in budgets:
            used = sum(costs[i, choice[i]] for i in range(L))
            if used > budget and (worst is None or used / budget > worst[0]):
                worst = (used / budget, costs)
        return worst

    while (v := violation()) is not None:
        _, costs = v
        best = None
        for i in range(L):
            for o in range(O):
                if costs[i, o] >= costs[i, choice[i]] or scores[i, o] >= 1e9:
                    continue
                rate = (scores[i, o] - scores[i, choice[i]]) / max(
                    costs[i, choice[i]] - costs[i, o], 1e-12
                )
                if best is None or rate < best[0]:
                    best = (rate, i, o)
        if best is None:
            break
        choice[best[1]] = best[2]
    return choice


def make_recovery_step(teacher: ModelBundle, student: ModelBundle, tx,
                       temperature: float = 2.0):
    """Bypassed-training recovery (reference: puzzletron bypassed-training
    tools): distill teacher logits into the sewed student, updating ONLY the
    layers the plan touched (untouched layers and embeddings stay frozen, so
    recovery cannot drift the rest of the network). Returns
    (init_state, step) like the other trainers; state = (params, opt_state).
    """
    import optax

    plan = teacher_plan = student.module.cfg.layer_plan or ()
    del teacher_plan
    touched = {f"layers_{i}" for i, e in enumerate(plan) if e}
    s_params = student.variables["params"]
    train = {k: v for k, v in s_params.items() if k in touched}
    frozen = {k: v for k, v in s_params.items() if k not in touched}
    t_fn = jax.jit(teacher.make_fn())

    def loss_fn(train_params, batch):
        variables = {**student.variables,
                     "params": {**frozen, **train_params}}
        with student.contexts():
            out = student.module.apply(variables, batch)
        logits = out[0] if isinstance(out, tuple) else out
        t_out = t_fn(teacher.variables, batch)
        t_logits = t_out[0] if isinstance(t_out, tuple) else t_out
        t_lp = jax.nn.log_softmax(t_logits.astype(jnp.float32) / temperature, -1)
        s_lp = jax.nn.log_softmax(logits.astype(jnp.float32) / temperature, -1)
        return jnp.mean(jnp.sum(jnp.exp(t_lp) * (t_lp - s_lp), -1))

    def init_state():
        return train, tx.init(train)

    @jax.jit
    def step(state, batch):
        import optax as _o

        params, opt_state = state
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (_o.apply_updates(params, updates), opt_state), loss

    def finalize(state) -> ModelBundle:
        params, _ = state
        return student.replace(
            variables={**student.variables, "params": {**frozen, **params}}
        )

    return init_state, step, finalize
