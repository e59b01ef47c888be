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


def build_layer_libraries(cfg, donors=()) -> list:
    """PER-LAYER candidate libraries, family-aware (the reference's
    per-architecture replacement-library descriptors —
    puzzletron/build_library_and_stats.py builds a library per subblock
    from the parent's architecture). Layer kinds get different knobs:

      * mamba mixers (hybrid-SSM): keep | full bypass (head-count surgery
        is Minitron's global knob; per-layer the honest options are
        keep/drop);
      * MoE layers (qwen3-moe / gpt-oss class): attention knobs + expert
        bypass (no_mlp) — FFN-slicing doesn't apply to routed experts;
      * dense attention+MLP (llama class): the full knob set
        (attention removal, FFN fractions, KV-group halving, bypass).

    Entry 0 of every layer's list is "keep"."""
    libs = []
    ffns = sorted(
        {max(1, (3 * cfg.intermediate_size) // 4),
         max(1, cfg.intermediate_size // 2),
         max(1, cfg.intermediate_size // 4)},
        reverse=True,
    )
    for i in range(cfg.num_layers):
        opts_i = cfg.layer_opts(i)
        is_moe = cfg.num_experts > 0 and i >= cfg.first_k_dense \
            and "ffn" not in opts_i
        if cfg.is_mamba(i):
            lib = [(), (("bypass", True),)]
        elif is_moe:
            lib = [()]
            if "no_attn" not in opts_i:
                lib.append((("no_attn", True),))
                if cfg.kv_heads > 1:
                    lib.append((("kv", max(1, cfg.kv_heads // 2)),))
            lib.append((("no_mlp", True),))
            lib.append((("no_attn", True), ("no_mlp", True)))
        else:
            lib = [()]
            has_attn = "no_attn" not in opts_i
            has_mlp = "no_mlp" not in opts_i
            if has_attn:
                lib.append((("no_attn", True),))
                if cfg.kv_heads > 1:
                    lib.append((("kv", max(1, cfg.kv_heads // 2)),))
            if has_mlp:
                for f in ffns:
                    lib.append((("ffn", f),))
            if has_attn and has_mlp:
                lib.append((("no_attn", True), ("ffn", ffns[1])))
            lib.append((("no_attn", True), ("no_mlp", True)))
        for name in donors:
            lib.append((("donor", name),))
        libs.append(lib)
    return libs


def _opts_from_layer(layer: dict, cfg, i: int = -1) -> tuple:
    """Derive the runtime layer_plan entry from sewed params — donor layers
    of any compatible geometry are described by their actual shapes.
    Non-geometry opts of the ORIGINAL plan (window/chunk/rope flags) are
    preserved; MoE layers keep their routed block (params hold 'moe', not
    'mlp' — deriving no_mlp for them would silently drop every expert)."""
    keep = {}
    if i >= 0:
        keep = {k: v for k, v in cfg.layer_opts(i).items()
                if k not in ("no_attn", "no_mlp", "ffn", "kv")}
    opts = list(keep.items())
    if "attn" not in layer and "mixer" not in layer:
        opts.append(("no_attn", True))
    elif "attn" in layer:
        kh = layer["attn"]["k_proj"]["kernel"].shape[1] // cfg.dims_per_head
        if kh != cfg.kv_heads:
            opts.append(("kv", int(kh)))
    if "mlp" not in layer and "moe" not in layer:
        opts.append(("no_mlp", True))
    elif "mlp" in layer:
        first = next(n for n in ("gate_proj", "up_proj", "fc_in")
                     if n in layer["mlp"])
        inter = layer["mlp"][first]["kernel"].shape[1]
        if inter != cfg.intermediate_size:
            opts.append(("ffn", int(inter)))
    return tuple(opts)


def _replace_layer(layer: dict, entry: tuple, ffn_keep, kv_keep, donors) -> dict:
    """Apply one library entry to one layer's params."""
    opts = dict(entry)
    if "donor" in opts:
        return donors[opts["donor"]]
    layer = dict(layer)
    if opts.get("bypass"):
        # full identity layer: drop every subblock (incl. a mamba mixer)
        for k in ("attn", "mixer", "mlp", "moe", "input_norm",
                  "post_attn_norm"):
            layer.pop(k, None)
        return layer
    if opts.get("no_attn"):
        layer.pop("attn", None)
        if "mixer" not in layer:
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
        layer.pop("moe", None)
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
    new_pattern = list(cfg.hybrid_pattern or "")
    for i, entry in enumerate(plan):
        dd = {
            name: p[f"layers_{i}"] for name, p in donor_params.items()
            if f"layers_{i}" in p
        }
        layer = _replace_layer(params[f"layers_{i}"], entry, ffn_keep[i],
                               kv_keep[i], dd)
        params[f"layers_{i}"] = layer
        if cfg.is_mamba(i) and "mixer" not in layer:
            # bypassed mamba layer: the pattern must stop claiming a mixer
            new_pattern[i] = "*"
        new_plan.append(_opts_from_layer(layer, cfg, i))
    new_cfg = dataclasses.replace(
        cfg, layer_plan=tuple(new_plan),
        hybrid_pattern="".join(new_pattern) if new_pattern else None)
    return bundle.replace(
        module=Decoder(new_cfg), variables={**bundle.variables, "params": params}
    )


def _params_count(tree) -> int:
    return sum(x.size for x in jax.tree.leaves(tree))


def collect_block_io(bundle: ModelBundle, data=None):
    """One teacher forward capturing every block's input/output hidden
    states — the activation statistics the local scorer consumes
    (reference frame: puzzletron's stats pipeline records per-subblock
    activations once, then scores every library entry against them)."""
    ids = data if data is not None else bundle.example_inputs[0]
    cfg = bundle.module.cfg
    with bundle.contexts():
        _, st = bundle.module.apply(
            bundle.variables, ids, capture_intermediates=True,
            mutable=["intermediates"])
    inter = st["intermediates"]
    x_in = inter["embed_tokens"]["__call__"][0]
    if cfg.scale_embeddings:
        x_in = x_in * jnp.asarray(cfg.hidden_size ** 0.5, x_in.dtype)
    ins, outs = [], []
    for i in range(cfg.num_layers):
        x_out = inter[f"layers_{i}"]["__call__"][0][0]
        ins.append(x_in)
        outs.append(x_out)
        x_in = x_out
    return ins, outs


def _score_layer_local(bundle, i, layer, x_in, x_out):
    """Relative MSE of the replaced BLOCK's output against the teacher
    block's output on captured activations — one tiny block forward per
    candidate instead of a full-model forward (the reference's
    activation-based subblock scoring; output-KL of the final plan is
    still reported by puzzle_search)."""
    from ..models.transformer import Block

    cfg = bundle.module.cfg
    opts = _opts_from_layer(layer, cfg, i)
    pattern = cfg.hybrid_pattern
    if cfg.is_mamba(i) and "mixer" not in layer:
        pattern = pattern[:i] + "*" + pattern[i + 1:]
    plan = tuple(opts if j == i else cfg.layer_opts(j).items()
                 for j in range(cfg.num_layers))
    cfg2 = dataclasses.replace(
        cfg, layer_plan=tuple(tuple(p) for p in plan),
        hybrid_pattern=pattern)
    B, T, _ = x_in.shape
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None],
                                 (B, T))
    kpos = positions[:, None, :]
    mask = jnp.where(kpos <= positions[:, :, None], 0.0,
                     -1e9).astype(jnp.float32)
    y, _ = Block(cfg2, layer_index=i).apply({"params": layer}, x_in,
                                            positions, mask, None)
    num = jnp.mean((y.astype(jnp.float32) - x_out.astype(jnp.float32)) ** 2)
    den = jnp.maximum(jnp.mean(x_out.astype(jnp.float32) ** 2), 1e-9)
    return float(num / den)


def build_library_and_stats(bundle: ModelBundle, constraints=None,
                            donors=None, data=None, path=None):
    """Phase-1 pipeline (reference: puzzletron/build_library_and_stats.py
    then mip/run_puzzle.py): build the per-layer replacement libraries,
    score every entry locally on captured activations, and attach the MIP
    cost columns (params / deploy memory / modeled decode latency).
    Returns the stats dict; ``path`` also writes it as JSON so the search
    phase is resumable without re-scoring."""
    import json

    cfg = bundle.module.cfg
    L = cfg.num_layers
    donors = donors or {}
    constraints = constraints or {}
    deployment = constraints.get("deployment", {})
    libs = build_layer_libraries(cfg, donors=tuple(donors))
    imps = estimate_importances(bundle)
    ffn_keep = {i: _top_idx(imps["ffn"][i], cfg.intermediate_size)
                for i in range(L)}
    kv_keep = {i: _top_idx(imps["kv_groups"][i], cfg.kv_heads)
               for i in range(L)}
    ins, outs = collect_block_io(bundle, data)
    donor_params = {n: d.variables["params"] for n, d in donors.items()}

    scores, costs, mem, lat = [], [], [], []
    for i in range(L):
        base_layer = bundle.variables["params"][f"layers_{i}"]
        srow, crow, mrow, lrow = [], [], [], []
        for o, entry in enumerate(libs[i]):
            ent = dict(entry)
            if "donor" in ent and f"layers_{i}" not in donor_params.get(
                    ent["donor"], {}):
                srow.append(1e9)
                crow.append(_params_count(base_layer))
                m0, l0 = _layer_deploy_costs(base_layer, cfg, deployment)
                mrow.append(m0)
                lrow.append(l0)
                continue
            dd = {n: p[f"layers_{i}"] for n, p in donor_params.items()
                  if f"layers_{i}" in p}
            layer = _replace_layer(base_layer, entry, ffn_keep[i],
                                   kv_keep[i], dd)
            srow.append(0.0 if o == 0 else _score_layer_local(
                bundle, i, layer, ins[i], outs[i]))
            crow.append(_params_count(layer))
            m, la = _layer_deploy_costs(layer, cfg, deployment)
            mrow.append(m)
            lrow.append(la)
        scores.append(srow)
        costs.append(crow)
        mem.append(mrow)
        lat.append(lrow)

    stats = {
        "library": [[list(map(list, e)) for e in lib] for lib in libs],
        "scores": scores, "costs": costs, "mem": mem, "lat": lat,
        "num_layers": L,
        "scoring": "local_block_mse",
    }
    if path is not None:
        with open(path, "w") as f:
            json.dump(stats, f)
    return stats


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
    stats=None,
    scoring: str = "kl",
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
    (anymodel stitching).

    ``scoring="local"`` (or a precomputed ``stats`` dict / JSON path from
    ``build_library_and_stats``) switches to per-layer family-aware
    libraries scored by block-local activation MSE — one tiny block
    forward per candidate instead of a full-model forward, the
    reference's stats-pipeline shape. ``scoring="kl"`` (default) keeps
    the original whole-model output-KL scoring.

    Returns (sewed bundle, info)."""
    import json

    cfg = bundle.module.cfg
    L = cfg.num_layers
    donors = donors or {}
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
    layer_params = [
        _params_count(bundle.variables["params"][f"layers_{i}"]) for i in range(L)
    ]

    if stats is not None or scoring == "local":
        if isinstance(stats, str):
            with open(stats) as f:
                stats = json.load(f)
        if stats is None:
            stats = build_library_and_stats(bundle, constraints,
                                            donors=donors)
        libs = [[tuple(tuple(p) for p in e) for e in lib]
                for lib in stats["library"]]
        omax = max(len(lib) for lib in libs)
        scores = np.full((L, omax), 1e9)
        costs = np.zeros((L, omax))
        mem = np.zeros((L, omax))
        lat = np.zeros((L, omax))
        for i in range(L):
            n = len(libs[i])
            scores[i, :n] = stats["scores"][i]
            costs[i, :n] = stats["costs"][i]
            mem[i, :n] = stats["mem"][i]
            lat[i, :n] = stats["lat"][i]
            # padding columns: keep-cost, huge score — never chosen but
            # budget-feasible in the solver
            costs[i, n:] = stats["costs"][i][0]
            mem[i, n:] = stats["mem"][i][0]
            lat[i, n:] = stats["lat"][i][0]
        lib_of = lambda i, o: libs[i][min(o, len(libs[i]) - 1)]  # noqa: E731
    else:
        lib = library or build_replacement_library(cfg, donors=tuple(donors))
        scores = np.zeros((L, len(lib)))
        costs = np.zeros((L, len(lib)))
        mem = np.zeros((L, len(lib)))
        lat = np.zeros((L, len(lib)))
        for i in range(L):
            for o, entry in enumerate(lib):
                if o == 0:
                    costs[i, o] = layer_params[i]
                    mem[i, o], lat[i, o] = _layer_deploy_costs(
                        bundle.variables["params"][f"layers_{i}"], cfg,
                        deployment)
                    continue
                if dict(entry).get("donor") and f"layers_{i}" not in donor_paramset(
                    donors, dict(entry)["donor"]
                ):
                    scores[i, o] = 1e9  # donor has no such layer
                    costs[i, o] = layer_params[i]
                    mem[i, o], lat[i, o] = mem[i, 0], lat[i, 0]
                    continue
                plan = tuple(entry if j == i else () for j in range(L))
                cand = sew(bundle, plan, ffn_keep, kv_keep, donors)
                layer = cand.variables["params"][f"layers_{i}"]
                scores[i, o] = kl_of(cand)
                costs[i, o] = _params_count(layer)
                mem[i, o], lat[i, o] = _layer_deploy_costs(layer, cfg,
                                                           deployment)
        lib_of = lambda i, o: lib[o]  # noqa: E731

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
    plan = tuple(lib_of(i, choice[i]) for i in range(L))
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
