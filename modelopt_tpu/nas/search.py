"""NAS search over decoder width/depth hyperparameters.

The reference discovers searchable dims by torch.fx tracing + DynamicModule
class swaps (reference: modelopt/torch/nas/search_space.py:38,
trace/tracer.py:33, prune/fastnas.py:80 BinarySearcher, nas/autonas.py:483
EvolveSearcher). Neither tracing nor module surgery is needed here: our
decoders declare their dimensions in DecoderConfig, subnets are produced by
importance-ranked pytree slicing (prune/minitron.py), and searchers are
plain loops over configs.

Searchers:
  * "binary" (FastNAS): per-hparam binary search for the smallest value
    whose score stays within ``score_tolerance`` of the base score;
  * "evolve" (AutoNAS): mutation-based search maximizing score under a
    parameter-count constraint;
  * "random": baseline sampler.
"""

from __future__ import annotations

import dataclasses
import random as _random
from typing import Callable, Optional

import jax

from ..core.bundle import ModelBundle, apply_mode
from ..core.mode import ModeDescriptor, ModeRegistry
from ..prune.minitron import minitron_prune

NASModeRegistry = ModeRegistry("nas")


@dataclasses.dataclass
class Hparam:
    """A searchable dimension (reference: opt/hparam.py:56).

    ``tied``: names of other hparams that must take this hparam's value —
    the reference's cross-hparam tying (e.g. per-layer FFN widths driven by
    one controller). ``importance``: optional per-slice importance scores
    consumed by the pruning/slicing backend (minitron uses activation
    importances; register a callable for a custom operator, reference
    hparam.py importance registration)."""

    name: str
    choices: tuple
    active: object = None
    importance: Optional[object] = None
    tied: tuple = ()

    def __post_init__(self):
        if self.active is None:
            self.active = max(self.choices)

    def resolve_importance(self, *args, **kwargs):
        if callable(self.importance):
            return self.importance(*args, **kwargs)
        return self.importance


def expand_tied(assignment: dict, space: dict) -> dict:
    """Propagate controller values to their tied hparams."""
    out = dict(assignment)
    for name, val in assignment.items():
        hp = space.get(name)
        if hp is not None:
            for t in hp.tied:
                out.setdefault(t, val)
    return out


def _divisors_down(n: int, min_frac: float = 0.25, step_frac: float = 0.125):
    vals = sorted(
        {max(1, int(n * f)) for f in
         [min_frac + i * step_frac for i in range(int((1 - min_frac) / step_frac) + 1)]}
        | {n}
    )
    return tuple(vals)


def _decoder_space(cfg) -> dict:
    return {
        "intermediate_size": Hparam(
            "intermediate_size", _divisors_down(cfg.intermediate_size), cfg.intermediate_size
        ),
        "num_kv_heads": Hparam(
            "num_kv_heads",
            tuple(range(1, cfg.kv_heads + 1)),
            cfg.kv_heads,
        ),
        "num_layers": Hparam(
            "num_layers", tuple(range(max(1, cfg.num_layers // 2), cfg.num_layers + 1)),
            cfg.num_layers,
        ),
    }


def _vit_space(vcfg) -> dict:
    """CV dims (reference: FastNAS CV search space). Depth choices keep the
    llava feature tap reachable; patch kernel size is stride-coupled and
    therefore not a subnet dim (prune/vit.py docstring)."""
    min_l = max(1, vcfg.num_layers // 2)
    if vcfg.select_layer is not None and vcfg.select_layer < 0:
        min_l = max(min_l, -vcfg.select_layer)
    return {
        "vit_intermediate_size": Hparam(
            "vit_intermediate_size", _divisors_down(vcfg.intermediate_size),
            vcfg.intermediate_size,
        ),
        "vit_num_layers": Hparam(
            "vit_num_layers", tuple(range(min_l, vcfg.num_layers + 1)),
            vcfg.num_layers,
        ),
    }


def search_space(bundle: ModelBundle) -> dict[str, Hparam]:
    """Searchable hparams of a decoder / ViT / VLM bundle
    (reference: generate_search_space, nas/search_space.py:193)."""
    from ..models.vit import VisionTransformer
    from ..models.vlm import VLM

    module = bundle.module
    if isinstance(module, VLM):
        # vision-tower dims only: the language half prunes via minitron on
        # the language bundle (activation importances need a text loader)
        return _vit_space(module.cfg.vision)
    if isinstance(module, VisionTransformer):
        return _vit_space(module.cfg)
    return _decoder_space(module.cfg)


@NASModeRegistry.register
class FastNASMode(ModeDescriptor):
    name = "fastnas"

    def convert(self, bundle, config):
        return bundle, {"search_space": {
            k: list(v.choices) for k, v in search_space(bundle).items()
        }}

    def config_from_dict(self, d):
        return d or {}

    def config_to_dict(self, c):
        return c or {}


def convert(bundle: ModelBundle, mode: str = "fastnas", config=None) -> ModelBundle:
    """(reference: mtn.convert)"""
    return apply_mode(bundle, mode, config or {})


def profile(bundle: ModelBundle, measure_latency: bool = False,
            batch: int = 1, seq_len: int = 32, iters: int = 8) -> dict:
    """Constraint metrics of a bundle (reference: nas/algorithms.py:593 +
    _deploy/profiling.py:28 measured latency). With ``measure_latency`` the
    forward is jitted and timed with marginal chain timing (two chain
    lengths, data-fetch barriers — the axon-tunnel-safe discipline), so
    search constraints can be REAL device milliseconds, not proxy FLOPs."""
    import time

    import jax.numpy as jnp

    n_params = sum(x.size for x in jax.tree.leaves(bundle.variables.get("params", {})))
    out = {"params": int(n_params), "flops_per_token": int(2 * n_params)}
    if measure_latency:
        ids = jnp.zeros((batch, seq_len), jnp.int32)
        fn = jax.jit(bundle.make_fn())
        summ = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))

        def run(n):
            t0 = time.time()
            o = None
            for _ in range(n):
                o = fn(bundle.variables, ids)
                o = o[0] if isinstance(o, tuple) else o
            float(summ(o))
            return time.time() - t0

        run(1)  # compile
        # median of 3 marginals, clamped positive: a single-shot marginal
        # under host load / tunnel RTT jitter can come out NEGATIVE
        # (observed -2.3 ms in a parallel test run) — a nonsense
        # constraint value that silently corrupts NAS feasibility checks
        samples = []
        for _ in range(3):
            t1 = run(max(2, iters // 4))
            t2 = run(iters + max(2, iters // 4))
            samples.append(1e3 * (t2 - t1) / iters)
        out["latency_ms"] = max(sorted(samples)[1], 1e-3)
    return out


def _subnet(bundle, assignment: dict, forward_loop=None) -> ModelBundle:
    from ..models.vit import VisionTransformer
    from ..models.vlm import VLM

    if isinstance(bundle.module, (VLM, VisionTransformer)):
        from ..prune.vit import vit_prune

        return vit_prune(bundle, assignment)
    return minitron_prune(bundle, assignment, forward_loop)


def search(
    bundle: ModelBundle,
    score_func: Callable[[ModelBundle], float],
    constraints: Optional[dict] = None,
    mode: str = "binary",
    score_tolerance: float = 0.05,
    iterations: int = 20,
    seed: int = 0,
    forward_loop=None,
    checkpoint: Optional[str] = None,
):
    """Search subnets. ``score_func`` returns higher-is-better. Returns
    (best bundle, info dict). (reference: BinarySearcher prune/fastnas.py:80,
    EvolveSearcher nas/autonas.py:483.)

    constraints: {"params": n} and/or {"latency_ms": x} — latency is
    MEASURED per candidate (profile(measure_latency=True), reference
    _deploy/profiling.py) rather than proxied by FLOPs.
    checkpoint: path persisting every evaluated (assignment -> score) so an
    interrupted search resumes without re-scoring (reference:
    searcher.py:268 save/load_search_checkpoint).
    """
    import json
    import os

    constraints = constraints or {}
    space = search_space(bundle)
    base_score = score_func(bundle)
    max_params = constraints.get("params", float("inf"))
    max_latency = constraints.get("latency_ms")

    memo: dict = {}
    if checkpoint and os.path.exists(checkpoint):
        with open(checkpoint) as f:
            memo = json.load(f)

    def _key(a):
        return json.dumps(sorted(a.items()))

    def _save():
        if checkpoint:
            with open(checkpoint, "w") as f:
                json.dump(memo, f)

    def evaluate(a):
        """-> (score, feasible) with checkpoint memoization."""
        k = _key(a)
        if k in memo:
            return tuple(memo[k])
        b = _subnet(bundle, expand_tied(a, space), forward_loop)
        feas = profile(b)["params"] <= max_params
        if feas and max_latency is not None:
            feas = profile(b, measure_latency=True)["latency_ms"] <= max_latency
        s = float(score_func(b)) if feas else float("-inf")
        memo[k] = (s, bool(feas))
        _save()
        return s, feas

    if mode == "binary":
        assignment: dict = {}
        for name, hp in space.items():
            lo, hi = 0, len(hp.choices) - 1  # search smallest passing choice
            best_idx = hi
            while lo < hi:
                mid = (lo + hi) // 2
                s, feas = evaluate({**assignment, name: hp.choices[mid]})
                if feas and s >= base_score * (1 - score_tolerance):
                    best_idx = mid
                    hi = mid
                else:
                    lo = mid + 1
            assignment[name] = hp.choices[best_idx]
        best = _subnet(bundle, expand_tied(assignment, space), forward_loop)
        return best, {"assignment": assignment, "base_score": base_score,
                      "score": score_func(best), **profile(best)}

    rng = _random.Random(seed)

    def random_assignment():
        return {k: rng.choice(hp.choices) for k, hp in space.items()}

    population = []
    for _ in range(max(4, iterations // 4)):
        a = random_assignment()
        s, feas = evaluate(a)
        if feas:
            population.append((s, a))
    if not population:
        raise ValueError("no feasible subnet found under constraints")
    population.sort(key=lambda t: -t[0])

    if mode == "evolve":
        for _ in range(iterations):
            parent = rng.choice(population[: max(1, len(population) // 2)])[1]
            child = dict(parent)
            name = rng.choice(list(space))
            child[name] = rng.choice(space[name].choices)
            s, feas = evaluate(child)
            if feas:
                population.append((s, child))
                population.sort(key=lambda t: -t[0])
                population = population[:16]
    score, assignment = population[0]
    best = _subnet(bundle, expand_tied(assignment, space), forward_loop)
    return best, {"assignment": assignment, "score": score,
                  "base_score": base_score, **profile(best)}


def export(bundle: ModelBundle) -> ModelBundle:
    """Finalize a searched subnet (reference: mtn.export,
    nas/conversion.py:207). Subnets are already materialized by slicing, so
    this only drops the NAS record."""
    records = tuple(r for r in bundle.records if r.mode not in ("fastnas",))
    return bundle.replace(records=records)
