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
    """A searchable dimension (reference: opt/hparam.py:56)."""

    name: str
    choices: tuple
    active: object = None
    importance: Optional[object] = None

    def __post_init__(self):
        if self.active is None:
            self.active = max(self.choices)


def _divisors_down(n: int, min_frac: float = 0.25, step_frac: float = 0.125):
    vals = sorted(
        {max(1, int(n * f)) for f in
         [min_frac + i * step_frac for i in range(int((1 - min_frac) / step_frac) + 1)]}
        | {n}
    )
    return tuple(vals)


def search_space(bundle: ModelBundle) -> dict[str, Hparam]:
    """Searchable hparams of a decoder bundle
    (reference: generate_search_space, nas/search_space.py:193)."""
    cfg = bundle.module.cfg
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


def profile(bundle: ModelBundle) -> dict:
    """Constraint metrics of a bundle (reference: nas/algorithms.py:593)."""
    n_params = sum(x.size for x in jax.tree.leaves(bundle.variables.get("params", {})))
    cfg = bundle.module.cfg
    flops_per_tok = 2 * n_params  # dense decode approximation
    return {"params": int(n_params), "flops_per_token": int(flops_per_tok)}


def _subnet(bundle, assignment: dict, forward_loop=None) -> ModelBundle:
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
):
    """Search subnets. ``score_func`` returns higher-is-better. Returns
    (best bundle, info dict). (reference: BinarySearcher prune/fastnas.py:80,
    EvolveSearcher nas/autonas.py:483)."""
    constraints = constraints or {}
    space = search_space(bundle)
    base_score = score_func(bundle)
    max_params = constraints.get("params", float("inf"))

    if mode == "binary":
        assignment: dict = {}
        for name, hp in space.items():
            lo, hi = 0, len(hp.choices) - 1  # search smallest passing choice
            best_idx = hi
            while lo < hi:
                mid = (lo + hi) // 2
                cand = _subnet(bundle, {**assignment, name: hp.choices[mid]}, forward_loop)
                s = score_func(cand)
                if s >= base_score * (1 - score_tolerance):
                    best_idx = mid
                    hi = mid
                else:
                    lo = mid + 1
            assignment[name] = hp.choices[best_idx]
        best = _subnet(bundle, assignment, forward_loop)
        return best, {"assignment": assignment, "base_score": base_score,
                      "score": score_func(best), **profile(best)}

    rng = _random.Random(seed)

    def random_assignment():
        return {k: rng.choice(hp.choices) for k, hp in space.items()}

    def feasible(b):
        return profile(b)["params"] <= max_params

    population = []
    for _ in range(max(4, iterations // 4)):
        a = random_assignment()
        b = _subnet(bundle, a, forward_loop)
        if feasible(b):
            population.append((score_func(b), a))
    if not population:
        raise ValueError("no feasible subnet found under constraints")
    population.sort(key=lambda t: -t[0])

    if mode == "evolve":
        for _ in range(iterations):
            parent = rng.choice(population[: max(1, len(population) // 2)])[1]
            child = dict(parent)
            name = rng.choice(list(space))
            child[name] = rng.choice(space[name].choices)
            b = _subnet(bundle, child, forward_loop)
            if feasible(b):
                population.append((score_func(b), child))
                population.sort(key=lambda t: -t[0])
                population = population[:16]
    score, assignment = population[0]
    best = _subnet(bundle, assignment, forward_loop)
    return best, {"assignment": assignment, "score": score,
                  "base_score": base_score, **profile(best)}


def export(bundle: ModelBundle) -> ModelBundle:
    """Finalize a searched subnet (reference: mtn.export,
    nas/conversion.py:207). Subnets are already materialized by slicing, so
    this only drops the NAS record."""
    records = tuple(r for r in bundle.records if r.mode not in ("fastnas",))
    return bundle.replace(records=records)
