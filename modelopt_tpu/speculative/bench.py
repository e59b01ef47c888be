"""Engine-comparative speculative-decoding benchmark.

TPU analogue of the reference's specdec_bench example (reference:
examples/specdec_bench/run.py driving engines, metrics/acceptance_rate.py
AR/acceptance-length, metrics/timing.py tok/s): run the SAME prompts through
the native ServingEngine once per draft architecture and report, per mode,

  * ``tok_s``               — wall-clock output tokens/s for the whole batch
  * ``tokens_per_forward``  — emitted tokens per verify forward (the
                              acceptance length AL; plain decode = 1.0)
  * ``acceptance_rate``     — accepted / proposed draft tokens
  * ``speedup_vs_base``     — tok/s relative to the plain engine

Greedy speculative decoding is LOSSLESS, so with ``check_lossless`` (default)
the harness also asserts every speculative mode emitted exactly the plain
engine's tokens — a per-run correctness audit, not just a unit test.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np

from ..core.bundle import ModelBundle
from ..serve.engine import ServingEngine


def random_token_prompts(n: int, vocab_size: int, min_len: int = 8,
                         max_len: int = 64, seed: int = 0) -> list:
    """Synthetic prompt set (reference: specdec_bench/datasets/random_token.py)."""
    rng = np.random.default_rng(seed)
    return [
        list(map(int, rng.integers(0, vocab_size,
                                   int(rng.integers(min_len, max_len + 1)))))
        for _ in range(n)
    ]


def _is_speculative(bundle: ModelBundle) -> bool:
    from .dflash import DFlashModel
    from .eagle import EagleModel
    from .medusa import MedusaModel

    return isinstance(bundle.module, (MedusaModel, EagleModel, DFlashModel))


def bench_engine_modes(
    bundles: dict,
    prompts: list,
    max_new_tokens: int = 32,
    spec_k: int = 4,
    check_lossless: bool = True,
    base_mode: Optional[str] = None,
    **engine_kwargs,
) -> dict:
    """Run each named bundle through a fresh ServingEngine on ``prompts``.

    ``bundles`` maps mode name -> ModelBundle; bundles whose module is a
    draft architecture (medusa/eagle/dflash) run with ``speculative=spec_k``,
    plain bundles run the ordinary decode path. ``base_mode`` names the
    lossless/speedup reference (default: the first plain bundle).
    Returns {mode: metrics dict}; metrics include the raw engine ``stats``.
    """
    results: dict = {}
    for name, bundle in bundles.items():
        spec = spec_k if _is_speculative(bundle) else 0
        eng = ServingEngine(bundle, speculative=spec, **engine_kwargs)
        reqs = [
            eng.submit(p, max_new_tokens=max_new_tokens) for p in prompts
        ]
        t0 = time.perf_counter()
        eng.run()
        wall = time.perf_counter() - t0
        s = dict(eng.stats)
        n_tokens = sum(len(r.out_tokens) for r in reqs)
        results[name] = {
            "speculative": spec,
            "tokens": n_tokens,
            "wall_s": wall,
            "tok_s": n_tokens / max(wall, 1e-9),
            # per-request acceptance length: decode-phase tokens per
            # (tick, active slot) pair — 1.0 for plain decode
            "tokens_per_forward":
                s["tokens_emitted"] / max(s["decode_slot_steps"], 1),
            "acceptance_rate": s["draft_accepted"] / max(s["draft_proposed"], 1),
            "outputs": [list(r.out_tokens) for r in reqs],
            "stats": s,
        }

    if base_mode is None:
        plain = [n for n, b in bundles.items() if not _is_speculative(b)]
        base_mode = plain[0] if plain else None
    if base_mode is not None:
        base = results[base_mode]
        for name, r in results.items():
            r["speedup_vs_base"] = r["tok_s"] / max(base["tok_s"], 1e-9)
            if check_lossless and name != base_mode:
                for i, (got, want) in enumerate(
                    zip(r["outputs"], base["outputs"])
                ):
                    if got != want:
                        raise AssertionError(
                            f"mode '{name}' is not lossless vs '{base_mode}' "
                            f"on prompt {i}: {got} != {want}"
                        )
    return results


def format_report(results: dict) -> str:
    """Human-readable comparison table."""
    cols = ["mode", "tok/s", "AL (tok/fwd)", "acc rate", "speedup"]
    rows = [cols]
    for name, r in results.items():
        rows.append([
            name,
            f"{r['tok_s']:.1f}",
            f"{r['tokens_per_forward']:.2f}",
            f"{r['acceptance_rate']:.2f}",
            f"{r.get('speedup_vs_base', 1.0):.2f}x",
        ])
    widths = [max(len(row[i]) for row in rows) for i in range(len(cols))]
    return "\n".join(
        "  ".join(c.ljust(w) for c, w in zip(row, widths)) for row in rows
    )
