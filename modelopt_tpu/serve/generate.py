"""One-call generation over the native engine — the TPU counterpart of the
reference's deploy/llm wrapper (reference: modelopt/deploy/llm/generate.py
LLM.generate_tokens :201): build an engine sized to the request batch,
submit everything, drain, return token lists in submission order."""

from __future__ import annotations

from typing import Iterable, Optional

from ..core.bundle import ModelBundle
from .engine import ServingEngine


def generate_tokens(
    bundle: ModelBundle,
    prompts: Iterable[list],
    max_new_tokens: int = 64,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
    min_p: float = 0.0,
    repetition_penalty: float = 1.0,
    presence_penalty: float = 0.0,
    frequency_penalty: float = 0.0,
    eos_id: Optional[int] = None,
    stop_sequences=None,
    engine: Optional[ServingEngine] = None,
    **engine_kwargs,
) -> list:
    """Generate completions for token-list ``prompts``; returns a list of
    output token lists (submission order). Pass ``engine`` to reuse a
    warm engine (compiled programs persist across calls); otherwise one is
    built from ``engine_kwargs`` (max_batch/max_seq_len sized to the
    request set by default)."""
    prompts = [list(map(int, p)) for p in prompts]
    if engine is None:
        longest = max((len(p) for p in prompts), default=1)
        need = longest + max_new_tokens + 1
        default_seq = max(256, 1 << (need - 1).bit_length())
        engine_kwargs.setdefault("max_batch", min(len(prompts), 8) or 1)
        engine_kwargs.setdefault("max_seq_len", default_seq)
        engine = ServingEngine(bundle, **engine_kwargs)
    reqs = [
        engine.submit(
            p, max_new_tokens=max_new_tokens, temperature=temperature,
            top_k=top_k, top_p=top_p, min_p=min_p,
            repetition_penalty=repetition_penalty,
            presence_penalty=presence_penalty,
            frequency_penalty=frequency_penalty,
            eos_id=eos_id, stop_sequences=stop_sequences,
        )
        for p in prompts
    ]
    engine.run()
    return [r.out_tokens for r in reqs]
