"""Quality-evaluation harness: multiple-choice (MMLU-style) accuracy and
text-file perplexity over a (quantized) bundle.

Reference counterpart: examples/llm_eval/ (lm-eval-harness / MMLU
integration). This environment has zero egress, so the harness reads
LOCAL data (mounted MMLU-format CSVs, plain-text corpora) and is
tokenizer-agnostic: pass any ``encode(str) -> list[int]`` callable
(a HF tokenizer's ``__call__`` wrapped, or a test stub).
"""

from __future__ import annotations

import csv
import glob
import os
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.bundle import ModelBundle


def _choice_loglik(bundle: ModelBundle, prompt_ids, choice_ids, max_len: int):
    """Sum log p(choice tokens | prompt) with right-padding to max_len
    (one static shape -> one compiled program for the whole eval)."""
    ids = prompt_ids + choice_ids
    ids = ids[-max_len:]
    n = len(ids)
    pad = max_len - n
    arr = jnp.asarray([ids + [0] * pad], jnp.int32)
    out = bundle.apply(arr)
    logits = out[0] if isinstance(out, tuple) else out
    logp = jax.nn.log_softmax(logits[0, : n - 1].astype(jnp.float32), axis=-1)
    start = n - len(choice_ids) - 1
    tgt = jnp.asarray(ids[start + 1: n], jnp.int32)
    rows = jnp.arange(start, n - 1)
    return float(jnp.sum(logp[rows, tgt]))


def mmlu_rows(data_dir: str, max_rows_per_file: Optional[int] = None):
    """Yield (question, [A, B, C, D], answer_index) from MMLU-format CSVs
    (question, 4 choices, answer letter — the layout of the public MMLU
    test csvs)."""
    for path in sorted(glob.glob(os.path.join(data_dir, "*.csv"))):
        with open(path, newline="", encoding="utf-8", errors="replace") as f:
            for i, row in enumerate(csv.reader(f)):
                if max_rows_per_file is not None and i >= max_rows_per_file:
                    break
                if len(row) < 6:
                    continue
                q, choices, ans = row[0], row[1:5], row[5].strip().upper()
                if ans not in "ABCD":
                    continue
                yield q, choices, "ABCD".index(ans)


def multiple_choice_accuracy(
    bundle: ModelBundle,
    rows: Iterable,
    encode: Callable[[str], list],
    max_len: int = 512,
    max_questions: Optional[int] = None,
) -> dict:
    """Likelihood-ranked multiple choice: pick argmax_c log p(choice_c |
    question) (the lm-eval-harness MMLU protocol). rows yields
    (question, choices, answer_idx)."""
    correct = total = 0
    for q, choices, ans in rows:
        if max_questions is not None and total >= max_questions:
            break
        prompt = encode(f"Question: {q}\nAnswer:")
        scores = [
            _choice_loglik(bundle, list(prompt), list(encode(" " + c)), max_len)
            for c in choices
        ]
        correct += int(int(np.argmax(scores)) == ans)
        total += 1
    return {"accuracy": correct / max(total, 1), "num_questions": total}


def mmlu_accuracy(bundle: ModelBundle, data_dir: str, encode,
                  max_len: int = 512, max_rows_per_file: int = 8) -> dict:
    """MMLU accuracy over mounted CSVs (reference: examples/llm_eval MMLU)."""
    return multiple_choice_accuracy(
        bundle, mmlu_rows(data_dir, max_rows_per_file), encode, max_len
    )
