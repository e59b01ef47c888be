"""Calibration-data helpers (reference: modelopt/torch/utils/dataset_utils.py
— get_dataset_dataloader :745, create_forward_loop :1183).

Network-free by default: synthetic batches; when `datasets`/tokenizers are
usable (cached data), real corpora plug into the same API.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional

import jax.numpy as jnp
import numpy as np

from .evaluate import synthetic_token_batches


def create_forward_loop(batches: Iterable) -> Callable:
    """Wrap an iterable of token batches into the forward_loop callable the
    calibration APIs expect (reference: create_forward_loop)."""
    batches = list(batches)

    def forward_loop(model_fn):
        for b in batches:
            model_fn(jnp.asarray(b))

    return forward_loop


def text_file_token_batches(
    path: str,
    tokenizer,
    num_batches: int = 16,
    batch_size: int = 4,
    seq_len: int = 512,
):
    """Tokenize a local text file (one document per line, or raw text) into
    [batch, seq_len] id batches — the offline stand-in for WikiText-2-style
    evaluation sets when a corpus file is mounted (reference:
    examples/llm_eval/ perplexity harness)."""
    with open(path, encoding="utf-8", errors="replace") as f:
        text = f.read()
    ids = tokenizer(text)["input_ids"] if not isinstance(tokenizer, str) else None
    if ids is None:
        raise ValueError("pass a callable tokenizer")
    out = []
    step = batch_size * seq_len
    for off in range(0, len(ids) - step + 1, step):
        chunk = np.asarray(ids[off : off + step], np.int32)
        out.append(jnp.asarray(chunk.reshape(batch_size, seq_len)))
        if len(out) >= num_batches:
            break
    if not out:
        raise ValueError(
            f"{path!r} has {len(ids)} tokens < one {batch_size}x{seq_len} batch"
        )
    return out


def get_dataset_batches(
    name: str = "synthetic",
    vocab_size: int = 32000,
    num_batches: int = 16,
    batch_size: int = 4,
    seq_len: int = 512,
    tokenizer=None,
    seed: int = 0,
):
    """Token batches for calibration. ``name='synthetic'`` needs no network;
    any HF datasets id works when its cache is present and a tokenizer is
    given (reference: get_dataset_dataloader with cnn_dailymail/pile
    defaults)."""
    if name == "synthetic":
        return synthetic_token_batches(vocab_size, num_batches, batch_size, seq_len, seed)
    try:
        import datasets as hfd

        ds = hfd.load_dataset(name, split="train", streaming=False)
    except Exception as e:  # no network / no cache
        raise RuntimeError(
            f"dataset {name!r} unavailable offline ({e}); use name='synthetic'"
        ) from e
    assert tokenizer is not None, "tokenizer required for real datasets"
    out, buf = [], []
    for rec in ds:
        text = rec.get("text") or rec.get("article") or ""
        buf.extend(tokenizer(text)["input_ids"])
        while len(buf) >= batch_size * seq_len:
            chunk = np.asarray(buf[: batch_size * seq_len], np.int32)
            buf = buf[batch_size * seq_len:]
            out.append(jnp.asarray(chunk.reshape(batch_size, seq_len)))
            if len(out) >= num_batches:
                return out
    return out
