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
    """Wrap an iterable of batches into the forward_loop callable the
    calibration APIs expect (reference: create_forward_loop :1183). A batch
    may be a single token array or a tuple of positional model inputs
    (e.g. ``(input_ids, pixel_values)`` for VLMs)."""
    batches = list(batches)

    def forward_loop(model_fn):
        for b in batches:
            if isinstance(b, tuple):
                model_fn(*(jnp.asarray(x) for x in b))
            else:
                model_fn(jnp.asarray(b))

    return forward_loop


def get_max_batch_size(
    bundle=None,
    max_sample_length: int = 512,
    cap: int = 64,
    sample_memory_usage_ratio: float = 1.0,
    _try_batch: Optional[Callable[[int], bool]] = None,
) -> int:
    """Largest calibration batch size that fits device memory (reference:
    dataset_utils.py:996 get_max_batch_size).

    TPU-native recast of the reference's CUDA probe: run one batch under
    jit, read the allocator's per-batch footprint from
    ``device.memory_stats()``, extrapolate a target from free memory, then
    halve until a real forward fits (allocation failures surface as
    ``RESOURCE_EXHAUSTED``). Backends without memory stats (CPU) skip the
    extrapolation and just verify the cap. ``_try_batch`` is injectable for
    tests."""
    import jax

    if _try_batch is None:
        assert bundle is not None, "need a bundle (or _try_batch)"
        fn = jax.jit(bundle.make_fn())

        def _try_batch(b: int) -> bool:
            ids = jnp.full((b, max_sample_length), 100, jnp.int32)
            try:
                out = fn(bundle.variables, ids)
                jax.block_until_ready(out)
                return True
            except Exception as e:  # XlaRuntimeError: RESOURCE_EXHAUSTED
                if "RESOURCE_EXHAUSTED" in str(e) or "Out of memory" in str(e):
                    return False
                raise

    target = cap
    if bundle is not None:
        dev = jax.local_devices()[0]
        stats = dev.memory_stats() or {}
        limit = stats.get("bytes_limit")
        before = stats.get("bytes_in_use")
        if limit and before is not None and _try_batch(1):
            after = (dev.memory_stats() or {}).get("peak_bytes_in_use")
            per_batch = max((after or 0) - before, 1) \
                * sample_memory_usage_ratio
            target = max(int((limit - before) / per_batch), 1)
            target = 1 << (target.bit_length() - 1)  # floor to power of 2
            target = min(target, cap)
    batch = max(target, 1)
    while batch > 1 and not _try_batch(batch):
        batch //= 2
    return batch


def chat_template_batches(
    conversations,
    tokenizer,
    batch_size: int = 4,
    seq_len: int = 512,
    pad_id: int = 0,
):
    """Tokenize chat conversations into fixed-shape [batch, seq_len] id
    batches for calibration (reference: dataset_utils.py chat-template
    handling in get_dataset_dataloader — instruct models must be calibrated
    on templated text, not raw concatenation).

    ``conversations``: iterable of message lists
    (``[{"role": ..., "content": ...}, ...]``). Uses the tokenizer's own
    ``apply_chat_template`` when present; otherwise a plain generic
    template. Sequences are right-padded/truncated to ``seq_len``."""
    rows = []
    for conv in conversations:
        if hasattr(tokenizer, "apply_chat_template"):
            ids = tokenizer.apply_chat_template(conv, tokenize=True)
            if isinstance(ids, dict):
                ids = ids["input_ids"]
        else:
            text = "".join(
                f"<|{m['role']}|>\n{m['content']}\n" for m in conv)
            ids = tokenizer(text)["input_ids"]
        ids = np.asarray(ids, np.int32).ravel()[:seq_len]
        if ids.size < seq_len:
            ids = np.concatenate(
                [ids, np.full(seq_len - ids.size, pad_id, np.int32)])
        rows.append(ids)
    if len(rows) < batch_size:
        raise ValueError(
            f"{len(rows)} conversations < one batch of {batch_size}")
    tail = len(rows) % batch_size
    if tail:
        # pad the final partial batch by repeating the last conversation —
        # dropping calibration samples silently would skew statistics
        rows.extend([rows[-1]] * (batch_size - tail))
    out = []
    for off in range(0, len(rows), batch_size):
        out.append(jnp.asarray(np.stack(rows[off:off + batch_size])))
    return out


def vlm_calib_batches(
    config=None,
    processor=None,
    images=None,
    prompts=None,
    num_batches: int = 8,
    batch_size: int = 2,
    seq_len: int = 16,
    seed: int = 0,
):
    """Image+text calibration batches for the LLaVA-style VLM path
    (reference: dataset_utils.py VLM variants; examples/vlm_ptq). Returns a
    list of ``(input_ids, pixel_values)`` tuples matching the positional
    signature of ``models.vlm.VLM`` — feed through ``create_forward_loop``.

    With a HF ``processor`` plus real images/prompts it tokenizes those;
    otherwise it synthesizes batches from ``config`` (a VLMConfig), which
    is the network-free default of this environment."""
    if processor is not None and images is not None:
        texts = list(prompts) if prompts is not None else [""] * len(images)
        out = []
        for off in range(0, len(images) - batch_size + 1, batch_size):
            enc = processor(
                text=texts[off:off + batch_size],
                images=images[off:off + batch_size],
                return_tensors="np", padding="max_length",
                max_length=seq_len, truncation=True,
            )
            px = np.asarray(enc["pixel_values"], np.float32)
            if px.ndim == 4 and px.shape[1] in (1, 3):  # NCHW -> NHWC
                px = px.transpose(0, 2, 3, 1)
            out.append((jnp.asarray(enc["input_ids"], jnp.int32),
                        jnp.asarray(px)))
            if len(out) >= num_batches:
                break
        return out
    assert config is not None, "need a VLMConfig (or processor+images)"
    rng = np.random.default_rng(seed)
    vocab = config.text.vocab_size
    img = config.vision.image_size
    return [
        (
            jnp.asarray(rng.integers(0, vocab, (batch_size, seq_len)),
                        jnp.int32),
            jnp.asarray(rng.normal(size=(batch_size, img, img, 3)),
                        jnp.float32),
        )
        for _ in range(num_batches)
    ]


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
