"""Continuous-batching serving engine for quantized decoders.

The reference delegates serving to vLLM/TRT-LLM
(reference: examples/vllm_serve/vllm_serve_fakequant.py, deploy/llm/); on TPU
this framework ships its own engine, designed around XLA's compilation model:

  * fixed slot count + static-shape KV cache (per-slot ``lengths``) — ONE
    compiled decode program serves every mix of in-flight requests;
  * bucketed prefill lengths so prompt ingestion compiles a handful of
    programs, not one per prompt length;
  * slots admit new requests as others finish (continuous batching) with no
    recompilation, because activity is data (masks/lengths), not shape;
  * optional real-fp8 KV cache (pair with FP8_KV-style config) halves KV
    memory and doubles the max in-flight token budget;
  * works with fake-quant, compressed (packed-weight), and plain bundles.

On-device sampling: greedy or temperature (gumbel trick), chosen per slot by
a temperature vector — again data, not shape.
"""

from __future__ import annotations

import dataclasses
import itertools
from collections import deque
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.bundle import ModelBundle
from ..models.transformer import make_cache


@dataclasses.dataclass
class Request:
    id: int
    prompt: list
    max_new_tokens: int = 64
    temperature: float = 0.0
    eos_id: Optional[int] = None
    out_tokens: list = dataclasses.field(default_factory=list)
    done: bool = False
    slot: Optional[int] = None


class ServingEngine:
    def __init__(
        self,
        bundle: ModelBundle,
        max_batch: int = 8,
        max_seq_len: int = 512,
        prefill_buckets=(64, 256),
        kv_dtype=None,
        seed: int = 0,
    ):
        self.bundle = bundle
        self.cfg = bundle.module.cfg
        self.max_batch = max_batch
        self.max_seq_len = max_seq_len
        self.prefill_buckets = tuple(sorted(prefill_buckets))
        self.cache = make_cache(self.cfg, max_batch, max_seq_len, dtype=kv_dtype)
        self._apply = bundle.make_fn()
        self._vars = bundle.variables
        self._key = jax.random.PRNGKey(seed)
        self._slots: list[Optional[Request]] = [None] * max_batch
        self._queue: deque[Request] = deque()
        self._ids = itertools.count()
        self._tokens = jnp.zeros((max_batch, 1), jnp.int32)  # last token per slot
        self._temps = jnp.zeros((max_batch,), jnp.float32)

        def prefill_fn(variables, cache, ids, slot, true_len, temp, key):
            """Prefill one request into ``slot``; returns (cache, first_token)."""
            L = cache["k"].shape[0]
            sub = {
                "k": jax.lax.dynamic_slice_in_dim(cache["k"], slot, 1, axis=1),
                "v": jax.lax.dynamic_slice_in_dim(cache["v"], slot, 1, axis=1),
                "lengths": jnp.zeros((1,), jnp.int32),
            }
            logits, new_sub = self._apply(variables, ids, sub)
            k = jax.lax.dynamic_update_slice_in_dim(cache["k"], new_sub["k"], slot, axis=1)
            v = jax.lax.dynamic_update_slice_in_dim(cache["v"], new_sub["v"], slot, axis=1)
            lengths = cache["lengths"].at[slot].set(true_len)
            last = logits[0, true_len - 1]
            tok = _sample(last, temp, key)
            return {"k": k, "v": v, "lengths": lengths}, tok

        def decode_fn(variables, cache, tokens, temps, key):
            """One decode tick over all slots; returns (cache, next_tokens [B])."""
            logits, cache = self._apply(variables, tokens, cache)
            keys = jax.random.split(key, logits.shape[0])
            toks = jax.vmap(_sample)(logits[:, -1], temps, keys)
            return cache, toks

        self._prefill = jax.jit(prefill_fn)
        self._decode = jax.jit(decode_fn)

    # ------------------------------------------------------------------
    def submit(self, prompt_tokens, max_new_tokens=64, temperature=0.0,
               eos_id=None) -> Request:
        req = Request(
            id=next(self._ids), prompt=list(map(int, prompt_tokens)),
            max_new_tokens=max_new_tokens, temperature=temperature, eos_id=eos_id,
        )
        self._queue.append(req)
        return req

    @property
    def num_active(self) -> int:
        return sum(r is not None for r in self._slots)

    def _bucket(self, n: int) -> int:
        for b in self.prefill_buckets:
            if n <= b:
                return b
        raise ValueError(f"prompt length {n} exceeds largest bucket")

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    # ------------------------------------------------------------------
    def step(self) -> int:
        """One scheduler tick. Returns number of tokens produced."""
        # Admit one queued request per tick if a slot is free (prefill).
        free = [i for i, r in enumerate(self._slots) if r is None]
        if self._queue and free:
            req = self._queue.popleft()
            slot = free[0]
            bucket = self._bucket(len(req.prompt))
            ids = np.zeros((1, bucket), np.int32)
            ids[0, : len(req.prompt)] = req.prompt
            self.cache, tok = self._prefill(
                self._vars, self.cache, jnp.asarray(ids), slot,
                len(req.prompt), jnp.float32(req.temperature), self._next_key(),
            )
            req.slot = slot
            self._slots[slot] = req
            self._tokens = self._tokens.at[slot, 0].set(tok)
            self._temps = self._temps.at[slot].set(req.temperature)
            req.out_tokens.append(int(tok))
            self._finish_if_done(req)
            return 1

        if self.num_active == 0:
            return 0

        # Decode tick over all slots (inactive slots produce ignored tokens).
        self.cache, toks = self._decode(
            self._vars, self.cache, self._tokens, self._temps, self._next_key()
        )
        self._tokens = toks[:, None]
        produced = 0
        toks_host = np.asarray(toks)
        for slot, req in enumerate(self._slots):
            if req is None:
                continue
            req.out_tokens.append(int(toks_host[slot]))
            produced += 1
            self._finish_if_done(req)
        return produced

    def _finish_if_done(self, req: Request):
        hit_eos = req.eos_id is not None and req.out_tokens and req.out_tokens[-1] == req.eos_id
        total_len = len(req.prompt) + len(req.out_tokens)
        if (
            len(req.out_tokens) >= req.max_new_tokens
            or hit_eos
            or total_len >= self.max_seq_len
        ):
            req.done = True
            if req.slot is not None:
                self._slots[req.slot] = None
                req.slot = None

    def run(self, max_ticks: int = 100000) -> None:
        """Drive until queue and slots drain."""
        for _ in range(max_ticks):
            if not self._queue and self.num_active == 0:
                return
            self.step()
        raise RuntimeError("run() exceeded max_ticks")


def _sample(logits, temperature, key):
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    gumbel = -jnp.log(-jnp.log(jax.random.uniform(key, logits.shape) + 1e-9) + 1e-9)
    temp = jnp.maximum(temperature, 1e-6)
    sampled = jnp.argmax(logits.astype(jnp.float32) / temp + gumbel, axis=-1).astype(jnp.int32)
    return jnp.where(temperature <= 0.0, greedy, sampled)
