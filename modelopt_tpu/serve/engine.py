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
        speculative: int = 0,
    ):
        """``speculative=k`` enables batched draft-verify decode for
        medusa-converted bundles: every tick verifies k drafted tokens per
        slot in one forward (greedy-lossless; per-slot acceptance just moves
        the slot's cache length, so mixed acceptance needs no recompile)."""
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
        self.spec_k = int(speculative)
        if self.spec_k:
            from ..speculative.medusa import MedusaModel

            if not isinstance(bundle.module, MedusaModel):
                raise ValueError("speculative engine decode needs a medusa bundle")
            self.spec_k = min(self.spec_k, bundle.module.medusa_cfg.medusa_num_heads)
            self._hidden = jnp.zeros(
                (max_batch, self.cfg.hidden_size), bundle.module.cfg.dtype
            )
            self._spec_decode = jax.jit(self._make_spec_decode())

        def prefill_fn(variables, cache, ids, slot, true_len, temp, key):
            """Prefill one request into ``slot``; returns
            (cache, first_token, last_hidden)."""
            sub = {
                "k": tuple(jax.lax.dynamic_slice_in_dim(a, slot, 1, axis=0)
                           for a in cache["k"]),
                "v": tuple(jax.lax.dynamic_slice_in_dim(a, slot, 1, axis=0)
                           for a in cache["v"]),
                "lengths": jnp.zeros((1,), jnp.int32),
            }
            logits, new_sub, hidden = self._apply(variables, ids, sub, output_hidden=True)
            k = tuple(
                jax.lax.dynamic_update_slice_in_dim(a, n, slot, axis=0)
                for a, n in zip(cache["k"], new_sub["k"])
            )
            v = tuple(
                jax.lax.dynamic_update_slice_in_dim(a, n, slot, axis=0)
                for a, n in zip(cache["v"], new_sub["v"])
            )
            lengths = cache["lengths"].at[slot].set(true_len)
            last = logits[0, true_len - 1]
            tok = _sample(last, temp, key)
            return {"k": k, "v": v, "lengths": lengths}, tok, hidden[0, true_len - 1]

        def decode_fn(variables, cache, tokens, temps, key):
            """One decode tick over all slots; returns (cache, next_tokens [B])."""
            logits, cache = self._apply(variables, tokens, cache)
            keys = jax.random.split(key, logits.shape[0])
            toks = jax.vmap(_sample)(logits[:, -1], temps, keys)
            return cache, toks

        self._prefill = jax.jit(prefill_fn)
        self._decode = jax.jit(decode_fn)

    def _make_spec_decode(self):
        from ..speculative.medusa import MedusaModel

        module: MedusaModel = self.bundle.module
        K = self.spec_k

        def spec_decode(variables, cache, tokens, hidden):
            """tokens [B,1] last emitted; hidden [B,H] at those tokens.
            Returns (cache', emitted [B, K+1], n_acc [B], hidden' [B,H]).
            Per slot, emitted[:n_acc[b]+1] are valid (all are base-greedy
            tokens — lossless)."""
            with self.bundle.contexts():
                heads = module.apply(variables, hidden[:, None, :],
                                     method=MedusaModel.medusa_logits)
            draft = jnp.concatenate(
                [jnp.argmax(h[:, -1:], -1).astype(jnp.int32) for h in heads[:K]],
                axis=1,
            )  # [B, K]
            ids = jnp.concatenate([tokens, draft], axis=1)  # [B, K+1]
            old_lengths = cache["lengths"]
            logits, cache2, hseq = self._apply(variables, ids, cache, output_hidden=True)
            preds = jnp.argmax(logits, -1).astype(jnp.int32)  # [B, K+1]
            match = preds[:, :K] == draft  # [B, K]
            n_acc = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)
            # roll back lengths to the accepted prefix (+1 for the token fed)
            cache2 = {**cache2, "lengths": old_lengths + n_acc + 1}
            bidx = jnp.arange(preds.shape[0])
            hidden_next = hseq[bidx, n_acc]
            return cache2, preds, n_acc, hidden_next

        return spec_decode

    # ------------------------------------------------------------------
    def submit(self, prompt_tokens, max_new_tokens=64, temperature=0.0,
               eos_id=None) -> Request:
        if self.spec_k and temperature > 0:
            raise ValueError("speculative engine decode is greedy-only")
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
            self.cache, tok, hid = self._prefill(
                self._vars, self.cache, jnp.asarray(ids), slot,
                len(req.prompt), jnp.float32(req.temperature), self._next_key(),
            )
            if self.spec_k:
                self._hidden = self._hidden.at[slot].set(hid)
            req.slot = slot
            self._slots[slot] = req
            self._tokens = self._tokens.at[slot, 0].set(tok)
            self._temps = self._temps.at[slot].set(req.temperature)
            req.out_tokens.append(int(tok))
            self._finish_if_done(req)
            return 1

        if self.num_active == 0:
            return 0

        if self.spec_k:
            return self._step_speculative()

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

    def _step_speculative(self) -> int:
        """One batched draft-verify tick: up to spec_k+1 tokens per slot."""
        self.cache, preds, n_acc, hidden = self._spec_decode(
            self._vars, self.cache, self._tokens, self._hidden
        )
        self._hidden = hidden
        preds_h = np.asarray(preds)
        n_h = np.asarray(n_acc)
        produced = 0
        for slot, req in enumerate(self._slots):
            if req is None:
                continue
            emitted = preds_h[slot, : int(n_h[slot]) + 1]
            for tok in emitted:
                req.out_tokens.append(int(tok))
                produced += 1
                self._finish_if_done(req)
                if req.done:
                    break
            self._tokens = self._tokens.at[slot, 0].set(int(req.out_tokens[-1]))
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
