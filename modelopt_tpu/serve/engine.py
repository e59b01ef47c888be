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
  * scheduler: every tick admits up to ``max_admit`` queued requests AND
    runs one decode for all active slots — decode never starves behind a
    deep queue; prompts longer than the largest bucket stream in bucket-size
    CHUNKS, one chunk per tick (chunked prefill);
  * optional PAGED KV cache (``paged=True``): pages allocated on demand from
    a global pool, so KV memory scales with active tokens and the pool can
    be oversubscribed vs. max_batch*max_seq_len (serve/paged_cache.py +
    kernels/paged_attention.py);
  * optional real-fp8 KV cache (pair with FP8_KV-style config) halves KV
    memory and doubles the max in-flight token budget;
  * speculative decode ticks (medusa, eagle, or dflash bundles) verify k
    drafted tokens per slot in one forward — greedy-lossless; dflash keeps a
    per-slot tapped-feature cache so its block-parallel draft sees the whole
    verified context;
  * ``stats`` counts forwards/proposed/accepted for acceptance-length and
    throughput reporting (speculative/bench.py harness);
  * caches are DONATED through every jitted step: XLA updates them in place
    instead of copying (a non-donated 8B bs64 cache costs ~6 ms/step).

On-device sampling: greedy or temperature (gumbel trick), chosen per slot by
a temperature vector — again data, not shape.
"""

from __future__ import annotations

import dataclasses
import functools
import itertools
from collections import deque
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.bundle import ModelBundle
from ..models.transformer import make_cache
from .paged_cache import (
    PagedAllocator,
    PagedCacheConfig,
    make_paged_cache,
    pages_needed,
    write_page_table,
)


@dataclasses.dataclass
class Request:
    id: int
    prompt: list
    max_new_tokens: int = 64
    temperature: float = 0.0
    # vLLM-convention sampling filters (applied per slot, on device):
    # top_k=0 and top_p=1.0 disable them
    top_k: int = 0
    top_p: float = 1.0
    min_p: float = 0.0
    # vLLM-convention penalties: repetition applies to prompt+generated
    # tokens (HF/vLLM divide-positive/multiply-negative form), presence/
    # frequency to generated tokens only. 1.0 / 0.0 / 0.0 disable them.
    repetition_penalty: float = 1.0
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    eos_id: Optional[int] = None
    # token-id stop sequences (vLLM-style): generation ends when the output
    # tail matches one; the matched tail is trimmed from out_tokens
    stop_sequences: tuple = ()
    out_tokens: list = dataclasses.field(default_factory=list)
    # log p(token | prefix) of each emitted token (None on speculative
    # ticks, where verify logits are not re-normalized per token)
    out_logprobs: list = dataclasses.field(default_factory=list)
    stop_reason: Optional[str] = None  # "eos" | "stop" | "length"
    done: bool = False
    slot: Optional[int] = None
    prefill_pos: int = 0  # tokens of the prompt already ingested


def _with_xla_attn(fn):
    """Run ``fn`` under kernels.attention.xla_attention so any (re)trace
    inside it lowers to the XLA attention path (mesh-sharded engine)."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        from ..kernels.attention import xla_attention

        with xla_attention():
            return fn(*args, **kwargs)

    return wrapped


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
        paged: bool = False,
        page_size: int = 64,
        kv_pages: Optional[int] = None,
        max_admit: int = 2,
        multi_step: int = 1,
        spec_sampling: bool = False,
        spec_tree=None,
        mesh=None,
        shard_rules=None,
    ):
        """``speculative=k`` enables batched draft-verify decode for medusa-,
        eagle-, or dflash-converted bundles: every tick verifies k drafted tokens per
        slot in one forward (greedy-lossless; per-slot acceptance just moves
        the slot's cache length, so mixed acceptance needs no recompile).

        ``spec_tree``: a ``speculative.tree.SpecTree`` (or its choices
        tuple) switches drafting to a token TREE verified in one forward
        with an ancestor attention mask; the deepest all-greedy path is
        accepted and its KV rows are compacted in place
        (speculative/tree.py; reference frame: hf_eagle.py:431 TTT masks /
        medusa tree choices). Greedy-lossless like the chain. Medusa and
        eagle bundles only; dense cache.

        ``paged=True`` switches to the paged KV cache; ``kv_pages`` sizes the
        pool (default: worst case + null page — pass less to oversubscribe).

        ``mesh``: a ``jax.sharding.Mesh`` (axes from dp/tp/ep) shards the
        engine across chips: weights by ``parallel.mesh`` rules (tp
        column/row-parallel, ep experts), KV-cache slots over dp and merged
        head-dims over tp — one compiled decode program, GSPMD collectives
        on ICI (SURVEY §2.10; reference frame:
        utils/distributed.py:341 ParallelState). Attention runs the XLA
        path under a mesh (a pallas_call inside a partitioned program needs
        an explicit shard_map; future work)."""
        self.bundle = bundle
        self.cfg = bundle.module.cfg
        self.max_batch = max_batch
        self.max_seq_len = max_seq_len
        self.max_admit = max_admit
        # multi_step=n runs n decode ticks per host dispatch when no
        # admissions/prefills are pending (vLLM-style multi-step
        # scheduling); eos/length stopping is on-device, stop-sequence
        # overshoot is trimmed by the host.
        if multi_step < 1:
            raise ValueError("multi_step must be >= 1")
        self.multi_step = int(multi_step)
        # spec_sampling=True verifies drafts with the speculative-sampling
        # rejection rule instead of greedy match — temperature>0 spec
        # decode whose outputs are distributed exactly as ancestral
        # sampling from the target (speculative/sampling.py)
        self.spec_sampling = bool(spec_sampling)
        # clamp buckets to the cache: an unclamped default (64, 256) on a
        # small max_seq_len would prefill past the cache bound (silently
        # dropped by TPU scatter, a hard error on CPU)
        self.prefill_buckets = tuple(sorted(
            {min(b, max_seq_len) for b in prefill_buckets}
        ))
        for i, small in enumerate(self.prefill_buckets):
            if max_seq_len % small:
                # a bucket-sized write at a bucket-aligned start must stay
                # inside the cache even on the final chunk
                raise ValueError(
                    f"max_seq_len ({max_seq_len}) must be a multiple of "
                    f"every prefill bucket (got {self.prefill_buckets}); "
                    "pass compatible prefill_buckets"
                )
            for big in self.prefill_buckets[i + 1:]:
                if big % small:
                    raise ValueError(
                        "each prefill bucket must divide every larger one "
                        "(chunked-prefill starts must stay bucket-aligned)"
                    )
        if kv_dtype == jnp.float8_e4m3fn and jax.devices():
            kind = getattr(jax.devices()[0], "device_kind", "") or ""
            if "v5 lite" in kind or "v5e" in kind.lower():
                import warnings

                # measured on v5e (docs/benchmarks.md): fp8-KV decode
                # 4520 tok/s vs int8-KV 5685 on the same model — no
                # hardware e4m3 convert, codes are bit-assembled on the VPU
                warnings.warn(
                    "fp8 (e4m3) KV cache on TPU v5e costs ~20% decode "
                    "throughput vs int8 KV codes (no hardware fp8 "
                    "convert); prefer kv_dtype=jnp.int8 with a calibrated "
                    "INT8_KV_CFG / W4A8_INT8KV_CFG bundle",
                    stacklevel=2,
                )
        self.paged = paged
        if paged and any(self.cfg.is_mamba(i)
                         for i in range(self.cfg.num_layers)):
            # the paged pool assumes uniform per-layer KV slabs; mamba
            # layers carry O(1) conv/SSM state per slot — nothing to page.
            # The right hybrid design (dense state slots + paged attention
            # layers) is future work; fail clearly instead of a shape error
            raise NotImplementedError(
                "paged KV is not supported for hybrid (mamba) bundles: "
                "recurrent conv/SSM state is per-slot, not per-page — use "
                "the dense cache (mamba layers keep O(1) state per slot "
                "regardless)")
        if paged:
            if max_seq_len % page_size:
                raise ValueError("max_seq_len must be a page_size multiple")
            pmax = max_seq_len // page_size
            n_pages = kv_pages or (max_batch * pmax + 1)
            self.pcfg = PagedCacheConfig(
                page_size=page_size, n_pages=n_pages, max_pages_per_slot=pmax
            )
            self.cache = make_paged_cache(self.cfg, max_batch, self.pcfg,
                                          dtype=kv_dtype)
            self.allocator = PagedAllocator(n_pages)
        else:
            self.cache = make_cache(self.cfg, max_batch, max_seq_len,
                                    dtype=kv_dtype)
        self._apply = bundle.make_fn()
        self._vars = bundle.variables
        self.mesh = mesh
        if mesh is not None:
            if paged:
                raise NotImplementedError(
                    "mesh-sharded engine currently requires the dense KV "
                    "cache (page-table host mutation would break donated "
                    "sharding)")
            from ..parallel.mesh import (
                DECODER_RULES,
                kv_cache_shardings,
                variable_shardings,
            )

            rules = shard_rules or DECODER_RULES
            self._vars = jax.device_put(
                self._vars, variable_shardings(self._vars, mesh, rules))
            self.cache = jax.device_put(
                self.cache, kv_cache_shardings(self.cache, mesh))
        self._key = jax.random.PRNGKey(seed)
        self._slots: list[Optional[Request]] = [None] * max_batch
        self._queue: deque[Request] = deque()
        self._pending_prefills: list = []  # (req, packed) awaiting fetch
        self._prefilling: set[int] = set()  # slots mid-chunked-prefill
        self._ids = itertools.count()
        self._tokens = jnp.zeros((max_batch, 1), jnp.int32)  # last token per slot
        self._temps = jnp.zeros((max_batch,), jnp.float32)
        self._topk = jnp.zeros((max_batch,), jnp.int32)   # 0 = no top-k
        self._topp = jnp.ones((max_batch,), jnp.float32)  # 1 = no top-p
        self._minp = jnp.zeros((max_batch,), jnp.float32)  # 0 = no min-p
        self._eos = jnp.full((max_batch,), -1, jnp.int32)  # -1 = no eos
        self._rep = jnp.ones((max_batch,), jnp.float32)   # 1 = no repetition
        self._pres = jnp.zeros((max_batch,), jnp.float32)
        self._freq = jnp.zeros((max_batch,), jnp.float32)
        # per-slot token histograms for the penalties: prompt+generated
        # (repetition) and generated-only (presence/frequency). [B, V] int32
        # is small next to the KV cache (~33 MB at bs64 / 128k vocab); a
        # batch-level cond skips both the scatter reads and the penalty math
        # when no active slot uses penalties.
        V = self.cfg.vocab_size
        self._all_counts = jnp.zeros((max_batch, V), jnp.int32)
        self._out_counts = jnp.zeros((max_batch, V), jnp.int32)
        # tokens_emitted counts DECODE-phase emissions only (plain or
        # speculative ticks); the token sampled at the end of a prefill is
        # prefill_tokens. decode_slot_steps counts (tick × active slot)
        # pairs, so tokens_emitted / decode_slot_steps is the PER-REQUEST
        # acceptance length (1.0 for plain decode) independent of batching.
        self.stats = {
            "prefill_chunks": 0, "prefill_tokens": 0, "decode_forwards": 0,
            "verify_forwards": 0, "decode_slot_steps": 0,
            "draft_proposed": 0, "draft_accepted": 0, "tokens_emitted": 0,
        }
        self.spec_k = int(speculative)
        self.spec_tree = None
        if spec_tree is not None:
            from ..speculative.tree import SpecTree

            if not self.spec_k:
                raise ValueError("spec_tree requires speculative > 0")
            if self.spec_sampling:
                raise NotImplementedError(
                    "tree drafts are greedy-verify only (spec_sampling "
                    "needs multi-draft rejection rules)")
            if paged:
                raise NotImplementedError(
                    "tree verify compacts dense cache rows; paged KV not "
                    "supported yet")
            for i in range(self.cfg.num_layers):
                opts = self.cfg.layer_opts(i)
                if (self.cfg.attention_window or self.cfg.attention_chunk
                        or "window" in opts or "chunk" in opts):
                    raise NotImplementedError(
                        "tree verify masks don't compose with sliding-"
                        "window/chunked attention yet")
            self.spec_tree = (spec_tree if isinstance(spec_tree, SpecTree)
                              else SpecTree(tuple(spec_tree)))
        if self.spec_k and any(self.cfg.is_mamba(i)
                               for i in range(self.cfg.num_layers)):
            # the verify forward irreversibly ingests all K+1 draft tokens
            # into the mamba layers' SSM/conv state; rolling back only
            # cache['lengths'] would leave rejected drafts inside the
            # recurrent state and silently corrupt generations. Needs
            # accepted-prefix state checkpointing before it can be enabled.
            raise NotImplementedError(
                "speculative decode is not supported for hybrid (mamba) "
                "bundles: rejected draft tokens cannot be rolled out of "
                "recurrent SSM/conv state")
        self._is_dflash = False
        self._spec_reserve = self.spec_k  # cache rows a spec tick writes
        if self.spec_k:
            self._draft_fn = self._resolve_draft()  # may set _is_dflash
            if self.spec_tree is not None:
                # acceptance budget per tick = tree depth; the verify
                # forward writes num_nodes rows before compaction
                self.spec_k = self.spec_tree.max_depth
                self._spec_reserve = self.spec_tree.num_nodes - 1
            if self._is_dflash:
                # per-slot tapped-feature cache: row p holds the base model's
                # (taps+final) hidden state at sequence position p — the
                # dflash draft's KV-injection context
                self._features = jnp.zeros(
                    (max_batch, max_seq_len, self._hidden_width()),
                    bundle.module.cfg.dtype,
                )
            else:
                self._hidden = jnp.zeros(
                    (max_batch, self._hidden_width()), bundle.module.cfg.dtype
                )
            self._spec_decode = jax.jit(self._make_spec_decode(),
                                        donate_argnums=(1, 3))

        def _prefill_core(variables, cache, counts, ids, slot, start,
                          true_len, temp, tk, tp, mp, key):
            """Ingest one bucket-size chunk for ``slot`` beginning at prompt
            position ``start``; returns (cache, last_token, chunk_hidden).
            The token/hidden are only meaningful on the final chunk."""
            if self.paged:
                sub = {
                    "k": cache["k"], "v": cache["v"],
                    "lengths": jnp.full((1,), start, jnp.int32),
                    "page_table": jax.lax.dynamic_slice_in_dim(
                        cache["page_table"], slot, 1, axis=0
                    ),
                }
            else:
                sub = {
                    "k": tuple(jax.lax.dynamic_slice_in_dim(a, slot, 1, axis=0)
                               for a in cache["k"]),
                    "v": tuple(jax.lax.dynamic_slice_in_dim(a, slot, 1, axis=0)
                               for a in cache["v"]),
                    "lengths": jnp.full((1,), start, jnp.int32),
                    # stateful (Mamba) layers: bucket padding past the true
                    # length must not enter the SSM/conv state
                    "valid_to": jnp.full((1,), start + true_len, jnp.int32),
                }
            # logits only at the chunk's last true token: the full-bucket
            # lm_head costs ~2.3 TFLOP + a 558 MB logits tensor per
            # 2176-token prefill and every row but one is discarded
            logits, new_sub, hidden = self._apply(
                variables, ids, sub, output_hidden=True,
                logits_index=jnp.full((1,), true_len - 1, jnp.int32))
            if self.paged:
                cache = {**cache, "k": new_sub["k"], "v": new_sub["v"]}
            else:
                k = tuple(
                    jax.lax.dynamic_update_slice_in_dim(a, n, slot, axis=0)
                    for a, n in zip(cache["k"], new_sub["k"])
                )
                v = tuple(
                    jax.lax.dynamic_update_slice_in_dim(a, n, slot, axis=0)
                    for a, n in zip(cache["v"], new_sub["v"])
                )
                cache = {**cache, "k": k, "v": v}
            lengths = cache["lengths"].at[slot].set(start + true_len)
            cache = {**cache, "lengths": lengths}
            # prompt tokens join the slot's repetition histogram (padding
            # beyond true_len masked out)
            valid = (jnp.arange(ids.shape[1]) < true_len).astype(jnp.int32)
            counts = counts.at[slot, ids[0]].add(valid)
            last = logits[0]
            filt = jax.lax.cond(
                (tk > 0) | (tp < 1.0) | (mp > 0.0),
                lambda l: _filter_logits(l, tk, tp, mp, temp),
                lambda l: l.astype(jnp.float32),
                last,
            )
            tok, lp = _sample_lp(last, temp, key, filt)
            return cache, counts, tok, hidden, lp

        def prefill_fn(variables, cache, counts, ids, slot, start, true_len,
                       temp, tk, tp, mp, key):
            cache, counts, tok, hidden, lp = _prefill_core(
                variables, cache, counts, ids, slot, start, true_len, temp,
                tk, tp, mp, key
            )
            # (token, logprob) packed into ONE f32 pair: the host loop
            # fetches it in a single round trip (~30 ms saved per prefill
            # over the tunnel; token ids are exact in f32 below 2^24)
            packed = jnp.stack([tok.astype(jnp.float32),
                                lp.astype(jnp.float32)])
            return cache, counts, packed, hidden[0, true_len - 1]

        def prefill_dflash_fn(variables, cache, features, counts, ids, slot,
                              start, true_len, temp, tk, tp, mp, key):
            """dflash prefill also records the chunk's tapped features at
            rows [start, start+bucket) of the slot's feature cache (padding
            rows are overwritten by the next chunk / first spec ticks)."""
            cache, counts, tok, hidden, lp = _prefill_core(
                variables, cache, counts, ids, slot, start, true_len, temp,
                tk, tp, mp, key
            )
            features = jax.lax.dynamic_update_slice(
                features, hidden.astype(features.dtype), (slot, start, 0)
            )
            packed = jnp.stack([tok.astype(jnp.float32),
                                lp.astype(jnp.float32)])
            return cache, features, counts, packed

        def decode_fn(variables, cache, tokens, temps, topk, topp, minp,
                      rep, pres, freq, all_counts, out_counts, active, key):
            """One decode tick over all slots. ``active`` [B] gates length
            advancement so idle/prefilling slots are untouched (their KV
            write lands on a position that is overwritten before it is ever
            attended). Returns (cache, counts', next_tokens [B])."""
            old_lengths = cache["lengths"]
            # the fed-back token (last emitted) joins both histograms for
            # active slots — exactly the tokens the host actually kept
            rows = jnp.arange(tokens.shape[0])
            act = active.astype(jnp.int32)
            all_counts = all_counts.at[rows, tokens[:, 0]].add(act)
            out_counts = out_counts.at[rows, tokens[:, 0]].add(act)
            # valid_to = lengths + active: an inactive slot's fed-back token
            # is a state no-op on stateful (Mamba) layers
            logits, cache = self._apply(
                variables, tokens, {**cache, "valid_to": old_lengths + act})
            cache = {**cache, "lengths": old_lengths + active.astype(jnp.int32)}
            keys = jax.random.split(key, logits.shape[0])
            last = logits[:, -1]
            need_pen = jnp.any((rep != 1.0) | (pres != 0.0) | (freq != 0.0))
            penalized = jax.lax.cond(
                need_pen,
                lambda op: _apply_penalties(*op),
                lambda op: op[0].astype(jnp.float32),
                (last, all_counts, out_counts, rep, pres, freq),
            )
            filt = _filter_batch(penalized, topk, topp, minp, temps)
            toks, lps = jax.vmap(_sample_lp)(last, temps, keys, filt)
            packed = jnp.stack([toks.astype(jnp.float32),
                                lps.astype(jnp.float32)], axis=1)
            return cache, all_counts, out_counts, toks, packed

        def burst_fn(variables, cache, tokens, temps, topk, topp, minp,
                     rep, pres, freq, all_counts, out_counts, active, eos,
                     remaining, key, *, n: int):
            """``n`` decode ticks in one on-device scan (multi-step
            scheduling): host dispatch/sync happens once per BURST instead
            of once per token. Per-slot eos / max_new_tokens / cache-cap
            stopping is data inside the scan; stop-sequence matching stays
            on the host, which discards any overshoot tokens."""
            B = tokens.shape[0]
            rows = jnp.arange(B)
            S = self.max_seq_len

            def tick(carry, _):
                cache, all_c, out_c, tokens, active, remaining, key = carry
                key, sub = jax.random.split(key)
                act = active.astype(jnp.int32)
                all_c = all_c.at[rows, tokens[:, 0]].add(act)
                out_c = out_c.at[rows, tokens[:, 0]].add(act)
                old_lengths = cache["lengths"]
                logits, cache = self._apply(
                    variables, tokens,
                    {**cache, "valid_to": old_lengths + act})
                cache = {**cache, "lengths": old_lengths + act}
                last = logits[:, -1]
                need_pen = jnp.any((rep != 1.0) | (pres != 0.0)
                                   | (freq != 0.0))
                penalized = jax.lax.cond(
                    need_pen,
                    lambda op: _apply_penalties(*op),
                    lambda op: op[0].astype(jnp.float32),
                    (last, all_c, out_c, rep, pres, freq),
                )
                filt = _filter_batch(penalized, topk, topp, minp, temps)
                keys = jax.random.split(sub, B)
                toks, lps = jax.vmap(_sample_lp)(last, temps, keys, filt)
                emit = active
                remaining = remaining - act
                new_len = cache["lengths"]
                active = (active & (toks != eos) & (remaining > 0)
                          & (new_len < S))
                packed = jnp.stack([toks.astype(jnp.float32),
                                    lps.astype(jnp.float32),
                                    emit.astype(jnp.float32)], axis=1)
                return ((cache, all_c, out_c, toks[:, None], active,
                         remaining, key),
                        packed)

            carry = (cache, all_counts, out_counts, tokens, active,
                     remaining, key)
            carry, packed = jax.lax.scan(tick, carry, None, length=n)
            cache, all_counts, out_counts, tokens, active, _, _ = carry
            return cache, all_counts, out_counts, tokens, packed

        if self._is_dflash:
            self._prefill = jax.jit(prefill_dflash_fn, donate_argnums=(1, 2, 3))
        else:
            self._prefill = jax.jit(prefill_fn, donate_argnums=(1, 2))
        self._decode = jax.jit(decode_fn, donate_argnums=(1, 10, 11))
        self._burst = jax.jit(
            functools.partial(burst_fn, n=self.multi_step),
            donate_argnums=(1, 10, 11),
        ) if self.multi_step > 1 else None
        if mesh is not None:
            # trace every jitted step with the XLA attention fallbacks (see
            # class docstring); cached executions never retrace
            self._prefill = _with_xla_attn(self._prefill)
            self._decode = _with_xla_attn(self._decode)
            if self._burst is not None:
                self._burst = _with_xla_attn(self._burst)
            if self.spec_k:
                self._spec_decode = _with_xla_attn(self._spec_decode)

    # -- speculative drafting ------------------------------------------------
    def _hidden_width(self) -> int:
        from ..speculative.dflash import DFlashModel
        from ..speculative.eagle import EagleModel

        if isinstance(self.bundle.module, (EagleModel, DFlashModel)):
            return self.bundle.module.feature_width()
        return self.cfg.hidden_size

    def _resolve_draft(self):
        """Return draft(variables, tokens [B,1], hidden [B,F]) -> [B, K]
        drafted tokens, for the bundle's speculative architecture."""
        from ..speculative.dflash import DFlashModel
        from ..speculative.eagle import EagleModel
        from ..speculative.medusa import MedusaModel

        module = self.bundle.module
        K = self.spec_k

        if self.spec_tree is not None and isinstance(module, DFlashModel):
            raise NotImplementedError(
                "dflash drafts whole blocks; tree drafting needs medusa "
                "or eagle bundles")

        if isinstance(module, DFlashModel):
            self._is_dflash = True
            self.spec_k = K = min(K, module.dflash_cfg.block_size)

            def draft_dflash(variables, tokens, features, anchor_positions):
                """ONE forward drafts the whole K-token block: Q from the
                noise block, K/V injected from the per-slot tapped-feature
                cache (no draft autoregression — reference:
                modeling_dflash.py block-parallel drafting)."""
                with self.bundle.contexts():
                    blog = module.apply(
                        variables, tokens, features, anchor_positions,
                        method=DFlashModel.draft_block,
                    )
                return jnp.argmax(blog[:, :K], -1).astype(jnp.int32)

            def draft_dflash_sampled(variables, tokens, features,
                                     anchor_positions, temps, key):
                from ..speculative.sampling import tempered_probs

                with self.bundle.contexts():
                    blog = module.apply(
                        variables, tokens, features, anchor_positions,
                        method=DFlashModel.draft_block,
                    )
                q = tempered_probs(blog[:, :K], temps[:, None, None])
                toks = jax.random.categorical(
                    key, jnp.log(jnp.maximum(q, 1e-30))).astype(jnp.int32)
                return toks, q

            return draft_dflash_sampled if self.spec_sampling else draft_dflash

        if isinstance(module, MedusaModel):
            if self.spec_tree is not None:
                tree = self.spec_tree
                if tree.max_depth > module.medusa_cfg.medusa_num_heads:
                    raise ValueError(
                        f"tree depth {tree.max_depth} exceeds the bundle's "
                        f"{module.medusa_cfg.medusa_num_heads} medusa heads")
                tb = tree._build()
                depth, rank = tb["depth"], tb["rank"]
                # widest rank drafted per depth (heads are depth-indexed)
                kmax = {}
                for j in range(1, tb["num_nodes"]):
                    d = int(depth[j])
                    kmax[d] = max(kmax.get(d, 0), int(rank[j]))

                def draft_medusa_tree(variables, tokens, hidden):
                    """Node tokens for the whole tree from ONE head pass:
                    head d-1's top-k at the root hidden supplies every
                    depth-d node (medusa heads are independent of the
                    intermediate draft tokens by construction)."""
                    with self.bundle.contexts():
                        heads = module.apply(variables, hidden[:, None, :],
                                             method=MedusaModel.medusa_logits)
                    idx = {d: jax.lax.top_k(heads[d - 1][:, -1], k + 1)[1]
                           for d, k in kmax.items()}
                    cols = [idx[int(depth[j])][:, int(rank[j])]
                            for j in range(1, tb["num_nodes"])]
                    return jnp.stack(cols, axis=1).astype(jnp.int32)

                return draft_medusa_tree

            self.spec_k = K = min(K, module.medusa_cfg.medusa_num_heads)

            def draft_medusa(variables, tokens, hidden):
                with self.bundle.contexts():
                    heads = module.apply(variables, hidden[:, None, :],
                                         method=MedusaModel.medusa_logits)
                return jnp.concatenate(
                    [jnp.argmax(h[:, -1:], -1).astype(jnp.int32)
                     for h in heads[:K]], axis=1)

            def draft_medusa_sampled(variables, tokens, hidden, temps, key):
                from ..speculative.sampling import tempered_probs

                with self.bundle.contexts():
                    heads = module.apply(variables, hidden[:, None, :],
                                         method=MedusaModel.medusa_logits)
                toks, qs = [], []
                for i, h in enumerate(heads[:K]):
                    q = tempered_probs(h[:, -1], temps[:, None])
                    k = jax.random.fold_in(key, i)
                    toks.append(jax.random.categorical(
                        k, jnp.log(jnp.maximum(q, 1e-30)))[:, None]
                        .astype(jnp.int32))
                    qs.append(q[:, None])
                return (jnp.concatenate(toks, axis=1),
                        jnp.concatenate(qs, axis=1))

            return draft_medusa_sampled if self.spec_sampling else draft_medusa

        if isinstance(module, EagleModel):
            if self.spec_tree is not None:
                tree = self.spec_tree
                tb = tree._build()
                paths, depth, rank = tb["path"], tb["depth"], tb["rank"]
                children = tb["children"]

                def draft_eagle_tree(variables, tokens, hidden):
                    """Level-order tree expansion: each node with children
                    reruns the draft head over its ancestor path (token,
                    draft-state) pairs; its top-k supplies the children's
                    tokens, its last hidden their draft states. All loops
                    are over the STATIC topology — one compiled program."""
                    with self.bundle.contexts():
                        g0 = module.apply(variables, hidden[:, None, :],
                                          method=EagleModel.fuse_features)
                    M = tb["num_nodes"]
                    tok = [None] * M
                    g = [None] * M
                    tok[0], g[0] = tokens[:, 0], g0[:, 0]
                    for p in range(M):
                        ch = children[p]
                        if not ch:
                            continue
                        pathp = [int(paths[p][d])
                                 for d in range(int(depth[p]) + 1)]
                        ids = jnp.stack([tok[i] for i in pathp], axis=1)
                        gs = jnp.stack([g[i] for i in pathp], axis=1)
                        with self.bundle.contexts():
                            dl, dh = module.apply(variables, ids, gs,
                                                  method=EagleModel.draft_fused)
                        nch = max(int(rank[j]) for j in ch) + 1
                        _, topi = jax.lax.top_k(dl[:, -1], nch)
                        for j in ch:
                            tok[j] = topi[:, int(rank[j])].astype(jnp.int32)
                            g[j] = dh[:, -1]
                    return jnp.stack(tok[1:], axis=1)

                return draft_eagle_tree

            if self.spec_sampling:
                def draft_eagle_sampled(variables, tokens, hidden, temps, key):
                    from ..speculative.sampling import tempered_probs

                    with self.bundle.contexts():
                        g = module.apply(variables, hidden[:, None, :],
                                         method=EagleModel.fuse_features)
                    ids, gs = tokens, g
                    toks, qs = [], []
                    for i in range(K):
                        with self.bundle.contexts():
                            dl, dh = module.apply(variables, ids, gs,
                                                  method=EagleModel.draft_fused)
                        q = tempered_probs(dl[:, -1], temps[:, None])
                        k = jax.random.fold_in(key, i)
                        nxt = jax.random.categorical(
                            k, jnp.log(jnp.maximum(q, 1e-30)))[:, None]                             .astype(jnp.int32)
                        toks.append(nxt)
                        qs.append(q[:, None])
                        ids = jnp.concatenate([ids, nxt], axis=1)
                        gs = jnp.concatenate([gs, dh[:, -1:]], axis=1)
                    return (jnp.concatenate(toks, axis=1),
                            jnp.concatenate(qs, axis=1))

                return draft_eagle_sampled

            def draft_eagle(variables, tokens, hidden):
                """EAGLE autoregression: fuse base features once, then the
                draft head re-runs over the growing [token; state] sequence,
                feeding its own hidden states for unverified steps
                (reference: eagle_model.py pseudo-autoregressive drafting)."""
                with self.bundle.contexts():
                    g = module.apply(variables, hidden[:, None, :],
                                     method=EagleModel.fuse_features)
                ids = tokens  # [B, 1]
                gs = g  # [B, 1, H]
                drafts = []
                for _ in range(K):
                    with self.bundle.contexts():
                        dl, dh = module.apply(variables, ids, gs,
                                              method=EagleModel.draft_fused)
                    nxt = jnp.argmax(dl[:, -1:], -1).astype(jnp.int32)
                    drafts.append(nxt)
                    ids = jnp.concatenate([ids, nxt], axis=1)
                    gs = jnp.concatenate([gs, dh[:, -1:]], axis=1)
                return jnp.concatenate(drafts, axis=1)

            return draft_eagle

        raise ValueError(
            "speculative engine decode needs a medusa, eagle, or dflash bundle"
        )

    def _make_spec_decode(self):
        K = self.spec_k
        draft_fn = self._draft_fn
        is_dflash = self._is_dflash

        if self.spec_tree is not None:
            from ..speculative.tree import (
                compact_accepted_rows,
                tree_verify_greedy,
            )

            tree = self.spec_tree
            tb = tree._build()
            anc = tree.ancestor_mask()
            depth_arr = jnp.asarray(tb["depth"])
            width = tb["max_depth"] + 1

            def spec_decode_tree(variables, cache, tokens, hidden, active):
                """One tree tick: draft the token tree, verify all nodes in
                one forward (ancestor mask, rope positions = length+depth,
                KV rows written contiguously at the slot length), accept
                the deepest all-greedy path and compact its rows over the
                tree rows. Same return contract as the chain path."""
                L = cache["lengths"]
                draft = draft_fn(variables, tokens, hidden)  # [B, M-1]
                ids = jnp.concatenate([tokens, draft], axis=1)  # [B, M]
                pos = L[:, None] + depth_arr[None, :]
                logits, cache2, hseq = self._apply(
                    variables, ids, {**cache, "tree": anc}, positions=pos,
                    output_hidden=True)
                preds = jnp.argmax(logits, -1).astype(jnp.int32)
                best, n_acc, emitted = tree_verify_greedy(preds, ids, tree)
                prows = jnp.asarray(tb["path"])[best]        # [B, width]
                cache2 = {
                    **cache2,
                    "k": tuple(compact_accepted_rows(s, L, prows, width)
                               for s in cache2["k"]),
                    "v": tuple(compact_accepted_rows(s, L, prows, width)
                               for s in cache2["v"]),
                    "lengths": L + (n_acc + 1) * active.astype(jnp.int32),
                }
                bidx = jnp.arange(preds.shape[0])
                return cache2, emitted, n_acc, hseq[bidx, best]

            return spec_decode_tree

        if self.spec_sampling:
            from ..speculative.sampling import rejection_sample, tempered_probs

            def spec_decode_sampled(variables, cache, tokens, hidden, active,
                                    temps, topk, topp, minp, key):
                """Stochastic draft-verify: drafts sampled from q, accepted
                by the rejection rule — outputs distributed exactly as
                ancestral sampling from the target (optionally top-k/p/min-p
                FILTERED target: filtering p is exact, the unfiltered draft
                proposal only affects acceptance). Same return contract as
                the greedy path (emitted, n_emit-1)."""
                old_lengths = cache["lengths"]
                kd, kr = jax.random.split(key)
                if is_dflash:
                    draft, q = draft_fn(variables, tokens, hidden,
                                        old_lengths, temps, kd)
                else:
                    draft, q = draft_fn(variables, tokens, hidden, temps, kd)
                ids = jnp.concatenate([tokens, draft], axis=1)  # [B, K+1]
                logits, cache2, hseq = self._apply(variables, ids, cache,
                                                   output_hidden=True)
                need = jnp.any((topk > 0) | (topp < 1.0) | (minp > 0.0))
                logits = jax.lax.cond(
                    need,
                    lambda lg: jax.vmap(           # over slots
                        lambda row, tk, tp, mp, t: jax.vmap(
                            lambda r: _filter_logits(r, tk, tp, mp, t)
                        )(row)
                    )(lg, topk, topp, minp, temps),
                    lambda lg: lg.astype(jnp.float32),
                    logits,
                )
                p = tempered_probs(logits, temps[:, None, None])  # [B,K+1,V]
                keys = jax.random.split(kr, p.shape[0])
                emitted, n_emit = jax.vmap(rejection_sample)(p, q, draft,
                                                             keys)
                adv = n_emit * active.astype(jnp.int32)
                cache2 = {**cache2, "lengths": old_lengths + adv}
                bidx = jnp.arange(p.shape[0])
                last_pos = jnp.minimum(n_emit - 1, K)
                if is_dflash:
                    hidden_next = jax.vmap(
                        lambda f, h, s: jax.lax.dynamic_update_slice(
                            f, h, (s, 0))
                    )(hidden, hseq.astype(hidden.dtype), old_lengths)
                else:
                    hidden_next = hseq[bidx, last_pos]
                return cache2, emitted, n_emit - 1, hidden_next

            return spec_decode_sampled

        def spec_decode(variables, cache, tokens, hidden, active):
            """tokens [B,1] last emitted; hidden [B,F] at those tokens (for
            dflash: the [B,S,F] per-slot tapped-feature cache instead).
            Returns (cache', emitted [B, K+1], n_acc [B], hidden').
            Per slot, emitted[:n_acc[b]+1] are valid (all are base-greedy
            tokens — lossless)."""
            old_lengths = cache["lengths"]
            if is_dflash:
                # anchor (last emitted token) sits at position old_lengths
                draft = draft_fn(variables, tokens, hidden, old_lengths)
            else:
                draft = draft_fn(variables, tokens, hidden)  # [B, K]
            ids = jnp.concatenate([tokens, draft], axis=1)  # [B, K+1]
            logits, cache2, hseq = self._apply(variables, ids, cache,
                                               output_hidden=True)
            preds = jnp.argmax(logits, -1).astype(jnp.int32)  # [B, K+1]
            match = preds[:, :K] == draft  # [B, K]
            n_acc = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)
            # roll back lengths to the accepted prefix (+1 for the token fed)
            adv = (n_acc + 1) * active.astype(jnp.int32)
            cache2 = {**cache2, "lengths": old_lengths + adv}
            bidx = jnp.arange(preds.shape[0])
            if is_dflash:
                # record the verify forward's features at rows
                # [old_len, old_len+K]; rows past the accepted prefix hold
                # rejected-draft conditioning and are overwritten as the
                # sequence re-reaches them (same approximation as the
                # standalone loop — verification keeps the output lossless)
                hidden_next = jax.vmap(
                    lambda f, h, s: jax.lax.dynamic_update_slice(f, h, (s, 0))
                )(hidden, hseq.astype(hidden.dtype), old_lengths)
            else:
                hidden_next = hseq[bidx, n_acc]
            return cache2, preds, n_acc, hidden_next

        return spec_decode

    # ------------------------------------------------------------------
    def submit(self, prompt_tokens, max_new_tokens=64, temperature=0.0,
               top_k=0, top_p=1.0, min_p=0.0, repetition_penalty=1.0,
               presence_penalty=0.0, frequency_penalty=0.0,
               eos_id=None, stop_sequences=None) -> Request:
        sampling = (temperature > 0 or top_k > 0 or top_p < 1.0 or min_p > 0
                    or repetition_penalty != 1.0 or presence_penalty != 0.0
                    or frequency_penalty != 0.0)
        if self.spec_k and sampling:
            no_pen = (repetition_penalty == 1.0 and presence_penalty == 0.0
                      and frequency_penalty == 0.0)
            if not (self.spec_sampling and no_pen):
                raise ValueError(
                    "speculative decode supports temperature/top-k/top-p/"
                    "min-p only with spec_sampling=True (rejection "
                    "sampling); penalties are not supported in spec mode"
                )
        if not 0.0 < top_p <= 1.0:
            raise ValueError("top_p must be in (0, 1]")
        if top_k < 0:
            raise ValueError("top_k must be >= 0 (0 disables)")
        if not 0.0 <= min_p < 1.0:
            raise ValueError("min_p must be in [0, 1)")
        if repetition_penalty <= 0.0:
            raise ValueError("repetition_penalty must be > 0 (1 disables)")
        prompt = list(map(int, prompt_tokens))
        if len(prompt) >= self.max_seq_len:
            raise ValueError("prompt exceeds max_seq_len")
        req = Request(
            id=next(self._ids), prompt=prompt,
            max_new_tokens=max_new_tokens, temperature=temperature,
            top_k=int(top_k), top_p=float(top_p), min_p=float(min_p),
            repetition_penalty=float(repetition_penalty),
            presence_penalty=float(presence_penalty),
            frequency_penalty=float(frequency_penalty),
            eos_id=eos_id,
            stop_sequences=tuple(
                tuple(map(int, ss)) for ss in (stop_sequences or ())
            ),
        )
        self._queue.append(req)
        return req

    @property
    def num_active(self) -> int:
        return sum(r is not None for r in self._slots)

    @property
    def num_decoding(self) -> int:
        return sum(
            r is not None and i not in self._prefilling
            for i, r in enumerate(self._slots)
        )

    def _bucket(self, n: int) -> int:
        for b in self.prefill_buckets:
            if n <= b:
                return b
        return self.prefill_buckets[-1]  # longer prompts stream in chunks

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    # ------------------------------------------------------------------
    def _admit(self, req: Request, slot: int) -> None:
        req.slot = slot
        self._slots[slot] = req
        self._prefilling.add(slot)
        # fresh penalty histograms for the slot's new occupant
        self._all_counts = self._all_counts.at[slot].set(0)
        self._out_counts = self._out_counts.at[slot].set(0)
        if self.paged:
            n = pages_needed(len(req.prompt) + 1, self.pcfg.page_size)
            pages = self.allocator.alloc(slot, n)
            if pages is None:  # pool exhausted: requeue and leave the slot
                self._slots[slot] = None
                self._prefilling.discard(slot)
                req.slot = None
                self._queue.appendleft(req)
                return
            self.cache = write_page_table(self.cache, slot, pages)

    def _prefill_chunk(self, req: Request) -> int:
        """Ingest the next chunk of req's prompt; returns tokens emitted."""
        slot = req.slot
        start = req.prefill_pos
        remaining = len(req.prompt) - start
        bucket = self._bucket(remaining)
        chunk = req.prompt[start : start + bucket]
        ids = np.zeros((1, bucket), np.int32)
        ids[0, : len(chunk)] = chunk
        final = start + len(chunk) >= len(req.prompt)
        self.stats["prefill_chunks"] += 1
        if self._is_dflash:
            self.cache, self._features, self._all_counts, packed = \
                self._prefill(
                    self._vars, self.cache, self._features, self._all_counts,
                    jnp.asarray(ids), slot, start, len(chunk),
                    jnp.float32(req.temperature),
                    jnp.int32(req.top_k), jnp.float32(req.top_p),
                    jnp.float32(req.min_p), self._next_key(),
                )
        else:
            self.cache, self._all_counts, packed, hid = self._prefill(
                self._vars, self.cache, self._all_counts, jnp.asarray(ids),
                slot, start, len(chunk), jnp.float32(req.temperature),
                jnp.int32(req.top_k), jnp.float32(req.top_p),
                jnp.float32(req.min_p), self._next_key(),
            )
        req.prefill_pos = start + len(chunk)
        if not final:
            return 0
        self._prefilling.discard(slot)
        if self.spec_k and not self._is_dflash:
            self._hidden = self._hidden.at[slot].set(hid)
        # device-side bookkeeping only: the slot's fed-back token comes
        # straight from the packed pair WITHOUT a host fetch, so the
        # decode dispatch can chain on-device; the host materializes
        # ``packed`` later (see _drain_prefills), overlapping its tunnel
        # round trip with the decode compute (~30 ms/tick on serving)
        self._tokens = self._tokens.at[slot, 0].set(
            packed[0].astype(jnp.int32))
        self._temps = self._temps.at[slot].set(req.temperature)
        self._topk = self._topk.at[slot].set(req.top_k)
        self._topp = self._topp.at[slot].set(req.top_p)
        self._minp = self._minp.at[slot].set(req.min_p)
        self._eos = self._eos.at[slot].set(
            -1 if req.eos_id is None else int(req.eos_id))
        self._rep = self._rep.at[slot].set(req.repetition_penalty)
        self._pres = self._pres.at[slot].set(req.presence_penalty)
        self._freq = self._freq.at[slot].set(req.frequency_penalty)
        self._pending_prefills.append((req, packed))
        return 1

    def _drain_prefills(self) -> None:
        """Materialize deferred prefill (token, logprob) pairs and run the
        host-side emission bookkeeping (stop checks, slot release)."""
        for req, packed in self._pending_prefills:
            packed_h = np.asarray(packed)
            req.out_tokens.append(int(packed_h[0]))
            req.out_logprobs.append(float(packed_h[1]))
            self.stats["prefill_tokens"] += 1
            self._finish_if_done(req)
        self._pending_prefills.clear()

    def _active_mask(self):
        return jnp.asarray(
            [1.0 if (r is not None and i not in self._prefilling) else 0.0
             for i, r in enumerate(self._slots)], jnp.float32)

    def _grow_pages(self, lookahead: int = 1) -> None:
        """Ensure each decoding slot has pages for its next ``lookahead``
        tokens (a burst writes up to that many before the host regains
        control)."""
        for slot, req in enumerate(self._slots):
            if req is None or slot in self._prefilling:
                continue
            cur_len = len(req.prompt) + len(req.out_tokens)
            # the device deactivates a slot at the cache cap, so never ask
            # the allocator for pages past max_seq_len
            tgt = min(cur_len + lookahead + self.spec_k, self.max_seq_len)
            need = pages_needed(tgt, self.pcfg.page_size)
            have = len(self.allocator.owned.get(slot, []))
            if need > have:
                new = self.allocator.alloc(slot, need - have)
                if new is None:
                    raise RuntimeError(
                        "KV page pool exhausted; raise kv_pages or lower load"
                    )
                self.cache = write_page_table(
                    self.cache, slot, self.allocator.owned[slot]
                )

    def step(self) -> int:
        """One scheduler tick: admissions/prefill chunks, then decode.
        Returns number of tokens produced."""
        produced = 0
        # 1) advance chunked prefills already in flight (one chunk each)
        for slot in sorted(self._prefilling):
            req = self._slots[slot]
            if req is not None:
                produced += self._prefill_chunk(req)
        # 2) admit queued requests into free slots
        admitted = 0
        while self._queue and admitted < self.max_admit:
            free = [i for i, r in enumerate(self._slots) if r is None]
            if not free:
                break
            req = self._queue.popleft()
            self._admit(req, free[0])
            if req.slot is None:
                break  # page pool full — stop admitting this tick
            produced += self._prefill_chunk(req)
            admitted += 1
        # 3) decode every tick for fully-prefilled slots
        if self.num_decoding == 0:
            self._drain_prefills()
            return produced
        if self.spec_k:
            self._drain_prefills()
            if self.paged:
                self._grow_pages()
            return produced + self._step_speculative()
        # burst (multi-step) decode when the scheduler has nothing else to
        # interleave: n ticks per host dispatch
        n = self.multi_step if (self._burst is not None and not self._queue
                                and not self._prefilling) else 1
        if n > 1:
            # burst 'remaining' counts host-side emissions — settle any
            # deferred prefill tokens first
            self._drain_prefills()
        if self.paged:
            self._grow_pages(lookahead=n)
        active = self._active_mask()
        if n > 1:
            remaining = jnp.asarray(
                [0 if (r is None or r.done) else
                 max(0, r.max_new_tokens - len(r.out_tokens))
                 for r in self._slots], jnp.int32)
            (self.cache, self._all_counts, self._out_counts, self._tokens,
             packed) = self._burst(
                self._vars, self.cache, self._tokens, self._temps,
                self._topk, self._topp, self._minp, self._rep, self._pres,
                self._freq, self._all_counts, self._out_counts,
                active > 0, self._eos, remaining, self._next_key(),
            )
            self.stats["decode_forwards"] += n
            packed_h = np.asarray(packed)       # [n, B, 3] — ONE fetch
            toks_host = packed_h[:, :, 0].astype(np.int64)
            lps_host = packed_h[:, :, 1]
            emits_host = packed_h[:, :, 2] > 0
            decoded = 0
            for i in range(n):
                for slot, req in enumerate(self._slots):
                    if req is None or req.done or not emits_host[i, slot]:
                        continue
                    req.out_tokens.append(int(toks_host[i, slot]))
                    req.out_logprobs.append(float(lps_host[i, slot]))
                    decoded += 1
                    self._finish_if_done(req)
            self.stats["tokens_emitted"] += decoded
            self.stats["decode_slot_steps"] += decoded
            return produced + decoded
        self.cache, self._all_counts, self._out_counts, toks, packed = \
            self._decode(
                self._vars, self.cache, self._tokens, self._temps,
                self._topk, self._topp, self._minp, self._rep, self._pres,
                self._freq, self._all_counts, self._out_counts, active,
                self._next_key(),
            )
        self.stats["decode_forwards"] += 1
        self._tokens = toks[:, None]
        # deferred prefill fetches ride the decode's compute window: the
        # decode above is already dispatched, so these round trips overlap
        self._drain_prefills()
        # one fetch: token ids ride exactly in f32 (vocab << 2^24)
        packed_h = np.asarray(packed)
        toks_host = packed_h[:, 0].astype(np.int64)
        lps_host = packed_h[:, 1]
        decoded = 0
        for slot, req in enumerate(self._slots):
            if req is None or req.done or slot in self._prefilling:
                continue
            req.out_tokens.append(int(toks_host[slot]))
            req.out_logprobs.append(float(lps_host[slot]))
            decoded += 1
            self._finish_if_done(req)
        self.stats["tokens_emitted"] += decoded
        self.stats["decode_slot_steps"] += decoded
        return produced + decoded

    def _step_speculative(self) -> int:
        """One batched draft-verify tick: up to spec_k+1 tokens per slot."""
        active = self._active_mask()
        hidden_in = self._features if self._is_dflash else self._hidden
        if self.spec_sampling:
            self.cache, preds, n_acc, hidden = self._spec_decode(
                self._vars, self.cache, self._tokens, hidden_in, active,
                self._temps, self._topk, self._topp, self._minp,
                self._next_key(),
            )
        else:
            self.cache, preds, n_acc, hidden = self._spec_decode(
                self._vars, self.cache, self._tokens, hidden_in, active
            )
        if self._is_dflash:
            self._features = hidden
        else:
            self._hidden = hidden
        self.stats["verify_forwards"] += 1
        preds_h = np.asarray(preds)
        n_h = np.asarray(n_acc)
        produced = 0
        for slot, req in enumerate(self._slots):
            if req is None or slot in self._prefilling:
                continue
            self.stats["draft_proposed"] += self.spec_k
            self.stats["draft_accepted"] += int(n_h[slot])
            self.stats["decode_slot_steps"] += 1
            emitted = preds_h[slot, : int(n_h[slot]) + 1]
            last_tok = None
            for tok in emitted:
                req.out_tokens.append(int(tok))
                req.out_logprobs.append(None)  # spec verify is greedy
                last_tok = int(tok)
                produced += 1
                self._finish_if_done(req)
                if req.done:
                    break
            if not req.done:
                # (out_tokens may have been TRIMMED by a stop-sequence
                # match, so feed the raw last emitted token, not [-1])
                self._tokens = self._tokens.at[slot, 0].set(last_tok)
        self.stats["tokens_emitted"] += produced
        return produced

    def _finish_if_done(self, req: Request):
        hit_eos = req.eos_id is not None and req.out_tokens and req.out_tokens[-1] == req.eos_id
        hit_stop = None
        for ss in req.stop_sequences:
            if (len(req.out_tokens) >= len(ss)
                    and tuple(req.out_tokens[-len(ss):]) == ss):
                hit_stop = ss
                break
        total_len = len(req.prompt) + len(req.out_tokens)
        # A speculative tick writes spec_k+1 cache positions at once; finish
        # early enough that the scatter can never run past max_seq_len
        # (out-of-bounds KV writes are dropped silently and the verify
        # forward would read garbage).
        seq_cap = self.max_seq_len - self._spec_reserve
        if (
            len(req.out_tokens) >= req.max_new_tokens
            or hit_eos
            or hit_stop is not None
            or total_len >= seq_cap
        ):
            req.stop_reason = ("eos" if hit_eos
                               else "stop" if hit_stop is not None
                               else "length")
            if hit_stop is not None:
                # vLLM convention: the matched stop sequence is trimmed
                req.out_tokens = req.out_tokens[: -len(hit_stop)]
                req.out_logprobs = req.out_logprobs[: -len(hit_stop)]
            req.done = True
            if req.slot is not None:
                if self.paged:
                    self.allocator.free_slot(req.slot)
                    self.cache = write_page_table(self.cache, req.slot, [])
                self._slots[req.slot] = None
                self._prefilling.discard(req.slot)
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


def _filter_logits(logits, top_k, top_p, min_p, temp):
    """Mask a [V] logit vector to its top-k / nucleus-p / min-p support
    (-inf elsewhere). top_k=0 / top_p=1.0 / min_p=0.0 are identities; ties
    at the threshold are kept (standard). The exact full-vocab formulation
    (like vLLM's): one descending sort feeds all filters. min-p applies to
    the TEMPERED distribution (vLLM order), i.e. keep logit >= max +
    T*ln(min_p)."""
    V = logits.shape[-1]
    f32 = logits.astype(jnp.float32)
    srt = jnp.sort(f32)[::-1]
    k = jnp.clip(jnp.where(top_k > 0, top_k, V), 1, V)
    kth = jnp.take(srt, k - 1)
    probs = jax.nn.softmax(srt)
    cum = jnp.cumsum(probs)
    # token i is kept if the mass BEFORE it is < p (the top-1 token is
    # always kept: its preceding mass is 0)
    keep = (cum - probs) < top_p
    pth = jnp.min(jnp.where(keep, srt, jnp.inf))
    mth = jnp.where(
        min_p > 0,
        srt[0] + jnp.maximum(temp, 1e-6)
        * jnp.log(jnp.maximum(min_p, 1e-30)),
        -jnp.inf,
    )
    thr = jnp.maximum(jnp.maximum(kth, pth), mth)
    return jnp.where(f32 < thr, -jnp.inf, f32)


def _filter_batch(logits, top_k, top_p, min_p, temps):
    """[B, V] batch filter; skips the per-slot sorts entirely (lax.cond)
    when no slot has a filter active — the greedy/temperature-only path
    pays nothing."""
    need = jnp.any((top_k > 0) | (top_p < 1.0) | (min_p > 0.0))
    return jax.lax.cond(
        need,
        lambda lg: jax.vmap(_filter_logits)(lg, top_k, top_p, min_p, temps),
        lambda lg: lg.astype(jnp.float32),
        logits,
    )


def _apply_penalties(last, all_counts, out_counts, rep, pres, freq):
    """vLLM-convention penalties on [B, V] logits: repetition (divide
    positive / multiply negative, over prompt+generated tokens),
    presence (flat, generated-only) and frequency (per-count,
    generated-only)."""
    f = last.astype(jnp.float32)
    seen = all_counts > 0
    r = rep[:, None]
    f = jnp.where(seen, jnp.where(f > 0, f / r, f * r), f)
    oc = out_counts.astype(jnp.float32)
    return f - pres[:, None] * (oc > 0) - freq[:, None] * oc


def _sample_lp(logits, temperature, key, filtered=None):
    """(token, log p(token | prefix)) — the token is drawn from the
    (optionally top-k/top-p filtered) tempered distribution; the reported
    logprob is under the UNTEMPERED, unfiltered distribution (the
    OpenAI/vLLM convention)."""
    tok = _sample(logits if filtered is None else filtered, temperature, key)
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)[tok]
    return tok, lp
