"""Calibrated data-dependent attention sparsity (skip-softmax).

Reference: modelopt/torch/sparsity/attention_sparsity/methods/
flash_skip_softmax.py (skip softmax tiles whose running max cannot survive)
+ calibration/calibrate.py (threshold calibration) +
calibration/ruler_dataset.py (long-context calibration data).

TPU design (see kernels/block_sparse_attention.py for why the decision
moves out of the kernel): per-block K min/max summaries -> Quest-style
per-block score upper bounds -> keep a block iff

    ub(block) >= max_block ub - tau        (+ forced sink/recent blocks)

Post-softmax mass of a dropped block is bounded by
``block_size * exp(-tau)`` relative to the winning block, so tau maps
directly onto a softmax-mass recall target; calibration measures ACTUAL
retained mass on long-context data (RULER-style needle sequences) and
picks the smallest tau meeting the target.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SkipSoftmaxConfig:
    """Static (trace-time) knobs; hashable so DecoderConfig stays jit-static.

    budget bounds worst-case block count (compute/HBM guarantee); tau does
    the data-dependent skipping below that bound.
    """

    block_size: int = 128
    tau: float = 8.0
    budget: float = 0.5          # max fraction of blocks attended
    sink_blocks: int = 1         # always keep the first blocks
    recent_blocks: int = 2       # always keep the newest blocks

    def num_selected(self, num_blocks: int) -> int:
        n = self.sink_blocks + self.recent_blocks + int(
            np.ceil(self.budget * num_blocks)
        )
        return int(min(num_blocks, max(1, n)))


def init_block_summaries(batch: int, max_len: int, kv_heads: int,
                         head_dim: int, block_size: int):
    """(kmax, kmin) [B, nb, KH, D] initialised so untouched blocks bound to
    -inf scores."""
    nb = max_len // block_size
    big = jnp.float32(3e38)
    return (
        jnp.full((batch, nb, kv_heads, head_dim), -big, jnp.float32),
        jnp.full((batch, nb, kv_heads, head_dim), big, jnp.float32),
    )


def update_block_summaries(kmax, kmin, k_new, start, block_size: int):
    """Fold newly-written tokens into their blocks' summaries.
    k_new [B, T, KH, D] REAL values (dequantized if the cache is fp8);
    start [B] first written position per slot."""
    B, T = k_new.shape[:2]
    rows = jnp.arange(B, dtype=jnp.int32)[:, None]
    blk = (start[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]) // block_size
    kf = k_new.astype(jnp.float32)
    return (
        kmax.at[rows, blk].max(kf, mode="drop"),
        kmin.at[rows, blk].min(kf, mode="drop"),
    )


def block_upper_bounds(q, kmax, kmin):
    """Quest bound: ub[b,i] = max over heads/groups of
    sum_d max(q_d*kmax_d, q_d*kmin_d) / sqrt(D). q [B, KH, G, D]."""
    D = q.shape[-1]
    qf = q.astype(jnp.float32)
    # per-element max(q*kmax, q*kmin) = relu(q)*kmax + min(q,0)*kmin, which
    # keeps the bound exact while staying two MXU einsums
    qp = jnp.maximum(qf, 0.0)
    qn = jnp.minimum(qf, 0.0)
    ub = (jnp.einsum("bhgd,bihd->bhgi", qp, kmax)
          + jnp.einsum("bhgd,bihd->bhgi", qn, kmin))
    ub = jnp.max(ub, axis=(1, 2)) / jnp.sqrt(jnp.float32(D))  # [B, nb]
    return ub


def select_blocks(q, kmax, kmin, lengths, cfg: SkipSoftmaxConfig):
    """-> (sel [B, NSEL] int32, nvalid [B] int32). Invalid tail entries of
    sel alias block 0 (they are masked by nvalid in the consumers)."""
    B, nb = kmax.shape[:2]
    bs = cfg.block_size
    NSEL = cfg.num_selected(nb)
    ub = block_upper_bounds(q, kmax, kmin)  # [B, nb]
    bidx = jnp.arange(nb, dtype=jnp.int32)[None, :]
    n_blocks = (lengths[:, None] + bs - 1) // bs  # blocks holding tokens
    in_range = bidx < n_blocks
    ub = jnp.where(in_range, ub, -jnp.inf)
    forced = (bidx < cfg.sink_blocks) | (bidx >= n_blocks - cfg.recent_blocks)
    forced = forced & in_range
    m = jnp.max(ub, axis=1, keepdims=True)
    keep = forced | (ub >= m - cfg.tau)
    # order by bound, forced blocks lifted above everything
    order_score = jnp.where(forced, jnp.inf, ub)
    order_score = jnp.where(keep, order_score, -jnp.inf)
    _, sel = jax.lax.top_k(order_score, NSEL)
    nvalid = jnp.minimum(jnp.sum(keep, axis=1), NSEL).astype(jnp.int32)
    # alias masked-out tail entries to block 0 so DMAs stay in bounds
    slot_ok = jnp.arange(NSEL, dtype=jnp.int32)[None, :] < nvalid[:, None]
    sel = jnp.where(slot_ok, sel, 0).astype(jnp.int32)
    return sel, nvalid


# ---------------------------------------------------------------------------
# Mode plumbing: rebuild the decoder with skip-softmax decode attention
# ---------------------------------------------------------------------------
def _register_mode():
    from ..core.mode import ModeDescriptor
    from .sparsification import SparsityModeRegistry

    @SparsityModeRegistry.register
    class SkipSoftmaxMode(ModeDescriptor):
        """config keys = SkipSoftmaxConfig fields."""

        name = "skip_softmax"

        def convert(self, bundle, config):
            cfg = dataclasses.replace(
                bundle.module.cfg,
                skip_softmax=SkipSoftmaxConfig(**(config or {})),
            )
            module = type(bundle.module)(cfg)
            return bundle.replace(module=module), {}

        def config_from_dict(self, d):
            return d or {}

        def config_to_dict(self, c):
            return c or {}

    return SkipSoftmaxMode


SkipSoftmaxMode = _register_mode()


def sparsify_attention_dynamic(bundle, block_size=128, tau=8.0, budget=0.5,
                               sink_blocks=1, recent_blocks=2):
    """Return a bundle whose decode path attends only calibrated-relevant
    KV blocks (replayable mode record, like attention_sparsity)."""
    from ..core.bundle import apply_mode

    return apply_mode(bundle, "skip_softmax", {
        "block_size": block_size, "tau": tau, "budget": budget,
        "sink_blocks": sink_blocks, "recent_blocks": recent_blocks,
    })


# ---------------------------------------------------------------------------
# RULER-style synthetic long-context calibration data
# ---------------------------------------------------------------------------
def ruler_needle_batches(vocab_size: int, num_batches: int = 4,
                         batch_size: int = 2, seq_len: int = 1024,
                         num_needles: int = 4, needle_len: int = 8,
                         seed: int = 0):
    """Needle-in-a-haystack sequences (reference:
    attention_sparsity/calibration/ruler_dataset.py): random filler with
    repeated (key, value) needle spans planted at random depths and the
    needle keys replayed near the end — attention from the tail MUST reach
    the planted spans, so a threshold calibrated on this data preserves
    long-range retrieval, not just local mass."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(num_batches):
        ids = rng.integers(0, vocab_size, (batch_size, seq_len))
        for b in range(batch_size):
            tail = seq_len - num_needles * needle_len - 1
            for n in range(num_needles):
                span = rng.integers(0, vocab_size, needle_len)
                depth = rng.integers(0, max(1, tail - needle_len))
                ids[b, depth:depth + needle_len] = span
                # replay the needle key at the end (query section)
                qpos = tail + n * needle_len
                ids[b, qpos:qpos + needle_len] = span
        out.append(jnp.asarray(ids, jnp.int32))
    return out


def calibrate_skip_softmax(bundle, token_batches, recall_target: float = 0.99,
                           block_size: int = 128,
                           tau_grid=(2.0, 4.0, 6.0, 8.0, 12.0, 16.0),
                           budget: float = 1.0):
    """Pick the smallest tau whose retained softmax mass meets
    ``recall_target`` on the worst (layer, batch) — then return a bundle
    with skip-softmax applied at that tau.

    Captures q/k straight from the q/k quantizer capture points (one
    forward per batch in CAPTURE phase — no hooks, reference counterpart:
    calibration/calibrate.py's per-softmax stats collection).
    """
    import contextlib

    from ..core.bundle import PHASE_CAPTURE
    from ..nn.quantizer import _CAPTURE_FILTER

    @contextlib.contextmanager
    def _filter(pat):
        tok = _CAPTURE_FILTER.set(pat)
        try:
            yield
        finally:
            _CAPTURE_FILTER.reset(tok)

    recalls = {tau: 1.0 for tau in tau_grid}
    # per-(layer, head) retained-mass minima over the calibration stream —
    # the reference's per-softmax stats collection (calibration/
    # calibrate.py); the shared block table is governed by the WORST head,
    # and this report shows which one that is
    head_stats: dict = {}
    for ids in token_batches:
        with _filter("*attn/[qk]_quantizer"):
            _, state = bundle.apply(ids, phase=PHASE_CAPTURE,
                                    mutable=["quant_capture"])
        cap = state["quant_capture"]
        for lname, layer in cap.items():
            if not lname.startswith("layers_"):
                continue
            qx = layer["attn"]["q_quantizer"]["x"][0]  # [B*T*H?, D] flat rows
            kx = layer["attn"]["k_quantizer"]["x"][0]
            B, T = ids.shape
            D = qx.shape[-1]
            q = np.asarray(qx, np.float32).reshape(B, T, -1, D)
            k = np.asarray(kx, np.float32).reshape(B, T, -1, D)
            r, heads = _tail_recall_curve(q, k, block_size, tau_grid,
                                          return_heads=True)
            hs = head_stats.setdefault(lname, {})
            for tau in tau_grid:
                recalls[tau] = min(recalls[tau], r[tau])
                prev = hs.get(tau)
                hs[tau] = (heads[tau] if prev is None
                           else np.minimum(prev, heads[tau]))
    chosen = None
    for tau in sorted(tau_grid):
        if recalls[tau] >= recall_target:
            chosen = tau
            break
    if chosen is None:
        chosen = max(tau_grid)
    worst = None
    if head_stats:
        worst = min(
            ((ln, int(np.argmin(hs[chosen])), float(hs[chosen].min()))
             for ln, hs in head_stats.items() if chosen in hs),
            key=lambda t: t[2], default=None)
    b = sparsify_attention_dynamic(bundle, block_size=block_size, tau=chosen,
                                   budget=budget)
    return b, {
        "tau": chosen,
        "recalls": {str(t): float(r) for t, r in recalls.items()},
        "per_head_recalls": {
            ln: {str(t): [float(x) for x in hs[t]] for t in tau_grid}
            for ln, hs in head_stats.items()
        },
        "worst_head": (None if worst is None else
                       {"layer": worst[0], "head": worst[1],
                        "recall": worst[2]}),
    }


def _tail_recall_curve(q, k, block_size, tau_grid, return_heads=False):
    """Retained softmax mass for the LAST query position (the decode
    regime) per tau. q/k [B, T, H(kv), D]. With ``return_heads`` also
    returns per-HEAD minima over the batch ({tau: [H] array})."""
    B, T, KH, D = k.shape
    nb = T // block_size
    if nb < 2:
        flat = {tau: 1.0 for tau in tau_grid}
        if return_heads:
            H = q.shape[2]
            return flat, {tau: np.ones(H) for tau in tau_grid}
        return flat
    Tb = nb * block_size
    kb = k[:, :Tb].reshape(B, nb, block_size, KH, D)
    kmax = kb.max(axis=2)
    kmin = kb.min(axis=2)
    G = q.shape[2] // KH
    qlast = q[:, Tb - 1].reshape(B, KH, G, D)  # last in-block query
    ub = np.asarray(block_upper_bounds(
        jnp.asarray(qlast), jnp.asarray(kmax), jnp.asarray(kmin)))
    # true per-block mass at the last position
    s = np.einsum("bhgd,btkd->bhgt", qlast,
                  k[:, :Tb].reshape(B, Tb, KH, D)) / np.sqrt(D)
    # collapse kv-head groups the same way select_blocks does (worst case
    # over heads is what the shared block table serves)
    s = s.reshape(B, KH * G, Tb)
    s = s - s.max(axis=-1, keepdims=True)
    p = np.exp(s)
    p /= p.sum(axis=-1, keepdims=True)
    pb = p.reshape(B, KH * G, nb, block_size).sum(-1)  # [B, H, nb]
    m = ub.max(axis=1, keepdims=True)  # [B, 1]
    out = {}
    heads = {}
    for tau in tau_grid:
        keep = ub >= m - tau  # [B, nb]
        kept_mass = (pb * keep[:, None, :]).sum(-1)  # [B, H]
        out[tau] = float(kept_mass.min())
        heads[tau] = kept_mass.min(axis=0)  # [H] worst over batch
    if return_heads:
        return out, heads
    return out
