"""RULER-style long-context calibration task suite for attention sparsity
(reference: modelopt/torch/sparsity/attention_sparsity/calibration/
ruler_dataset.py — RulerTask configs, RulerDatasetBuilder, niah /
variable-tracking / frequency-words task generators, length sweeps).

The reference builds TEXT samples from corpora (Paul Graham essays,
SQuAD) through a tokenizer. This environment serves token-level models
directly, so each task has a TOKEN-LEVEL generator producing the same
retrieval structure — what the calibration actually needs is attention
patterns (long-range single/multi-key retrieval, chained hops, global
frequency aggregation), not English. When a ``tokenizer`` is supplied,
the niah generator emits the reference's text template instead, so real
corpora plug in unchanged once mounted.

Task taxonomy (mirrors RULER_TASKS):
  * ``niah_single``      — one needle key, one value, queried at the end;
  * ``niah_multikey``    — K distractor keys, one queried;
  * ``niah_multiquery``  — K keys, several queried;
  * ``niah_multivalue``  — one key carrying several values;
  * ``vt``               — variable-tracking hop chains (x1 = V; x2 = x1;
                            ... query the chain tail);
  * ``fwe``              — zipf-coded words, top-3 frequency extraction.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class RulerTask:
    """One calibration task configuration (reference: RulerTask)."""

    name: str
    task_type: str            # niah | variable_tracking | freq_words
    args: tuple = ()          # (key, value) pairs — hashable

    def arg(self, k, default=None):
        return dict(self.args).get(k, default)


RULER_TASKS = {
    "niah_single": RulerTask(
        "niah_single", "niah",
        (("num_keys", 1), ("num_values", 1), ("num_queries", 1))),
    "niah_multikey": RulerTask(
        "niah_multikey", "niah",
        (("num_keys", 4), ("num_values", 1), ("num_queries", 1))),
    "niah_multiquery": RulerTask(
        "niah_multiquery", "niah",
        (("num_keys", 4), ("num_values", 1), ("num_queries", 3))),
}
RULER_TASKS["niah_multivalue"] = RulerTask(
    "niah_multivalue", "niah",
    (("num_keys", 2), ("num_values", 3), ("num_queries", 1)))
RULER_TASKS["vt"] = RulerTask(
    "vt", "variable_tracking", (("num_chains", 2), ("num_hops", 4)))
RULER_TASKS["fwe"] = RulerTask(
    "fwe", "freq_words", (("alpha", 2.0), ("num_words", 16)))


class RulerDatasetBuilder:
    """Build long-context calibration batches across tasks and lengths
    (reference: RulerDatasetBuilder.build_calibration_dataset — samples
    are distributed across tasks, each swept over target lengths)."""

    def __init__(self, vocab_size: int, seq_lengths=(1024,),
                 tasks=("niah_multikey", "vt", "fwe"),
                 samples_per_task: int = 2, span_len: int = 8,
                 seed: int = 0, tokenizer=None):
        self.vocab_size = int(vocab_size)
        self.seq_lengths = tuple(int(x) for x in seq_lengths)
        self.tasks = tuple(
            t if isinstance(t, RulerTask) else RULER_TASKS[t] for t in tasks
        )
        self.samples_per_task = int(samples_per_task)
        self.span_len = int(span_len)
        self.rng = np.random.default_rng(seed)
        self.tokenizer = tokenizer

    # ---- low-level helpers -------------------------------------------
    def _span(self):
        """A random multi-token 'word' (needle key/value, variable name)."""
        return self.rng.integers(0, self.vocab_size, self.span_len)

    def _fill(self, n):
        return self.rng.integers(0, self.vocab_size, n)

    # ---- task generators (one row each) ------------------------------
    def _niah_row(self, L, task: RulerTask):
        nk = task.arg("num_keys", 1)
        nv = task.arg("num_values", 1)
        nq = task.arg("num_queries", 1)
        sl = self.span_len
        row = self._fill(L)
        tail = (nq * (1 + nv)) * sl        # query section at the end
        body_end = L - tail
        keys, values = [], []
        for _ in range(nk):
            k = self._span()
            vs = [self._span() for _ in range(nv)]
            keys.append(k)
            values.append(vs)
            # plant "key value..." spans at a random depth
            need = (1 + nv) * sl
            at = self.rng.integers(0, max(1, body_end - need))
            row[at:at + sl] = k
            for j, v in enumerate(vs):
                row[at + (1 + j) * sl:at + (2 + j) * sl] = v
        # queries: replay queried keys (and expected values, teacher-forced)
        qidx = self.rng.choice(nk, size=min(nq, nk), replace=False)
        pos = body_end
        for qi in qidx:
            row[pos:pos + sl] = keys[qi]
            pos += sl
            for v in values[qi]:
                row[pos:pos + sl] = v
                pos += sl
        return row

    def _vt_row(self, L, task: RulerTask):
        """Variable-tracking: chains of assignments x_{i+1} <- x_i spread
        over the context; the tail replays the chain head so attention
        must hop through every link (reference _generate_vt_sample)."""
        chains = task.arg("num_chains", 1)
        hops = task.arg("num_hops", 4)
        sl = self.span_len
        row = self._fill(L)
        triple = 2 * sl                    # (var, prev-var/value) pair
        tail = chains * (hops + 2) * sl
        body_end = L - tail
        pos = body_end
        for _ in range(chains):
            names = [self._span() for _ in range(hops + 1)]
            value = self._span()
            # x0 = value, planted first; then x_{i+1} = x_i at later depths
            depths = np.sort(self.rng.integers(
                0, max(1, body_end - triple), hops + 1))
            row[depths[0]:depths[0] + sl] = names[0]
            row[depths[0] + sl:depths[0] + 2 * sl] = value
            for i in range(hops):
                at = depths[i + 1]
                row[at:at + sl] = names[i + 1]
                row[at + sl:at + 2 * sl] = names[i]
            # query: replay the chain tail, then the value it resolves to
            row[pos:pos + sl] = names[-1]
            row[pos + sl:pos + 2 * sl] = value
            pos += (hops + 2) * sl
        return row

    def _fwe_row(self, L, task: RulerTask):
        """Frequency-words extraction: zipf-coded multi-token words; the
        top words dominate and the tail replays them (reference
        _generate_fwe_sample — zeta-distributed coded words)."""
        alpha = task.arg("alpha", 2.0)
        nw = task.arg("num_words", 16)
        sl = self.span_len
        words = [self._span() for _ in range(nw)]
        ranks = np.arange(1, nw + 1, dtype=np.float64)
        p = ranks ** (-alpha)
        p /= p.sum()
        n_slots = L // sl
        choice = self.rng.choice(nw, size=n_slots, p=p)
        row = np.concatenate([words[c] for c in choice])[:L]
        row = np.concatenate([row, self._fill(L - len(row))])[:L]
        # tail replays the top-3 words (the expected answer)
        top3 = np.argsort(-np.bincount(choice, minlength=nw))[:3]
        pos = L - 3 * sl
        for t in top3:
            row[pos:pos + sl] = words[t]
            pos += sl
        return row

    def _niah_text(self, task: RulerTask):
        """Reference text template path (needs a tokenizer)."""
        import uuid

        key = str(uuid.uuid4())[:8]
        val = str(self.rng.integers(10**6, 10**7))
        context = (f"One of the special magic numbers for {key} is "
                   f"{val}.\n") * 4
        text = (
            "Some special magic numbers are hidden within the following "
            "text. Make sure to memorize it. I will quiz you about the "
            f"numbers afterwards.\n{context}\nWhat are all the special "
            f"magic numbers for {key} mentioned in the provided text? "
            f"The special magic numbers for {key} mentioned in the "
            f"provided text are {val}"
        )
        ids = self.tokenizer(text)["input_ids"]
        return np.asarray(ids, np.int64)

    # ---- public API ---------------------------------------------------
    def build_calibration_batches(self, batch_size: int = 2):
        """-> list of [batch, L] int32 arrays: every task x target length,
        ``samples_per_task`` rows each, batched per (task, length)."""
        out = []
        for task in self.tasks:
            for L in self.seq_lengths:
                rows = []
                for _ in range(self.samples_per_task * batch_size):
                    if self.tokenizer is not None and task.task_type == "niah":
                        r = self._niah_text(task)
                        r = np.pad(r[:L], (0, max(0, L - len(r))))
                    elif task.task_type == "niah":
                        r = self._niah_row(L, task)
                    elif task.task_type == "variable_tracking":
                        r = self._vt_row(L, task)
                    else:
                        r = self._fwe_row(L, task)
                    rows.append(np.asarray(r[:L], np.int32))
                arr = np.stack(rows)
                for off in range(0, len(arr), batch_size):
                    out.append(jnp.asarray(arr[off:off + batch_size]))
        return out


def calibrate_with_ruler(bundle, recall_target: float = 0.99,
                         block_size: int = 128,
                         tau_grid=(2.0, 4.0, 6.0, 8.0, 12.0, 16.0),
                         budget: float = 1.0, **builder_kw):
    """One-call RULER calibration (reference flow: build_calibration_dataset
    -> calibrate): build the task-suite batches for this model's vocab and
    pick the smallest tau meeting ``recall_target`` on the worst
    (layer, head); info carries the per-head recall report."""
    from .skip_softmax import calibrate_skip_softmax

    builder = RulerDatasetBuilder(
        vocab_size=bundle.module.cfg.vocab_size, **builder_kw)
    batches = builder.build_calibration_batches()
    return calibrate_skip_softmax(
        bundle, batches, recall_target=recall_target,
        block_size=block_size, tau_grid=tau_grid, budget=budget)
