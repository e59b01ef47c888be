"""RULER calibration task suite (reference: attention_sparsity/calibration/
ruler_dataset.py task taxonomy + calibrate.py per-head stats)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modelopt_tpu.core import ModelBundle
from modelopt_tpu.models import Decoder, tiny_test_config
from modelopt_tpu.sparsity import (
    RULER_TASKS,
    RulerDatasetBuilder,
    calibrate_with_ruler,
)


class TestBuilder:
    def test_task_taxonomy(self):
        assert {"niah_single", "niah_multikey", "niah_multiquery",
                "niah_multivalue", "vt", "fwe"} <= set(RULER_TASKS)

    def test_batches_cover_tasks_and_lengths(self):
        b = RulerDatasetBuilder(vocab_size=256, seq_lengths=(256, 512),
                                tasks=("niah_multikey", "vt", "fwe"),
                                samples_per_task=1)
        batches = b.build_calibration_batches(batch_size=2)
        assert len(batches) == 3 * 2  # tasks x lengths
        shapes = {t.shape for t in batches}
        assert shapes == {(2, 256), (2, 512)}
        for t in batches:
            a = np.asarray(t)
            assert a.dtype == np.int32 and a.min() >= 0 and a.max() < 256

    def test_niah_query_replays_planted_key(self):
        b = RulerDatasetBuilder(vocab_size=997, seq_lengths=(256,),
                                tasks=("niah_single",), samples_per_task=1,
                                span_len=8, seed=1)
        row = np.asarray(b.build_calibration_batches(batch_size=1)[0][0])
        # the query section (last 16 tokens) replays a span that also
        # occurs earlier in the body — the long-range retrieval structure
        key = row[-16:-8]
        body = row[:-16]
        found = any(np.array_equal(body[i:i + 8], key)
                    for i in range(len(body) - 8))
        assert found

    def test_vt_chain_links_present(self):
        b = RulerDatasetBuilder(vocab_size=997, seq_lengths=(512,),
                                tasks=("vt",), samples_per_task=1,
                                span_len=4, seed=2)
        row = np.asarray(b.build_calibration_batches(batch_size=1)[0][0])
        # the tail's queried variable name appears somewhere in the body
        # (as the head of the last assignment link)
        chains, hops, sl = 2, 4, 4
        tail = chains * (hops + 2) * sl
        qname = row[len(row) - tail:len(row) - tail + sl]
        body = row[:len(row) - tail]
        assert any(np.array_equal(body[i:i + sl], qname)
                   for i in range(len(body) - sl))

    def test_fwe_zipf_tail_has_top_words(self):
        b = RulerDatasetBuilder(vocab_size=997, seq_lengths=(512,),
                                tasks=("fwe",), samples_per_task=1,
                                span_len=4, seed=3)
        row = np.asarray(b.build_calibration_batches(batch_size=1)[0][0])
        # the most frequent 4-gram of the body is replayed in the tail
        body, tail = row[:-12], row[-12:]
        from collections import Counter
        c = Counter(tuple(body[i:i + 4]) for i in range(0, len(body) - 4, 4))
        top = c.most_common(1)[0][0]
        assert any(tuple(tail[i:i + 4]) == top for i in range(0, 9, 4))


def test_calibrate_with_ruler_per_head_stats():
    cfg = tiny_test_config(dtype=jnp.float32, max_position_embeddings=512)
    m = Decoder(cfg)
    ids = jnp.zeros((1, 8), jnp.int32)
    v = m.init(jax.random.PRNGKey(0), ids)
    bundle = ModelBundle(module=m, variables=dict(v), example_inputs=(ids,))
    sb, info = calibrate_with_ruler(
        bundle, recall_target=0.95, block_size=64,
        seq_lengths=(512,), tasks=("niah_multikey", "vt"),
        samples_per_task=1)
    assert sb.module.cfg.skip_softmax is not None
    assert info["tau"] in (2.0, 4.0, 6.0, 8.0, 12.0, 16.0)
    # per-head report: one entry per layer, H recalls per tau, and the
    # worst head is identified (it governs the shared block table)
    ph = info["per_head_recalls"]
    assert len(ph) == cfg.num_layers
    anyl = next(iter(ph.values()))
    assert len(anyl[str(info["tau"])]) == cfg.num_heads
    assert info["worst_head"] is not None
    assert 0 <= info["worst_head"]["head"] < cfg.num_heads
    # the chosen tau meets the target on the worst head
    assert info["worst_head"]["recall"] >= 0.0
