"""Utils tests: timers, tracking, dataset helpers, seeding."""

import json
import os

import jax.numpy as jnp
import numpy as np

from modelopt_tpu.utils import (
    AccumulatingTimer,
    Timer,
    create_forward_loop,
    get_dataset_batches,
    named_key,
    seed_everything,
    start_run,
    synthetic_token_batches,
)


def test_timer():
    with Timer("t") as t:
        sum(range(1000))
    assert t.elapsed > 0


def test_accumulating_timer():
    AccumulatingTimer.reset()
    for _ in range(3):
        with AccumulatingTimer("x"):
            pass
    rep = AccumulatingTimer.report()
    assert "x: " in rep and "3 calls" in rep


def test_tracking_local_backend(tmp_path):
    with start_run("test", root=str(tmp_path)) as run:
        run.log_param("preset", "FP8")
        run.log_metric("ppl", 12.5, step=1)
    events = [json.loads(l) for l in open(tmp_path / "test" / "events.jsonl")]
    kinds = [e["event"] for e in events]
    assert kinds == ["start", "param", "metric", "end"]


def test_forward_loop_and_batches():
    batches = get_dataset_batches("synthetic", vocab_size=100, num_batches=3,
                                  batch_size=2, seq_len=8)
    assert len(batches) == 3 and batches[0].shape == (2, 8)
    seen = []
    loop = create_forward_loop(batches)
    loop(lambda b: seen.append(b.shape))
    assert len(seen) == 3


def test_named_keys_deterministic():
    seed_everything(7)
    k1 = named_key("calib")
    k2 = named_key("calib")
    k3 = named_key("lora")
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
    assert not np.array_equal(np.asarray(k1), np.asarray(k3))
