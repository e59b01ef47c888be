"""Timers and device-memory reporting
(reference: modelopt/torch/utils/perf.py:84,118 Timer/AccumulatingTimer,
utils/memory_monitor.py:57 GPUMemoryMonitor).

TPU-safe timing: a Timer can force a device barrier via a data fetch — plain
block_until_ready is unreliable over remote runtimes (see
.claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import threading
import time
from collections import defaultdict


class Timer:
    def __init__(self, name: str = "", sync_value=None):
        self.name = name
        self._sync_value = sync_value
        self.elapsed = 0.0

    def _sync(self):
        if self._sync_value is not None:
            import jax
            import jax.numpy as jnp

            jax.device_get(jnp.sum(self._sync_value))

    def __enter__(self):
        self._sync()
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self._sync()
        self.elapsed = time.perf_counter() - self._t0
        return False


class AccumulatingTimer:
    """Accumulates across enters; per-name aggregate stats."""

    _stats: dict = defaultdict(lambda: [0.0, 0])

    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        s = AccumulatingTimer._stats[self.name]
        s[0] += dt
        s[1] += 1
        return False

    @classmethod
    def report(cls) -> str:
        lines = [
            f"{name}: total {tot:.4f}s over {n} calls ({tot / max(n,1) * 1e3:.2f} ms/call)"
            for name, (tot, n) in sorted(cls._stats.items())
        ]
        return "\n".join(lines)

    @classmethod
    def reset(cls):
        cls._stats.clear()


def device_memory_stats() -> dict:
    """Per-device memory stats where the backend exposes them."""
    import jax

    out = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
            out[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                "bytes_limit": s.get("bytes_limit"),
            }
        except Exception:
            out[str(d)] = {}
    return out


class MemoryMonitor:
    """Background thread sampling device memory highwater
    (reference: memory_monitor.py watchdog)."""

    def __init__(self, interval_s: float = 1.0):
        self.interval = interval_s
        self.peak = 0
        self._stop = threading.Event()
        self._thread = None

    def _run(self):
        while not self._stop.wait(self.interval):
            for st in device_memory_stats().values():
                b = st.get("bytes_in_use") or 0
                self.peak = max(self.peak, b)

    def __enter__(self):
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._thread.join(timeout=2)
        return False
