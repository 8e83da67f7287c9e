"""Structured metrics + timing + device-memory observability.

The reference's observability is printf-only (config echo E:1024-1040,
per-epoch loss/acc/time E:547,1641, cudaMemGetInfo tracker E:929-933,
1360-1368). We keep the same console contract in the Trainer and add a
JSONL sink and a jax-native memory/timing report here.
"""

from __future__ import annotations

import json
import time
from typing import Any, IO

import jax


class JsonlSink:
    def __init__(self, path: str):
        self.path = path
        self._f: IO | None = open(path, "a", buffering=1)

    def write(self, record: dict[str, Any]) -> None:
        if self._f is None:
            raise ValueError(f"JsonlSink({self.path!r}) is closed")
        record = dict(record, ts=time.time())
        self._f.write(json.dumps(record) + "\n")

    def close(self) -> None:
        if self._f is not None:
            self._f.close()
            self._f = None


def device_memory_report() -> dict[str, int]:
    """Per-device allocated bytes (counterpart of cudaMemGetInfo prints)."""
    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
        except Exception:
            stats = None
        if stats:
            out[str(d)] = int(stats.get("bytes_in_use", 0))
    return out


class StepTimer:
    """block_until_ready wall-clock timing for benchmark loops."""

    def __init__(self):
        self.times_ms: list[float] = []

    def time(self, fn, *args) -> Any:
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        self.times_ms.append((time.perf_counter() - t0) * 1e3)
        return out

    @property
    def best_ms(self) -> float:
        return min(self.times_ms)

    @property
    def mean_ms(self) -> float:
        return sum(self.times_ms) / len(self.times_ms)
