"""Per-stage / per-partition job metrics.

The reference tracks wall time, ingested bytes, line count and result rows
(``src/executor.rs:12-36``, printed by ``main.rs:210-216``). Distributed
equivalent: a named Ray counter actor that stages increment per batch
(fire-and-forget, so the hot path never blocks on the driver), plus the
per-chunk lineage entries written by ``state.checkpoint``.

Usage::

    mc = MetricsCollector.create()
    ds = ds.map_batches(mc.counting("parse", TranscriptRouter()), ...)
    ...; print(mc.snapshot())
"""

from __future__ import annotations

import time
from typing import Any, Callable

import pyarrow as pa
import ray


@ray.remote(num_cpus=0)
class _CounterActor:
    def __init__(self) -> None:
        self._counts: dict[str, int] = {}
        self._t0 = time.time()

    def incr(self, key: str, n: int) -> None:
        self._counts[key] = self._counts.get(key, 0) + n

    def snapshot(self) -> dict[str, Any]:
        return {"counters": dict(self._counts), "elapsed_s": time.time() - self._t0}


class MetricsCollector:
    """Driver-side handle around the counter actor."""

    def __init__(self, actor: "ray.actor.ActorHandle"):
        self.actor = actor

    @classmethod
    def create(cls) -> "MetricsCollector":
        return cls(_CounterActor.remote())

    def counting(
        self, stage: str, fn: Callable[[pa.Table], pa.Table]
    ) -> Callable[[pa.Table], pa.Table]:
        """Wrap a batch fn to count rows in/out of ``stage`` (fire-and-forget)."""
        actor = self.actor

        def wrapped(batch: pa.Table) -> pa.Table:
            out = fn(batch)
            actor.incr.remote(f"{stage}.rows_in", batch.num_rows)
            actor.incr.remote(f"{stage}.rows_out", out.num_rows)
            return out

        wrapped.__name__ = f"counted_{stage}"
        return wrapped

    def snapshot(
        self, stabilize: bool = True, timeout_s: float = 10.0
    ) -> dict[str, Any]:
        """Current counters. Increments are fire-and-forget from worker
        tasks, so messages can still be in flight when the pipeline's driver
        call returns; ``stabilize`` polls until two consecutive reads agree
        (bounded by ``timeout_s``) — driver-side only, never the hot path."""
        snap = ray.get(self.actor.snapshot.remote())
        if not stabilize:
            return snap
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            time.sleep(0.1)
            nxt = ray.get(self.actor.snapshot.remote())
            if nxt["counters"] == snap["counters"]:
                return nxt
            snap = nxt
        return snap
