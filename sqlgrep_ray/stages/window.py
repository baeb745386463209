"""Windowed / session aggregation over event streams.

The reference has no windowing (its only "streaming" is the follow-mode
re-render, SURVEY §2.9); these are the batch-world window operators a
log/telemetry pipeline needs, composed from Ray Data primitives per
SURVEY §2's custom-operator guidance (map_batches + groupby().map_groups +
in-group sort).

* ``tumbling_window`` — fixed-width windows: floor(ts / width) is computed
  vectorized per batch, then the window key joins the ordinary combiner-first
  aggregate path — NO extra shuffle beyond the groupby.
* ``sessionize``     — gap-based sessions per key: groupby(key) ships each
  key's events to one task, which sorts by time and splits on gaps >
  ``gap``. Partitioning assumption (documented): one key's events fit one
  worker — same contract as the reference's in-memory group state. For
  hot keys, pre-split by day first (compose with tumbling_window keys).

Both emit plain Datasets, so downstream plans (HAVING, sort, limit) compose.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from sqlgrep_ray.functions.exprs import Col
from sqlgrep_ray.pipelines.plan import AggItem, AggregatePlan, GroupKey
from sqlgrep_ray.pipelines.runner import run_plan


def tumbling_window(
    ds: "ray.data.Dataset",
    ts_col: str,
    width_s: int,
    aggs: Sequence[AggItem],
    extra_keys: Sequence[str] = (),
    window_col: str = "window_start",
    small_result: bool = True,
) -> "ray.data.Dataset":
    """Aggregate into fixed ``width_s``-second windows of ``ts_col``.

    The window start is computed vectorized (integer floor of the epoch) and
    becomes an ordinary group key, so skew/scale behavior is exactly the
    aggregate engine's.
    """
    width_us = width_s * 1_000_000

    def add_window(t: pa.Table) -> pa.Table:
        us = t[ts_col]
        if isinstance(us, pa.ChunkedArray):
            us = us.combine_chunks()
        epoch = us.cast(pa.int64())
        start = pc.multiply(pc.divide(epoch, width_us), width_us)  # floor
        return t.append_column(window_col, start.cast(pa.timestamp("us")))

    windowed = ds.map_batches(
        add_window, batch_format="pyarrow", zero_copy_batch=True
    )
    keys = [GroupKey(window_col, Col(window_col))] + [
        GroupKey(k, Col(k)) for k in extra_keys
    ]
    plan = AggregatePlan(
        group_by=tuple(keys), aggs=tuple(aggs), small_result=small_result
    )
    return run_plan(windowed, plan)


def sessionize(
    ds: "ray.data.Dataset",
    key: str,
    ts_col: str,
    gap_s: float,
) -> "ray.data.Dataset":
    """Split each key's events into sessions separated by gaps > ``gap_s``.

    Output: one row per (key, session) with ``session_idx`` (0-based, in time
    order), ``n_events``, ``session_start``, ``session_end``,
    ``duration_s``. Per-key events are sorted and split inside one task
    (see module doc for the partitioning assumption).
    """
    gap_us = int(gap_s * 1_000_000)

    def split_sessions(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g, [(ts_col, "ascending")])
        g = g.take(order)
        ts = g[ts_col].combine_chunks().cast(pa.int64()).to_numpy()
        n = len(ts)
        new_session = np.r_[True, (ts[1:] - ts[:-1]) > gap_us]
        sess = np.cumsum(new_session) - 1
        n_sessions = int(sess[-1]) + 1 if n else 0
        starts = np.flatnonzero(new_session)
        ends = np.r_[starts[1:], n] - 1
        return pa.table(
            {
                key: pa.concat_arrays([g[key][:1].combine_chunks()] * n_sessions)
                if n_sessions
                else g[key][:0].combine_chunks(),
                "session_idx": pa.array(
                    np.arange(n_sessions, dtype=np.int64)
                ),
                "n_events": pa.array((ends - starts + 1).astype(np.int64)),
                "session_start": pa.array(ts[starts], pa.timestamp("us")),
                "session_end": pa.array(ts[ends], pa.timestamp("us")),
                "duration_s": pa.array(
                    (ts[ends] - ts[starts]) / 1e6, pa.float64()
                ),
            }
        )

    return ds.select_columns([key, ts_col]).groupby(key).map_groups(
        split_sessions, batch_format="pyarrow"
    )
