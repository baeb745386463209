"""Windowed / session aggregation over event streams.

The reference has no windowing (its only "streaming" is the follow-mode
re-render, SURVEY §2.9); these are the batch-world window operators a
log/telemetry pipeline needs, composed from Ray Data primitives per
SURVEY §2's custom-operator guidance (map_batches + groupby().map_groups +
in-group sort).

* ``tumbling_window`` / ``hopping_window`` — fixed/sliding windows: the
  window start is computed vectorized per batch and joins the ordinary
  combiner-first aggregate path — NO extra shuffle beyond the groupby.
* ``sessionize`` / ``assign_sessions`` / ``trailing_window_agg`` and the
  window functions (``lag_shift``, ``partition_row_number`` incl.
  rank/dense_rank, ``partition_running``, ``partition_first_value``) all
  share ONE execution shape: keys hash into ``num_buckets`` buckets (one
  shuffle, see ``auto_buckets``), each bucket task sorts by (key, order)
  once and handles every key in the same vectorized pass — one Python
  call per bucket, never per key. Partitioning assumption (documented):
  one key's rows fit one worker — same contract as the reference's
  in-memory group state. NULL keys form ONE partition (SQL semantics,
  ``_same_key``).

All emit plain Datasets, so downstream plans (HAVING, sort, limit) compose.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from sqlgrep_ray.functions.exprs import Col
from sqlgrep_ray.pipelines.plan import AggItem, AggregatePlan, GroupKey
from sqlgrep_ray.pipelines.runner import run_plan


# bucket-shuffle width for the key-hash window/session ops. A bucket is
# one map_groups task, so corpus_rows / num_buckets must fit a worker's
# heap; 64 suits the verification scales here. Callers that KNOW their
# row count (e.g. a job reading parquet metadata) should pass
# ``num_buckets=auto_buckets(n_rows)`` — the same doubling rule the dedup
# verify shuffle uses — instead of forcing an extra count() pass inside
# the operator.
WINDOW_BUCKETS = 64
BUCKET_ROW_TARGET = 5_000_000
BUCKET_CAP = 4096


def auto_buckets(n_rows: int) -> int:
    """Bucket count that keeps ~BUCKET_ROW_TARGET rows per bucket task
    (power of 2, capped) — per-worker memory stays flat at any corpus
    size instead of corpus/64."""
    p = WINDOW_BUCKETS
    while p < BUCKET_CAP and n_rows // p > BUCKET_ROW_TARGET:
        p *= 2
    return p


def _same_key(a: pa.Array, b: pa.Array) -> pa.Array:
    """Element-wise 'same partition key' with SQL semantics: NULL keys
    form ONE partition, so null == null counts as the same key (plain
    ``pc.equal`` yields null there, which would split every NULL row into
    its own partition)."""
    return pc.or_(
        pc.fill_null(pc.equal(a, b), False),
        pc.and_(pc.is_null(a), pc.is_null(b)),
    )


def _as_keys(key) -> list:
    """Normalize a partition key spec (str or sequence of str) to a list —
    composite ``PARTITION BY a, b`` support."""
    return [key] if isinstance(key, str) else list(key)


def _bucket_ids(t: pa.Table, keys, num_buckets: int) -> pa.Array:
    """Block-stable bucket assignment for the key column(s). Key columns
    are cast to STRING before hashing: ``to_pandas`` on an int64 column
    renders blocks WITH nulls as float64 and blocks without as int64, so
    the same key value would hash — and bucket — differently depending on
    which block it landed in. The string form is identical everywhere
    (nulls stay null, which pandas hashes consistently)."""
    import pandas as pd

    cols = {}
    for k in _as_keys(keys):
        c = t[k]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        cols[k] = pc.cast(c, pa.string()).to_pandas()
    h = pd.util.hash_pandas_object(pd.DataFrame(cols), index=False).to_numpy()
    return pa.array((h % np.uint64(num_buckets)).astype(np.int64))


def _key_change_mask(karr, n: int) -> np.ndarray:
    """True at rows that start a new key run in a (key, order)-sorted
    bucket (nulls sort together, so one pass suffices). Accepts one
    pa.Array or a list of them (composite keys: a run continues only
    while EVERY key column matches)."""
    if n <= 1:
        return np.ones(n, dtype=bool)
    arrs = karr if isinstance(karr, list) else [karr]
    same = None
    for a in arrs:
        s = _same_key(a.slice(1), a.slice(0, n - 1))
        same = s if same is None else pc.and_(same, s)
    return np.r_[True, ~same.to_numpy(zero_copy_only=False).astype(bool)]


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


def hopping_window(
    ds: "ray.data.Dataset",
    ts_col: str,
    width_s: int,
    hop_s: int,
    aggs: Sequence[AggItem],
    extra_keys: Sequence[str] = (),
    window_col: str = "window_start",
    small_result: bool = True,
) -> "ray.data.Dataset":
    """Overlapping (sliding) windows: width ``width_s``, advancing every
    ``hop_s`` (must divide the width). Each event belongs to exactly
    ``width_s // hop_s`` windows; the explode is one vectorized ``take``
    per batch (replication factor is the window overlap — size batches
    accordingly), after which the window start is an ordinary group key on
    the combiner-first aggregate path, like ``tumbling_window``."""
    if width_s % hop_s:
        raise ValueError("hop_s must divide width_s")
    n_win = width_s // hop_s
    hop_us = hop_s * 1_000_000

    def explode(t: pa.Table) -> pa.Table:
        us = t[ts_col]
        if isinstance(us, pa.ChunkedArray):
            us = us.combine_chunks()
        epoch = us.cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = len(epoch)
        rep = t.take(pa.array(np.repeat(np.arange(n, dtype=np.int64), n_win)))
        j = np.tile(np.arange(n_win, dtype=np.int64), n)
        starts = (np.repeat(epoch // hop_us, n_win) - j) * hop_us
        return rep.append_column(
            window_col, pa.array(starts).cast(pa.timestamp("us"))
        )

    windowed = ds.map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
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
    num_buckets: int = WINDOW_BUCKETS,
) -> "ray.data.Dataset":
    """Split each key's events into sessions separated by gaps > ``gap_s``.

    Output: one row per (key, session) with ``session_idx`` (0-based, in time
    order), ``n_events``, ``session_start``, ``session_end``, ``duration_s``.

    Execution: keys are hash-assigned to ``num_buckets`` buckets (one
    deterministic shuffle); each bucket task sorts its rows by (key, ts)
    ONCE and splits every key's sessions in the same vectorized pass — one
    Python call per bucket, not per key (the round-1 ``map_groups``-per-key
    version paid ~0.1 ms × |keys|). Per-worker memory is the bucket's rows
    (≈ corpus / num_buckets); raise ``num_buckets`` for bigger corpora. A
    single hot KEY must still fit one worker — same contract as the
    reference's in-memory group state.
    """
    gap_us = int(gap_s * 1_000_000)

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("__b", _bucket_ids(t, key, num_buckets))

    def split_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__b"])
        n = g.num_rows
        karr_empty = g[key][:0].combine_chunks()
        if n == 0:
            return pa.table(
                {
                    key: karr_empty,
                    "session_idx": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "session_start": pa.array([], pa.timestamp("us")),
                    "session_end": pa.array([], pa.timestamp("us")),
                    "duration_s": pa.array([], pa.float64()),
                }
            )
        order = pc.sort_indices(
            g, [(key, "ascending"), (ts_col, "ascending")]
        )
        g = g.take(order)
        ts = g[ts_col].combine_chunks().cast(pa.int64()).to_numpy()
        karr = g[key].combine_chunks()
        key_change = _key_change_mask(karr, n)
        new_session = key_change | np.r_[True, (ts[1:] - ts[:-1]) > gap_us]
        starts = np.flatnonzero(new_session)
        ends = np.r_[starts[1:], n] - 1
        n_sessions = len(starts)
        # session ordinal within its key: subtract each key's first session
        key_first = key_change[starts]
        grp = np.cumsum(key_first) - 1
        first_sess_of_key = np.flatnonzero(key_first)
        sess_idx = np.arange(n_sessions) - first_sess_of_key[grp]
        return pa.table(
            {
                key: karr.take(pa.array(starts)),
                "session_idx": pa.array(sess_idx.astype(np.int64)),
                "n_events": pa.array((ends - starts + 1).astype(np.int64)),
                "session_start": pa.array(ts[starts], pa.timestamp("us")),
                "session_end": pa.array(ts[ends], pa.timestamp("us")),
                "duration_s": pa.array(
                    (ts[ends] - ts[starts]) / 1e6, pa.float64()
                ),
            }
        )

    return (
        ds.select_columns([key, ts_col])
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(split_bucket, batch_format="pyarrow")
    )


def trailing_window_agg(
    ds: "ray.data.Dataset",
    key: str,
    ts_col: str,
    window_s: float,
    sum_col: "str | None" = None,
    keep_cols: Sequence[str] = (),
    num_buckets: int = WINDOW_BUCKETS,
) -> "ray.data.Dataset":
    """Per-EVENT trailing time-window aggregates: for each row, the count
    (and optionally sum of ``sum_col``) of the key's events with
    ``ts ∈ [ts_row − window, ts_row]`` — SQL's ``RANGE BETWEEN <window>
    PRECEDING AND CURRENT ROW`` incl. peer rows at the same timestamp.

    Execution mirrors :func:`assign_sessions` (key-hash buckets, one sort
    per bucket); the frame bounds are TWO vectorized ``searchsorted`` calls
    over a composite (key-rank × range + relative-time) axis — no per-key
    or per-row Python. Falls back to a per-key scan only if the composite
    would overflow int64 (≳ millions of keys × centuries of span)."""
    window_us = int(window_s * 1_000_000)
    cols = [key, ts_col, *keep_cols] + ([sum_col] if sum_col else [])
    cols = list(dict.fromkeys(cols))

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("__b", _bucket_ids(t, key, num_buckets))

    def agg_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__b"])
        n = g.num_rows
        if n == 0:
            out = g.append_column("trailing_count", pa.array([], pa.int64()))
            if sum_col:
                out = out.append_column("trailing_sum", pa.array([], pa.int64()))
            return out
        order = pc.sort_indices(g, [(key, "ascending"), (ts_col, "ascending")])
        g = g.take(order)
        ts = g[ts_col].combine_chunks().cast(pa.int64()).to_numpy()
        karr = g[key].combine_chunks()
        key_change = _key_change_mask(karr, n)
        krank = np.cumsum(key_change) - 1
        base = ts.min()
        rel = ts - base
        R = int(rel.max()) + window_us + 2
        n_keys = int(krank[-1]) + 1
        if n_keys * R < (1 << 62):
            comp = krank * R + rel
            lo = krank * R + np.maximum(rel - window_us, 0)
            lb = np.searchsorted(comp, lo, side="left")
            ub = np.searchsorted(comp, comp, side="right")
        else:  # pragma: no cover - astronomically wide corpora
            seg_starts = np.flatnonzero(key_change)
            seg_of = np.cumsum(key_change) - 1
            bounds = np.r_[seg_starts, n]
            lb = np.empty(n, dtype=np.int64)
            ub = np.empty(n, dtype=np.int64)
            for s_i in range(len(seg_starts)):
                s, e = bounds[s_i], bounds[s_i + 1]
                lb[s:e] = s + np.searchsorted(ts[s:e], ts[s:e] - window_us, "left")
                ub[s:e] = s + np.searchsorted(ts[s:e], ts[s:e], "right")
        g = g.append_column("trailing_count", pa.array((ub - lb).astype(np.int64)))
        if sum_col:
            vals = g[sum_col].combine_chunks().cast(pa.int64()).to_numpy()
            cum = np.concatenate([[0], np.cumsum(vals, dtype=np.int64)])
            g = g.append_column("trailing_sum", pa.array(cum[ub] - cum[lb]))
        return g

    return (
        ds.select_columns(cols)
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(agg_bucket, batch_format="pyarrow")
    )


def assign_sessions(
    ds: "ray.data.Dataset",
    key: str,
    ts_col: str,
    gap_s: float,
    keep_cols: Sequence[str] = (),
    session_col: str = "session_idx",
    num_buckets: int = WINDOW_BUCKETS,
) -> "ray.data.Dataset":
    """Row-level sessionization: every EVENT gets its session ordinal
    (0-based per key, time order) — the feature-engineering form of
    :func:`sessionize` (which emits per-session summaries). Same key-hash
    bucket execution: one vectorized sort + boundary scan per bucket, no
    per-key Python. Assignment is independent of tie order among equal
    timestamps (boundaries depend only on time deltas), so results are
    deterministic and SQL-comparable (``SUM(gap > g) OVER (PARTITION BY
    key ORDER BY ts)``)."""
    gap_us = int(gap_s * 1_000_000)
    cols = [key, ts_col, *keep_cols]

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("__b", _bucket_ids(t, key, num_buckets))

    def label_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__b"])
        n = g.num_rows
        if n == 0:
            return g.append_column(session_col, pa.array([], pa.int64()))
        order = pc.sort_indices(g, [(key, "ascending"), (ts_col, "ascending")])
        g = g.take(order)
        ts = g[ts_col].combine_chunks().cast(pa.int64()).to_numpy()
        karr = g[key].combine_chunks()
        key_change = _key_change_mask(karr, n)
        new_session = key_change | np.r_[True, (ts[1:] - ts[:-1]) > gap_us]
        # per-key 0-based ordinal: global boundary cumsum minus the key's
        # first boundary ordinal
        bno = np.cumsum(new_session) - 1
        first_of_key = np.maximum.accumulate(np.where(key_change, bno, 0))
        return g.append_column(
            session_col, pa.array((bno - first_of_key).astype(np.int64))
        )

    return (
        ds.select_columns(cols)
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(label_bucket, batch_format="pyarrow")
    )


def lag_shift(
    ds: "ray.data.Dataset",
    key: str,
    order_col: str,
    value_cols: Sequence[str],
    offset: int = 1,
    keep_cols: "Sequence[str] | None" = (),
    num_buckets: int = WINDOW_BUCKETS,
    names: "Sequence[str] | None" = None,
) -> "ray.data.Dataset":
    """Per-partition LAG / LEAD: for every row, the value of each
    ``value_cols`` entry from the row ``offset`` positions EARLIER
    (``offset > 0``, SQL ``LAG(v, offset)``) or LATER (``offset < 0``,
    ``LEAD(v, -offset)``) within the same ``key`` partition ordered by
    ``order_col`` — NULL past the partition edge. Output columns are named
    ``{col}_lag{offset}`` / ``{col}_lead{-offset}`` unless ``names``
    overrides them (one per value col). ``keep_cols=None`` keeps EVERY
    input column (SQL window semantics; the whole row rides the shuffle).

    Execution is the same key-hash bucket shuffle as
    :func:`assign_sessions`: only (key, order, values, keep) columns move,
    each bucket is sorted once and every shift is one vectorized
    null-masked ``take`` — no per-key Python. Determinism contract: the
    (key, order_col) pair must be unique per row (transcripts: conv_id +
    turn_idx), else tie order is engine-defined. Partitioning assumption
    (documented, same as sessionize): one key's rows fit one worker.
    """
    if offset == 0:
        raise ValueError("offset must be nonzero (positive=lag, negative=lead)")
    keys = _as_keys(key)
    tag = f"lag{offset}" if offset > 0 else f"lead{-offset}"
    out_names = (
        list(names) if names is not None else [f"{c}_{tag}" for c in value_cols]
    )
    if len(out_names) != len(value_cols):
        raise ValueError("names must match value_cols one-to-one")
    cols = (
        None
        if keep_cols is None
        else list(dict.fromkeys([*keys, order_col, *value_cols, *keep_cols]))
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("__b", _bucket_ids(t, keys, num_buckets))

    def shift_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__b"])
        n = g.num_rows
        if n == 0:
            for c, out in zip(value_cols, out_names):
                g = g.append_column(
                    out, pa.array([], g.schema.field(c).type)
                )
            return g
        order = pc.sort_indices(
            g, [*((k, "ascending") for k in keys), (order_col, "ascending")]
        )
        g = g.take(order)
        karrs = [g[k].combine_chunks() for k in keys]
        idx = np.arange(n, dtype=np.int64) - offset
        valid = (idx >= 0) & (idx < n)
        clipped = np.clip(idx, 0, n - 1)
        same = None
        for a in karrs:
            s = _same_key(a.take(pa.array(clipped)), a)
            same = s if same is None else pc.and_(same, s)
        valid &= same.to_numpy(zero_copy_only=False).astype(bool)
        take_idx = pa.array(clipped, mask=~valid)
        for c, out in zip(value_cols, out_names):
            g = g.append_column(
                out, g[c].combine_chunks().take(take_idx)
            )
        return g

    if cols is not None:
        ds = ds.select_columns(cols)
    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(shift_bucket, batch_format="pyarrow")
    )


def partition_first_value(
    ds: "ray.data.Dataset",
    key: str,
    order_col: str,
    value_col: str,
    out_col: str = "first_value",
    keep_cols: "Sequence[str] | None" = None,
    num_buckets: int = WINDOW_BUCKETS,
) -> "ray.data.Dataset":
    """SQL ``FIRST_VALUE(v) OVER (PARTITION BY key ORDER BY order_col)``
    — every row gets its partition's first value in order (any dtype;
    e.g. time-since-conversation-start = ts − first_value(ts)). Same
    bucket execution and determinism contract as :func:`lag_shift`."""
    keys = _as_keys(key)
    cols = (
        None
        if keep_cols is None
        else list(dict.fromkeys([*keys, order_col, value_col, *keep_cols]))
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("__b", _bucket_ids(t, keys, num_buckets))

    def first_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__b"])
        n = g.num_rows
        if n == 0:
            return g.append_column(
                out_col, pa.array([], g.schema.field(value_col).type)
            )
        order = pc.sort_indices(
            g, [*((k, "ascending") for k in keys), (order_col, "ascending")]
        )
        g = g.take(order)
        karrs = [g[k].combine_chunks() for k in keys]
        key_change = _key_change_mask(karrs, n)
        fok = np.maximum.accumulate(
            np.where(key_change, np.arange(n, dtype=np.int64), 0)
        )
        return g.append_column(
            out_col, g[value_col].combine_chunks().take(pa.array(fok))
        )

    if cols is not None:
        ds = ds.select_columns(cols)
    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(first_bucket, batch_format="pyarrow")
    )


def partition_running(
    ds: "ray.data.Dataset",
    key: str,
    order_col: str,
    value_col: str,
    func: str = "sum",
    out_col: str = "running",
    keep_cols: "Sequence[str] | None" = None,
    num_buckets: int = WINDOW_BUCKETS,
) -> "ray.data.Dataset":
    """SQL running aggregate ``SUM/AVG/COUNT(v) OVER (PARTITION BY key
    ORDER BY order_col)`` — cumulative from the partition start to the
    current row. Same bucket execution and determinism contract as
    :func:`lag_shift`. ``func`` ∈ {"sum", "avg", "count"}; NULL values
    contribute nothing (SQL semantics): sum skips them, count counts
    non-nulls, avg divides the two. sum/count are int64 when the input is
    integral (int64 overflow is the caller's contract, as in SQL); avg is
    float64."""
    if func not in ("sum", "avg", "count"):
        raise ValueError("func must be sum, avg or count")
    keys = _as_keys(key)
    cols = (
        None
        if keep_cols is None
        else list(dict.fromkeys([*keys, order_col, value_col, *keep_cols]))
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("__b", _bucket_ids(t, keys, num_buckets))

    def run_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__b"])
        n = g.num_rows
        if n == 0:
            typ = pa.float64() if func == "avg" else pa.int64()
            return g.append_column(out_col, pa.array([], typ))
        order = pc.sort_indices(
            g, [*((k, "ascending") for k in keys), (order_col, "ascending")]
        )
        g = g.take(order)
        karrs = [g[k].combine_chunks() for k in keys]
        varr = g[value_col].combine_chunks()
        null_mask = pc.is_null(varr).to_numpy(zero_copy_only=False)
        v = np.where(
            null_mask,
            0,
            pc.fill_null(varr, 0).to_numpy(zero_copy_only=False),
        )
        key_change = _key_change_mask(karrs, n)
        fok = np.maximum.accumulate(
            np.where(key_change, np.arange(n, dtype=np.int64), 0)
        )
        cum = np.cumsum(v)
        seg_sum = cum - cum[fok] + v[fok]
        cnt = np.cumsum(~null_mask)
        seg_cnt = cnt - cnt[fok] + (~null_mask)[fok]
        if func == "sum":
            out = pa.array(seg_sum)
            if pa.types.is_integer(varr.type):
                out = out.cast(pa.int64())
            # SQL: SUM over an all-NULL-so-far frame is NULL, not 0
            out = pc.if_else(
                pa.array(seg_cnt > 0), out, pa.scalar(None, out.type)
            )
        elif func == "count":
            out = pa.array(seg_cnt.astype(np.int64))
        else:
            with np.errstate(invalid="ignore", divide="ignore"):
                out = pa.array(
                    np.where(
                        seg_cnt > 0, seg_sum / np.maximum(seg_cnt, 1), np.nan
                    )
                )
                out = pc.if_else(
                    pa.array(seg_cnt > 0), out, pa.scalar(None, pa.float64())
                )
        return g.append_column(out_col, out)

    if cols is not None:
        ds = ds.select_columns(cols)
    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(run_bucket, batch_format="pyarrow")
    )


def partition_row_number(
    ds: "ray.data.Dataset",
    key: str,
    order_col: str,
    out_col: str = "row_number",
    keep_cols: "Sequence[str] | None" = None,
    num_buckets: int = WINDOW_BUCKETS,
    mode: str = "row_number",
    ntile: int | None = None,
) -> "ray.data.Dataset":
    """SQL ``ROW_NUMBER() / RANK() / DENSE_RANK() / NTILE(n) OVER
    (PARTITION BY key ORDER BY order_col)`` — 1-based ordinal/rank/tile
    within each key partition in order (``mode`` selects which; NTILE is
    the training-data sharding window: n near-equal groups per partition,
    earlier groups one row larger). Same bucket execution as
    :func:`lag_shift`. Determinism: row_number/ntile need a unique
    (key, order_col) per row (like lag); rank/dense_rank are
    tie-independent, so they are deterministic — and SQL-comparable —
    even on tied order values. ``keep_cols=None`` (default) keeps every
    input column."""
    if mode not in ("row_number", "rank", "dense_rank", "ntile"):
        raise ValueError("mode must be row_number, rank, dense_rank or ntile")
    if mode == "ntile" and (ntile is None or ntile < 1):
        raise ValueError("ntile mode needs a positive tile count")
    keys = _as_keys(key)
    cols = (
        None
        if keep_cols is None
        else list(dict.fromkeys([*keys, order_col, *keep_cols]))
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("__b", _bucket_ids(t, keys, num_buckets))

    def number_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__b"])
        n = g.num_rows
        if n == 0:
            return g.append_column(out_col, pa.array([], pa.int64()))
        order = pc.sort_indices(
            g, [*((k, "ascending") for k in keys), (order_col, "ascending")]
        )
        g = g.take(order)
        karrs = [g[k].combine_chunks() for k in keys]
        key_change = _key_change_mask(karrs, n)
        pos = np.arange(n, dtype=np.int64)
        first_of_key = np.maximum.accumulate(np.where(key_change, pos, 0))
        if mode == "row_number":
            out = pos - first_of_key + 1
        elif mode == "ntile":
            rn = pos - first_of_key + 1
            starts = np.flatnonzero(key_change)
            seg_len = np.diff(np.r_[starts, n])
            cnt = np.repeat(seg_len, seg_len)
            # SQL NTILE: q = cnt // t, r = cnt % t; the first r tiles get
            # q+1 rows, the rest q
            t_ = ntile
            q, r = cnt // t_, cnt % t_
            big = r * (q + 1)  # rows covered by the larger tiles
            in_big = rn <= big
            out = np.where(
                in_big,
                (rn + q) // np.maximum(q + 1, 1),  # ceil(rn / (q+1))
                r + (rn - big + np.maximum(q, 1) - 1) // np.maximum(q, 1),
            )
        else:
            oarr = g[order_col].combine_chunks()
            run_change = key_change | _key_change_mask(oarr, n)
            if mode == "rank":
                # 1 + ordinal of the current tie-run's first row
                run_start = np.maximum.accumulate(
                    np.where(run_change, pos, 0)
                )
                out = run_start - first_of_key + 1
            else:  # dense_rank: count of distinct order values so far
                c = np.cumsum(run_change)
                out = c - c[first_of_key] + 1
        return g.append_column(out_col, pa.array(out.astype(np.int64)))

    if cols is not None:
        ds = ds.select_columns(cols)
    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(number_bucket, batch_format="pyarrow")
    )
