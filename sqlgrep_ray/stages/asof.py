"""As-of (backward) join — a custom operator Ray Data lacks natively.

SURVEY §2 guidance case (b): the right side (dimension with effective
timestamps) is broadcast ONCE as a per-key sorted index; every left batch
probes it vectorized (one ``np.searchsorted`` per distinct key in the
batch). Semantics: for each left row, the right row with the LARGEST
``right_ts <= left_ts`` for the same key — DuckDB's ``ASOF JOIN … ON k = k
AND l.ts >= r.ts`` (the oracle used by the driver contract).

Partitioning assumption (documented): the right side fits in memory on every
worker (it's a dimension table — same contract as the broadcast hash join,
reference ``join.rs``: "loaded completely in memory"). For a right side too
large to broadcast, shuffle BOTH sides on the key and run the same probe
per partition (not needed at parity scale).

Tie policy: among right rows sharing the max ``right_ts``, the LAST in the
sorted order wins (stable sort by (key, ts) ⇒ deterministic); value columns
whose tie rows differ should not be compared against engines with arbitrary
tie-breaks.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _build_index(
    right: pa.Table, right_key: str, right_ts: str, value_cols: Sequence[str]
) -> dict:
    if right.num_rows == 0:
        return {"index": {}, "values": {c: right[c] for c in value_cols}, "n": 0}
    order = pc.sort_indices(
        right, [(right_key, "ascending"), (right_ts, "ascending")]
    )
    right = right.take(order)
    keys = right[right_key].to_numpy(zero_copy_only=False)
    ts = right[right_ts].combine_chunks().cast(pa.int64()).to_numpy()
    cuts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1], True])
    index: dict = {}
    vals = {c: right[c] for c in value_cols}
    for s, e in zip(cuts[:-1], cuts[1:]):
        index[keys[s]] = (ts[s:e], s)  # (sorted ts, base offset into right)
    return {"index": index, "values": vals, "n": right.num_rows}


def _probe(
    batch: pa.Table,
    built: dict,
    left_key: str,
    left_ts: str,
    value_cols: Sequence[str],
    how: str,
) -> pa.Table:
    index, values = built["index"], built["values"]
    n = batch.num_rows
    lkeys = batch[left_key].to_numpy(zero_copy_only=False)
    lts = batch[left_ts].combine_chunks().cast(pa.int64()).to_numpy()
    match = np.full(n, -1, dtype=np.int64)
    # vectorized probe: one searchsorted per distinct key in the batch
    for k in np.unique(lkeys):
        ent = index.get(k)
        if ent is None:
            continue
        ts_arr, base = ent
        rows = np.flatnonzero(lkeys == k)
        pos = np.searchsorted(ts_arr, lts[rows], side="right") - 1
        ok = pos >= 0
        match[rows[ok]] = base + pos[ok]
    found = match >= 0
    out = batch
    take = pa.array(np.where(found, match, 0))
    null_mask = pa.array(~found)
    for c in value_cols:
        vals = values[c]
        if len(vals) == 0:
            # empty right side (possible per bucket in the shuffled path):
            # every left row misses; take([0]) on an empty array throws
            col = pa.nulls(n, vals.type)
        else:
            col = vals.take(take)
            col = pc.if_else(null_mask, pa.scalar(None, col.type), col)
        out = out.append_column(c, col)
    if how == "inner":
        out = out.filter(pa.array(found))
    return out


class AsofProber:
    """Stateless-task probe with a per-process cache of the built index."""

    _CACHE: dict = {}

    def __init__(
        self,
        right_ref,
        left_key: str,
        left_ts: str,
        right_key: str,
        right_ts: str,
        value_cols: Sequence[str],
        how: str = "inner",
    ):
        self.left_key = left_key
        self.left_ts = left_ts
        self.right_ref = right_ref
        self.right_key = right_key
        self.right_ts = right_ts
        self.value_cols = list(value_cols)
        self.how = how

    def _index(self):
        key = self.right_ref.hex() if hasattr(self.right_ref, "hex") else id(self.right_ref)
        ck = (key, self.right_key, self.right_ts, tuple(self.value_cols))
        idx = AsofProber._CACHE.get(ck)
        if idx is None:
            right = (
                ray.get(self.right_ref)
                if isinstance(self.right_ref, ray.ObjectRef)
                else self.right_ref
            )
            idx = AsofProber._CACHE[ck] = _build_index(
                right, self.right_key, self.right_ts, self.value_cols
            )
        return idx

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _probe(
            batch, self._index(), self.left_key, self.left_ts,
            self.value_cols, self.how,
        )


def asof_join(
    left: "ray.data.Dataset",
    right: pa.Table,
    left_key: str,
    left_ts: str,
    right_key: str,
    right_ts: str,
    value_cols: Sequence[str],
    how: str = "inner",
) -> "ray.data.Dataset":
    """Backward as-of join of ``left`` against the broadcast ``right``."""
    ref = ray.put(right)
    prober = AsofProber(
        ref, left_key, left_ts, right_key, right_ts, value_cols, how
    )
    return left.map_batches(
        prober, batch_format="pyarrow", zero_copy_batch=True
    )


# broadcast budget for the right side: the per-key sorted index lives once
# per worker process, so rows × value width must stay a small fraction of
# worker heap (same contract as the dedup hot-set / top-k auto dispatch)
BROADCAST_MAX_RIGHT_ROWS = 2_000_000


def asof_join_auto(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset | pa.Table",
    left_key: str,
    left_ts: str,
    right_key: str,
    right_ts: str,
    value_cols: Sequence[str],
    how: str = "inner",
    broadcast_max_rows: int = BROADCAST_MAX_RIGHT_ROWS,
    num_buckets: "int | None" = None,
) -> "ray.data.Dataset":
    """Size-aware as-of join: broadcast-probe while the right side is small
    (one ``ray.put``, zero shuffles), else the shuffle-both-sides bucketed
    path — the caller no longer has to know which side of the broadcast
    budget the dimension falls on. ``right`` may be an in-memory Arrow
    table or a Dataset; only ``count()`` (metadata-cheap on parquet) is
    spent deciding."""
    needed = list(dict.fromkeys([right_key, right_ts, *value_cols]))
    if isinstance(right, pa.Table):
        if right.num_rows <= broadcast_max_rows:
            return asof_join(
                left, right.select(needed), left_key, left_ts,
                right_key, right_ts, value_cols, how,
            )
        right = ray.data.from_arrow(right)
    elif right.count() <= broadcast_max_rows:
        batches = list(
            right.select_columns(needed).iter_batches(batch_format="pyarrow")
        )
        tbl = (
            pa.concat_tables(batches, promote_options="default")
            if batches
            else pa.table(
                {f.name: pa.array([], f.type)
                 for f in right.schema().base_schema
                 if f.name in needed}
            )
        )
        return asof_join(
            left, tbl, left_key, left_ts, right_key, right_ts, value_cols, how
        )
    return asof_join_large(
        left, right, left_key, left_ts, right_key, right_ts, value_cols,
        how, num_buckets,
    )


def asof_join_large(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_key: str,
    left_ts: str,
    right_key: str,
    right_ts: str,
    value_cols: Sequence[str],
    how: str = "inner",
    num_buckets: "int | None" = None,
) -> "ray.data.Dataset":
    """Shuffle-both-sides as-of join — the fallback for a RIGHT side too
    large to broadcast (the module-doc partitioning note, now implemented).

    Both sides are hash-assigned to ``num_buckets`` key buckets (one
    deterministic shuffle each, via a tagged union so a single ``groupby``
    co-locates them; ``None`` → ``window.auto_buckets`` over
    left+right rows); each bucket task builds the sorted per-key index
    over just ITS right rows and probes its left rows with the same
    vectorized ``searchsorted`` as the broadcast path. Per-worker memory
    is (left+right)/num_buckets; a single hot key must still fit one
    worker.
    """
    import pandas as pd

    from sqlgrep_ray.stages.window import resolve_buckets

    num_buckets = resolve_buckets(num_buckets, left, right)

    lschema = left.schema().base_schema
    rschema = right.schema().base_schema
    left_names = list(lschema.names)
    val_types = {c: rschema.field(c).type for c in value_cols}
    rts_type = rschema.field(right_ts).type
    out_names = left_names + ["__rts", *value_cols, "__side", "__b"]

    def bucket_of(keys: pa.ChunkedArray | pa.Array, n: int) -> pa.Array:
        # block-stable hash: canonicalize the key column first (see
        # window._bucket_ids — int-with-nulls blocks otherwise flip dtype
        # under to_pandas and hash differently per block)
        from sqlgrep_ray.stages.window import _bucket_ids

        return _bucket_ids(pa.table({"k": keys}), "k", num_buckets)

    def tag_left(t: pa.Table) -> pa.Table:
        cols = {nm: t[nm] for nm in left_names}
        cols["__rts"] = pa.nulls(t.num_rows, rts_type)
        for c in value_cols:
            cols[c] = pa.nulls(t.num_rows, val_types[c])
        cols["__side"] = pa.array(np.zeros(t.num_rows, np.int8))
        cols["__b"] = bucket_of(t[left_key], t.num_rows)
        return pa.table({nm: cols[nm] for nm in out_names})

    def tag_right(t: pa.Table) -> pa.Table:
        cols = {}
        for f in lschema:
            if f.name == left_key:
                cols[f.name] = t[right_key].cast(f.type)
            else:
                cols[f.name] = pa.nulls(t.num_rows, f.type)
        cols["__rts"] = t[right_ts]
        for c in value_cols:
            cols[c] = t[c]
        cols["__side"] = pa.array(np.ones(t.num_rows, np.int8))
        cols["__b"] = bucket_of(t[right_key], t.num_rows)
        return pa.table({nm: cols[nm] for nm in out_names})

    tagged = left.map_batches(
        tag_left, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right.select_columns(
            list(dict.fromkeys([right_key, right_ts, *value_cols]))
        ).map_batches(
            tag_right, batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def bucket_asof(g: pa.Table) -> pa.Table:
        side = g["__side"].to_numpy(zero_copy_only=False)
        lpart = g.filter(pa.array(side == 0)).select(left_names)
        rpart_src = g.filter(pa.array(side == 1))
        rcols = {right_key: rpart_src[left_key], right_ts: rpart_src["__rts"]}
        for c in value_cols:
            rcols[c] = rpart_src[c]
        built = _build_index(pa.table(rcols), right_key, right_ts, value_cols)
        return _probe(lpart, built, left_key, left_ts, value_cols, how)

    return tagged.groupby("__b").map_groups(bucket_asof, batch_format="pyarrow")
