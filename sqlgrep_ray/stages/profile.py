"""Dataset column profiling — one streaming pass, bounded partials.

``profile_columns(ds, cols)`` computes per column: row count, null
count, distinct count (HLL++ sparse-exact below 2^p/4 distinct — the
same exact regime the sketch oracles use — with the dense ±1% estimate
beyond), and min/max. Everything combines per block into ONE summary
row per (block, column) — counts, extrema, and a ≤2×2^p-byte distinct
sketch — so the reduction is corpus-size-independent: the 100-TB "what
is in this table" question costs one read pass and a driver merge of
per-block rows.

Numeric extrema merge numerically (carried as float64 — exact for
|v| < 2^53) and string extrema lexicographically; the output formats
both as strings (ints keep their digits) so one schema covers mixed
column types, and the driver oracle compares against
``CAST(MIN(x) AS VARCHAR)``. Numeric and string columns only.

No reference counterpart (sqlgrep has no profiling); standard
data-profiling shape.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from sqlgrep_ray.stages.sketch import _estimate, _hash64, _regs_from_hashes

if TYPE_CHECKING:  # pragma: no cover
    import ray

_P = 14  # HLL precision: exact below 4096 distinct, ±0.8% beyond


def _fmt(v) -> "str | None":
    if v is None:
        return None
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)


def profile_columns(
    ds: "ray.data.Dataset",
    cols: Sequence[str],
    p: int = _P,
) -> pa.Table:
    """One row per profiled column:
    ``(column, n, nulls, n_distinct, min_v, max_v)`` — extrema as
    strings (see module docstring)."""
    cols = list(cols)
    m = 1 << p
    sparse_max = m // 4

    def block(t: pa.Table) -> pa.Table:
        out = {
            "column": [], "n": [], "nulls": [], "flag": [], "payload": [],
            "min_num": [], "max_num": [], "min_str": [], "max_str": [],
        }
        for c in cols:
            arr = t[c]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            is_num = pa.types.is_integer(arr.type) or pa.types.is_floating(
                arr.type
            )
            if not is_num and not (
                pa.types.is_string(arr.type)
                or pa.types.is_large_string(arr.type)
            ):
                raise ValueError(
                    f"profile_columns supports numeric and string columns, "
                    f"{c!r} is {arr.type}"
                )
            nn = arr.drop_null()
            out["column"].append(c)
            out["n"].append(t.num_rows)
            out["nulls"].append(arr.null_count)
            h = np.unique(_hash64(nn)) if len(nn) else np.empty(0, np.uint64)
            if len(h) <= sparse_max:
                out["flag"].append(0)
                out["payload"].append(h.tobytes())
            else:
                out["flag"].append(1)
                out["payload"].append(_regs_from_hashes(h, p).tobytes())
            mm = pc.min_max(nn)
            lo, hi = mm["min"].as_py(), mm["max"].as_py()
            if is_num:
                out["min_num"].append(
                    None if lo is None else float(lo)
                )
                out["max_num"].append(None if hi is None else float(hi))
                out["min_str"].append(None)
                out["max_str"].append(None)
            else:
                out["min_num"].append(None)
                out["max_num"].append(None)
                out["min_str"].append(lo)
                out["max_str"].append(hi)
        return pa.table(
            {
                "column": pa.array(out["column"], pa.string()),
                "n": pa.array(out["n"], pa.int64()),
                "nulls": pa.array(out["nulls"], pa.int64()),
                "flag": pa.array(out["flag"], pa.int8()),
                "payload": pa.array(out["payload"], pa.binary()),
                "min_num": pa.array(out["min_num"], pa.float64()),
                "max_num": pa.array(out["max_num"], pa.float64()),
                "min_str": pa.array(out["min_str"], pa.string()),
                "max_str": pa.array(out["max_str"], pa.string()),
            }
        )

    parts = ds.select_columns(cols).map_batches(
        block, batch_format="pyarrow", zero_copy_batch=True
    )
    # driver merge: one bounded row per (block, column)
    acc: dict[str, dict] = {
        c: {"n": 0, "nulls": 0, "sparse": [], "dense": None,
            "min": None, "max": None}
        for c in cols
    }
    for t in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        for r in t.to_pylist():
            a = acc[r["column"]]
            a["n"] += r["n"]
            a["nulls"] += r["nulls"]
            if r["flag"] == 0:
                a["sparse"].append(np.frombuffer(r["payload"], np.uint64))
            else:
                d = np.frombuffer(r["payload"], np.uint8)
                a["dense"] = (
                    d.copy() if a["dense"] is None else np.maximum(a["dense"], d)
                )
            lo = r["min_num"] if r["min_num"] is not None else r["min_str"]
            hi = r["max_num"] if r["max_num"] is not None else r["max_str"]
            if lo is not None:
                a["min"] = lo if a["min"] is None else min(a["min"], lo)
            if hi is not None:
                a["max"] = hi if a["max"] is None else max(a["max"], hi)
    rows = {"column": [], "n": [], "nulls": [], "n_distinct": [],
            "min_v": [], "max_v": []}
    for c in cols:
        a = acc[c]
        u = (
            np.unique(np.concatenate(a["sparse"]))
            if a["sparse"]
            else np.empty(0, np.uint64)
        )
        if a["dense"] is None and len(u) <= sparse_max:
            nd = len(u)
        else:
            regs = a["dense"] if a["dense"] is not None else np.zeros(m, np.uint8)
            if len(u):
                regs = np.maximum(regs, _regs_from_hashes(u, p))
            nd = _estimate(regs, p)
        rows["column"].append(c)
        rows["n"].append(a["n"])
        rows["nulls"].append(a["nulls"])
        rows["n_distinct"].append(nd)
        rows["min_v"].append(_fmt(a["min"]))
        rows["max_v"].append(_fmt(a["max"]))
    return pa.table(
        {
            "column": pa.array(rows["column"], pa.string()),
            "n": pa.array(rows["n"], pa.int64()),
            "nulls": pa.array(rows["nulls"], pa.int64()),
            "n_distinct": pa.array(rows["n_distinct"], pa.int64()),
            "min_v": pa.array(rows["min_v"], pa.string()),
            "max_v": pa.array(rows["max_v"], pa.string()),
        }
    )
