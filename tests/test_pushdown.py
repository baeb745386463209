"""Parquet scan pushdown (sources/pushdown.py): semantics-preserving
atom translation, NULL behavior parity, column pruning, fallbacks."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sqlgrep_ray.sources.pushdown import scan_parquet_for_query, where_to_ds_filter
from sqlgrep_ray.sqlfront import parse_query


def _filt(sql_where: str, cols):
    q = parse_query(f"SELECT x FROM t WHERE {sql_where}")
    return where_to_ds_filter(q.plan.where, set(cols))


def test_atom_translation():
    c = {"x", "y", "s"}
    assert _filt("x > 5", c) is not None
    assert _filt("5 < x", c) is not None          # mirrored orientation
    assert _filt("x IS NULL", c) is not None
    assert _filt("x IS NOT NULL", c) is not None
    assert _filt("s IN ('a', 'b')", c) is not None
    assert _filt("x > 5 AND length(s) = 2", c) is not None  # half-push
    assert _filt("x > 5 OR y < 3", c) is not None
    # NOT pushable: engine NULL⇒false + NOT keeps NULL rows
    assert _filt("NOT (x = 5)", c) is None
    assert _filt("x IS NOT 5", c) is None          # engine keeps NULL rows
    assert _filt("s NOT IN ('a')", c) is None      # NULL-operand keep risk
    assert _filt("length(s) = 2 OR x > 5", c) is None  # OR needs both
    assert _filt("x > y", c) is None               # col-col: no statistics
    assert _filt("z > 5", c) is None               # unknown column


def test_scan_matches_engine_where(ray_session, tmp_path):
    """Pushed scan rows == engine-filtered rows over data WITH NULLs —
    the NULL⇒false contract holds through the pyarrow filter."""
    import ray.data

    from sqlgrep_ray.api import run_sql

    t = pa.table(
        {
            "x": pa.array([1, None, 3, 4, None, 6], pa.int64()),
            "s": pa.array(["a", "b", None, "a", "c", None]),
        }
    )
    p = str(tmp_path / "t.parquet")
    pq.write_table(t, p)
    sql = (
        "SELECT x, s FROM t WHERE x > 2 AND s IN ('a', 'c') "
        "AND s IS NOT NULL"
    )
    got = sorted(
        (r["x"], r["s"]) for r in run_sql(sql, {"t": p}).take_all()
    )
    # engine-only reference: same SQL over the pre-read dataset
    want = sorted(
        (r["x"], r["s"])
        for r in run_sql(sql, {"t": ray.data.from_arrow(t)}).take_all()
    )
    assert got == want == [(4, "a")]

    # the scan itself pruned: only referenced columns, filtered rows
    q = parse_query(sql)
    ds = scan_parquet_for_query(p, q)
    assert set(ds.schema().names) == {"x", "s"}
    assert ds.count() == 1

    # unpushable-only WHERE: full rows, pruned columns, same result
    sql2 = "SELECT s FROM t WHERE length(s) = 1 AND NOT (x = 4)"
    g2 = sorted(r["s"] for r in run_sql(sql2, {"t": p}).take_all())
    w2 = sorted(
        r["s"] for r in run_sql(sql2, {"t": ray.data.from_arrow(t)}).take_all()
    )
    assert g2 == w2
    ds2 = scan_parquet_for_query(p, parse_query(sql2))
    assert ds2.count() == 6  # nothing pushed

    # wildcard projection: filter still pushes, all columns read
    sql3 = "SELECT * FROM t WHERE x >= 4"
    g3 = run_sql(sql3, {"t": p}).take_all()
    assert sorted(r["x"] for r in g3) == [4, 6]


def test_join_side_column_pruning(ray_session, tmp_path):
    """Path-valued JOIN sides broadcast only (key + attributed columns);
    chained stream-side keys (c.k probing the c-join output) are
    included; results identical to full reads."""
    import ray.data

    from sqlgrep_ray.api import run_sql
    from sqlgrep_ray.sources.pushdown import join_side_columns

    lt = pa.table({"a": [1, 2, 3, 4], "g": [10, 10, 20, 30]})
    rt = pa.table(
        {
            "b": [1, 2, 3],
            "big": ["x" * 10, "y" * 10, "z" * 10],
            "w": [100, 200, 300],
            "g2": [10, 20, 20],
        }
    )
    st = pa.table({"g3": [10, 20], "lbl": ["p", "q"], "junk": [0, 1]})
    pr, ps = str(tmp_path / "r.parquet"), str(tmp_path / "s.parquet")
    pq.write_table(rt, pr)
    pq.write_table(st, ps)
    sql = (
        "SELECT l.a AS a, r.w AS w, s.lbl AS lbl FROM l "
        "JOIN r ON l.a = r.b JOIN s ON r.g2 = s.g3"
    )
    q = parse_query(sql)
    # r needs b (key), w (ref), g2 (chained stream key) — NOT big
    assert join_side_columns(pr, q, "r", None, q.join_right_col) == [
        "b", "g2", "w",
    ]
    # s needs g3 (key), lbl (ref) — NOT junk
    assert join_side_columns(ps, q, "s", None, q.extra_joins[0][4]) == [
        "g3", "lbl",
    ]
    src = {"l": ray.data.from_arrow(lt), "r": pr, "s": ps}
    got = sorted(
        (r["a"], r["w"], r["lbl"]) for r in run_sql(sql, src).take_all()
    )
    full = sorted(
        (r["a"], r["w"], r["lbl"])
        for r in run_sql(
            sql,
            {
                "l": ray.data.from_arrow(lt),
                "r": ray.data.from_arrow(rt),
                "s": ray.data.from_arrow(st),
            },
        ).take_all()
    )
    assert got == full and len(got) == 3
