"""Hypothesis: the window-function family (LAG/LEAD, ROW_NUMBER,
RANK/DENSE_RANK, running SUM/AVG/COUNT, FIRST_VALUE) matches DuckDB's own
window functions over random data with NULL partition keys, NULL values,
and tied order values (ranks AND running aggregates — running SUM/AVG/
COUNT/COUNT(*) use SQL's default RANGE-including-peers frame since round
4, so they are deterministic under ties; only lag/lead/row_number/ntile/
first_value keep the documented unique-(key, order) contract, so their
order keys are drawn unique).

One Ray pipeline per draw would cost seconds; instead each draw executes
the SQL through parse_query → run_plan over a 3-block Dataset (the same
code path the driver oracle exercises) and compares against
duckdb.sql over the identical arrow table.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from sqlgrep_ray.pipelines.runner import run_plan
from sqlgrep_ray.sqlfront import parse_query

_key = st.one_of(st.none(), st.sampled_from(["a", "b", "c"]))
_val = st.one_of(st.none(), st.integers(min_value=-40, max_value=40))


@st.composite
def window_data(draw):
    n = draw(st.integers(min_value=1, max_value=30))
    keys = draw(st.lists(_key, min_size=n, max_size=n))
    vals = draw(st.lists(_val, min_size=n, max_size=n))
    # tied order values for the rank checks
    ties = draw(
        st.lists(st.integers(min_value=0, max_value=5), min_size=n, max_size=n)
    )
    return keys, vals, ties


def _table(keys, vals, ties):
    n = len(keys)
    return pa.table(
        {
            "k": pa.array(keys, pa.string()),
            "o": pa.array(np.arange(n, dtype=np.int64)),  # unique order
            "t": pa.array(ties, pa.int64()),
            "v": pa.array(vals, pa.int64()),
        }
    )


def _run(ray_tbl, sql):
    import ray.data

    plan = parse_query(sql).plan
    ds = ray.data.from_arrow(ray_tbl).repartition(3)
    return (
        run_plan(ds, plan)
        .to_pandas()
        .sort_values("o")
        .reset_index(drop=True)
    )


def _oracle(tbl, sql):
    # duckdb.sql resolves `tbl` from this frame's locals
    return duckdb.sql(sql.replace("FROM x", "FROM tbl")).df().sort_values(
        "o"
    ).reset_index(drop=True)


def _eq(a: pd.Series, b: pd.Series):
    an, bn = a.isna(), b.isna()
    assert an.tolist() == bn.tolist(), (a.tolist(), b.tolist())
    assert a[~an].astype("float64").tolist() == b[~bn].astype(
        "float64"
    ).tolist(), (a.tolist(), b.tolist())


@settings(max_examples=20, deadline=None)
@given(window_data())
def test_windows_match_duckdb(ray_session, data):
    keys, vals, ties = data
    tbl = _table(keys, vals, ties)
    sql = (
        "SELECT k, o, "
        "LAG(v) OVER (PARTITION BY k ORDER BY o) AS lg, "
        "LEAD(v, 2) OVER (PARTITION BY k ORDER BY o) AS ld, "
        "LAG(v, 1, -999) OVER (PARTITION BY k ORDER BY o) AS lgd, "
        "ROW_NUMBER() OVER (PARTITION BY k ORDER BY o) AS rn, "
        "RANK() OVER (PARTITION BY k ORDER BY t) AS r, "
        "DENSE_RANK() OVER (PARTITION BY k ORDER BY t) AS dr, "
        "PERCENT_RANK() OVER (PARTITION BY k ORDER BY t) AS pr, "
        "CUME_DIST() OVER (PARTITION BY k ORDER BY t) AS cd, "
        "SUM(v) OVER (PARTITION BY k ORDER BY o) AS rs, "
        "AVG(v) OVER (PARTITION BY k ORDER BY o) AS ra, "
        "COUNT(v) OVER (PARTITION BY k ORDER BY o) AS rc, "
        "FIRST_VALUE(v) OVER (PARTITION BY k ORDER BY o) AS fv, "
        "LAST_VALUE(v) OVER (PARTITION BY k ORDER BY o) AS lv, "
        "LAST_VALUE(v) OVER (PARTITION BY k ORDER BY o ROWS BETWEEN "
        "UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lvf, "
        "NTILE(3) OVER (PARTITION BY k ORDER BY o) AS nt "
        "FROM x"
    )
    got = _run(tbl, sql)
    exp = _oracle(tbl, sql)
    for col in ["lg", "ld", "lgd", "rn", "r", "dr", "pr", "cd", "rs", "ra", "rc", "fv", "lv", "lvf", "nt"]:
        _eq(got[col], exp[col])


@settings(max_examples=20, deadline=None)
@given(window_data())
def test_running_aggs_range_frame_ties_match_duckdb(ray_session, data):
    """Running SUM/AVG/COUNT and COUNT(*) over a TIED order column: SQL's
    default frame is RANGE including peers, so tied rows share the
    frame-end value — fixed in round 4 (was a ROWS frame; ADVICE r3)."""
    keys, vals, ties = data
    tbl = _table(keys, vals, ties)
    sql = (
        "SELECT k, o, "
        "SUM(v) OVER (PARTITION BY k ORDER BY t) AS rs, "
        "AVG(v) OVER (PARTITION BY k ORDER BY t) AS ra, "
        "COUNT(v) OVER (PARTITION BY k ORDER BY t) AS rc, "
        "COUNT(*) OVER (PARTITION BY k ORDER BY t) AS rcs, "
        "SUM(v) OVER (PARTITION BY k ORDER BY t RANGE BETWEEN "
        "UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS rsf, "
        "COUNT(*) OVER (PARTITION BY k ORDER BY t RANGE BETWEEN "
        "UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS rcsf "
        "FROM x"
    )
    got = _run(tbl, sql)
    exp = _oracle(tbl, sql)
    for col in ["rs", "ra", "rc", "rcs", "rsf", "rcsf"]:
        _eq(got[col], exp[col])


@settings(max_examples=15, deadline=None)
@given(window_data())
def test_rows_frame_matches_duckdb(ray_session, data):
    """Explicit ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW: per-row
    cumulative (no peer sharing). Order keys unique per partition — the
    determinism contract for ROWS frames (with ties the within-tie order,
    and hence the per-row prefix, is engine-defined in every engine)."""
    keys, vals, _ = data
    tbl = _table(keys, vals, [0] * len(keys))
    frame = "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    sql = (
        "SELECT k, o, "
        f"SUM(v) OVER (PARTITION BY k ORDER BY o {frame}) AS rs, "
        f"AVG(v) OVER (PARTITION BY k ORDER BY o {frame}) AS ra, "
        f"COUNT(v) OVER (PARTITION BY k ORDER BY o {frame}) AS rc, "
        f"COUNT(*) OVER (PARTITION BY k ORDER BY o {frame}) AS rcs "
        "FROM x"
    )
    got = _run(tbl, sql)
    exp = _oracle(tbl, sql)
    for col in ["rs", "ra", "rc", "rcs"]:
        _eq(got[col], exp[col])


@settings(max_examples=15, deadline=None)
@given(window_data())
def test_global_windows_match_duckdb(ray_session, data):
    """OVER (ORDER BY ...) with no PARTITION BY — one global partition
    (round-4 extension): navigation, ranking, and running functions all
    match DuckDB. Rank functions get the tied column; the rest unique."""
    keys, vals, ties = data
    tbl = _table(keys, vals, ties)
    sql = (
        "SELECT k, o, "
        "ROW_NUMBER() OVER (ORDER BY o) AS rn, "
        "RANK() OVER (ORDER BY t) AS r, "
        "LAG(v) OVER (ORDER BY o) AS lg, "
        "SUM(v) OVER (ORDER BY t) AS rs, "
        "COUNT(*) OVER (ORDER BY t) AS rcs, "
        "FIRST_VALUE(v) OVER (ORDER BY o) AS fv "
        "FROM x"
    )
    got = _run(tbl, sql)
    exp = _oracle(tbl, sql)
    for col in ["rn", "r", "lg", "rs", "rcs", "fv"]:
        _eq(got[col], exp[col])


@settings(max_examples=20, deadline=None)
@given(window_data(), st.integers(min_value=0, max_value=5))
def test_bounded_frames_and_minmax_match_duckdb(ray_session, data, k):
    """Round-4 kernels: bounded ROWS k PRECEDING moving SUM/AVG/COUNT(*)
    and MIN/MAX OVER (unbounded RANGE with ties, bounded ROWS, and the
    whole-partition frame), plus NTH_VALUE — random data with NULL keys
    and NULL values vs DuckDB."""
    keys, vals, ties = data
    tbl = _table(keys, vals, ties)
    sql = (
        "SELECT k, o, "
        f"SUM(v) OVER (PARTITION BY k ORDER BY o ROWS BETWEEN {k} "
        "PRECEDING AND CURRENT ROW) AS ms, "
        f"AVG(v) OVER (PARTITION BY k ORDER BY o ROWS BETWEEN {k} "
        "PRECEDING AND CURRENT ROW) AS ma, "
        f"COUNT(*) OVER (PARTITION BY k ORDER BY o ROWS BETWEEN {k} "
        "PRECEDING AND CURRENT ROW) AS mc, "
        "MIN(v) OVER (PARTITION BY k ORDER BY t) AS mnr, "
        f"MAX(v) OVER (PARTITION BY k ORDER BY o ROWS BETWEEN {k} "
        "PRECEDING AND CURRENT ROW) AS mxb, "
        "MAX(v) OVER (PARTITION BY k ORDER BY o ROWS BETWEEN UNBOUNDED "
        "PRECEDING AND UNBOUNDED FOLLOWING) AS mxf, "
        "NTH_VALUE(v, 2) OVER (PARTITION BY k ORDER BY o) AS n2 "
        "FROM x"
    )
    got = _run(tbl, sql)
    exp = _oracle(tbl, sql)
    for col in ["ms", "ma", "mc", "mnr", "mxb", "mxf", "n2"]:
        _eq(got[col], exp[col])


@settings(max_examples=20, deadline=None)
@given(
    window_data(),
    st.integers(min_value=0, max_value=4),
    st.integers(min_value=0, max_value=4),
    st.integers(min_value=0, max_value=6),
)
def test_following_and_range_frames_match_duckdb(ray_session, data, n, m, x):
    """Round-5 kernels (VERDICT r4 #7): ROWS BETWEEN n PRECEDING AND
    m FOLLOWING (centered window), ROWS BETWEEN CURRENT ROW AND m
    FOLLOWING, and numeric RANGE BETWEEN x PRECEDING AND CURRENT ROW —
    random data with NULL keys, NULL values, and TIED order values for
    the RANGE frame (peers share frame ends; the ROWS frames use the
    unique order column per the determinism contract)."""
    keys, vals, ties = data
    tbl = _table(keys, vals, ties)
    sql = (
        "SELECT k, o, "
        f"SUM(v) OVER (PARTITION BY k ORDER BY o ROWS BETWEEN {n} "
        f"PRECEDING AND {m} FOLLOWING) AS cs, "
        f"AVG(v) OVER (PARTITION BY k ORDER BY o ROWS BETWEEN {n} "
        f"PRECEDING AND {m} FOLLOWING) AS ca, "
        f"COUNT(*) OVER (PARTITION BY k ORDER BY o ROWS BETWEEN CURRENT "
        f"ROW AND {m} FOLLOWING) AS fc, "
        f"SUM(v) OVER (PARTITION BY k ORDER BY t RANGE BETWEEN {x} "
        "PRECEDING AND CURRENT ROW) AS rs, "
        f"COUNT(v) OVER (PARTITION BY k ORDER BY t RANGE BETWEEN {x} "
        "PRECEDING AND CURRENT ROW) AS rc, "
        f"COUNT(*) OVER (PARTITION BY k ORDER BY t RANGE BETWEEN {x} "
        "PRECEDING AND CURRENT ROW) AS rcs "
        "FROM x"
    )
    got = _run(tbl, sql)
    exp = _oracle(tbl, sql)
    for col in ["cs", "ca", "fc", "rs", "rc", "rcs"]:
        _eq(got[col], exp[col])


@settings(max_examples=15, deadline=None)
@given(
    window_data(),
    st.integers(min_value=0, max_value=4),
    st.integers(min_value=0, max_value=4),
)
def test_asymmetric_unbounded_frames_match_duckdb(ray_session, data, n, m):
    """Round-5 frame grammar completion: ROWS BETWEEN n PRECEDING AND
    UNBOUNDED FOLLOWING and ROWS BETWEEN UNBOUNDED PRECEDING AND m
    FOLLOWING — the _FRAME_UNBOUNDED sentinel clamps to the partition
    edge in the shared bounded kernel."""
    keys, vals, ties = data
    tbl = _table(keys, vals, ties)
    sql = (
        "SELECT k, o, "
        f"SUM(v) OVER (PARTITION BY k ORDER BY o ROWS BETWEEN {n} "
        "PRECEDING AND UNBOUNDED FOLLOWING) AS uf, "
        f"COUNT(*) OVER (PARTITION BY k ORDER BY o ROWS BETWEEN "
        f"UNBOUNDED PRECEDING AND {m} FOLLOWING) AS up, "
        f"AVG(v) OVER (PARTITION BY k ORDER BY o ROWS BETWEEN "
        f"UNBOUNDED PRECEDING AND {m} FOLLOWING) AS ua "
        "FROM x"
    )
    got = _run(tbl, sql)
    exp = _oracle(tbl, sql)
    for col in ["uf", "up", "ua"]:
        _eq(got[col], exp[col])


@settings(max_examples=15, deadline=None)
@given(window_data(), st.integers(min_value=0, max_value=4),
       st.integers(min_value=0, max_value=4))
def test_range_following_frames_match_duckdb(ray_session, data, x, y):
    """Round-5 RANGE … FOLLOWING kernels (window.range_end): value-offset
    frames both directions over a TIED order column — x PRECEDING AND y
    FOLLOWING, CURRENT ROW AND y FOLLOWING, UNBOUNDED↔bounded — for
    SUM/AVG/COUNT(*) vs DuckDB."""
    keys, vals, ties = data
    tbl = _table(keys, vals, ties)
    sql = (
        "SELECT k, o, "
        f"SUM(v) OVER (PARTITION BY k ORDER BY t "
        f"RANGE BETWEEN {x} PRECEDING AND {y} FOLLOWING) AS a, "
        f"AVG(v) OVER (PARTITION BY k ORDER BY t "
        f"RANGE BETWEEN CURRENT ROW AND {y} FOLLOWING) AS b, "
        f"COUNT(*) OVER (PARTITION BY k ORDER BY t "
        f"RANGE BETWEEN UNBOUNDED PRECEDING AND {y} FOLLOWING) AS c, "
        f"COUNT(v) OVER (PARTITION BY k ORDER BY t "
        f"RANGE BETWEEN {x} PRECEDING AND UNBOUNDED FOLLOWING) AS d "
        "FROM x"
    )
    got = _run(tbl, sql)
    want = _oracle(tbl, sql)
    for c in ("a", "b", "c", "d"):
        _eq(got[c], want[c])
