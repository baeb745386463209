"""GROUP BY ROLLUP / CUBE / GROUPING SETS (ENGINE EXTENSION — the
reference dialect has plain GROUP BY only, parser.rs) and the null-safe
pyarrow grouping helper.

Execution is the Expand design (runner._grouping_sets_path): rows are
re-emitted once per grouping set with excluded keys NULLed plus a __gid
ordinal, then ONE ordinary combiner-first aggregate runs over
(keys…, __gid)."""

import duckdb
import pytest

from sqlgrep_ray.api import run_sql
from sqlgrep_ray.sqlfront import SqlError, parse_query

DOCS = "/root/testdata/sf0.001/documents.parquet"


# -- parser / plan shapes ------------------------------------------------------


def test_rollup_plan_sets():
    q = parse_query("SELECT a, b, COUNT(*) AS n FROM t GROUP BY ROLLUP(a, b)")
    assert q.plan.grouping_sets == (("a", "b"), ("a",), ())


def test_cube_plan_sets():
    q = parse_query("SELECT a, b, COUNT(*) AS n FROM t GROUP BY CUBE(a, b)")
    assert set(q.plan.grouping_sets) == {("a", "b"), ("a",), ("b",), ()}
    assert len(q.plan.grouping_sets) == 4


def test_grouping_sets_plan():
    q = parse_query(
        "SELECT a, b, COUNT(*) AS n FROM t "
        "GROUP BY GROUPING SETS ((a, b), (a), ())"
    )
    assert q.plan.grouping_sets == (("a", "b"), ("a",), ())


def test_plain_group_by_has_no_sets():
    q = parse_query("SELECT a, COUNT(*) AS n FROM t GROUP BY a")
    assert q.plan.grouping_sets == ()


def test_cube_too_many_keys_rejected():
    with pytest.raises(SqlError, match="CUBE"):
        parse_query(
            "SELECT COUNT(*) AS n FROM t GROUP BY CUBE(a,b,c,d,e,f,g)"
        )


# -- execution vs DuckDB -------------------------------------------------------


def _duck(sql: str):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{DOCS}')")
    rows = con.execute(sql).fetchall()
    con.close()
    return rows


def _key(row):
    return tuple((v is None, v) for v in row)


def _cmp(ray_session, sql, cols, docs=None):
    import ray.data as rd

    if docs is None:
        docs = rd.read_parquet(DOCS)
    got = sorted(
        (tuple(r[c] for c in cols) for r in run_sql(sql, docs).take_all()),
        key=_key,
    )
    exp = sorted((tuple(r) for r in _duck(sql)), key=_key)
    assert got == exp, (got[:5], exp[:5])


def test_rollup_matches_duckdb(ray_session):
    _cmp(
        ray_session,
        "SELECT source, lang, COUNT(*) AS n, SUM(n_chars) AS s FROM t "
        "GROUP BY ROLLUP(source, lang)",
        ["source", "lang", "n", "s"],
    )


def test_cube_matches_duckdb(ray_session):
    _cmp(
        ray_session,
        "SELECT source, lang, COUNT(*) AS n FROM t GROUP BY CUBE(source, lang)",
        ["source", "lang", "n"],
    )


def test_grouping_sets_matches_duckdb(ray_session):
    _cmp(
        ray_session,
        "SELECT source, lang, COUNT(*) AS n FROM t "
        "GROUP BY GROUPING SETS ((source), (lang), ())",
        ["source", "lang", "n"],
    )


def test_duplicate_grouping_set_duplicates_groups(ray_session):
    # standard SQL: each listed set contributes its groups, even repeats
    _cmp(
        ray_session,
        "SELECT lang, COUNT(*) AS n FROM t "
        "GROUP BY GROUPING SETS ((lang), (lang))",
        ["lang", "n"],
    )


def test_rollup_having_where(ray_session):
    _cmp(
        ray_session,
        "SELECT lang, MIN(n_chars) AS lo, MAX(n_chars) AS hi FROM t "
        "WHERE n_chars > 50 GROUP BY ROLLUP(lang) HAVING COUNT(*) > 10",
        ["lang", "lo", "hi"],
    )


def test_rollup_count_distinct(ray_session):
    # holistic COUNT(DISTINCT) through the expand path (cd two-stage
    # shuffles keyed on keys + __gid)
    _cmp(
        ray_session,
        "SELECT source, lang, COUNT(DISTINCT doc_id) AS nd FROM t "
        "GROUP BY ROLLUP(source, lang)",
        ["source", "lang", "nd"],
    )


def test_rollup_genuine_null_keys_vs_rolled_up(ray_session):
    # genuine NULL group keys and rolled-up NULLs coexist: the genuine
    # (NULL lang) subtotal and the grand total are separate output rows
    import ray.data as rd

    items = [
        {"lang": "en", "n": 1},
        {"lang": "en", "n": 2},
        {"lang": None, "n": 4},
        {"lang": None, "n": 8},
        {"lang": "de", "n": 16},
    ]
    ds = rd.from_items(items)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW t AS SELECT * FROM (VALUES ('en',1),('en',2),"
        "(NULL,4),(NULL,8),('de',16)) v(lang, n)"
    )
    sql = "SELECT lang, SUM(n) AS s, COUNT(*) AS c FROM t GROUP BY ROLLUP(lang)"
    got = sorted(
        ((r["lang"], r["s"], r["c"]) for r in run_sql(sql, ds).take_all()),
        key=_key,
    )
    exp = sorted((tuple(r) for r in con.execute(sql).fetchall()), key=_key)
    con.close()
    assert got == exp
    # both a (NULL, 12, 2) subtotal and a (NULL, 31, 5) grand total
    assert (None, 12, 2) in got and (None, 31, 5) in got


def test_rollup_order_by_limit(ray_session):
    import ray.data as rd

    docs = rd.read_parquet(DOCS)
    sql = (
        "SELECT source, lang, COUNT(*) AS n FROM t "
        "GROUP BY ROLLUP(source, lang) ORDER BY n DESC, source, lang LIMIT 5"
    )
    got = [
        (r["source"], r["lang"], r["n"])
        for r in run_sql(sql, docs).take_all()
    ]
    # DuckDB sorts NULLS LAST by default; ours sorts NULLs first — compare
    # against an explicit NULLS FIRST oracle
    exp = _duck(
        "SELECT source, lang, COUNT(*) AS n FROM t "
        "GROUP BY ROLLUP(source, lang) "
        "ORDER BY n DESC, source NULLS FIRST, lang NULLS FIRST LIMIT 5"
    )
    assert got == [tuple(r) for r in exp]


# -- the pyarrow duplicate-null-group regression -------------------------------


def test_group_table_null_safe_regression():
    """pyarrow 16.1 TableGroupBy emits duplicate groups for a nullable
    string key mixed with fixed-width keys at a few hundred rows; the
    helper must return exactly one row per distinct key tuple."""
    import random

    import pyarrow as pa

    from sqlgrep_ray.stages.aggregate import group_table_null_safe

    random.seed(0)
    srcs = [f"src{i}" for i in range(20)] + [None]
    rows = [(random.choice(srcs), random.randrange(3)) for _ in range(686)]
    t = pa.table(
        {
            "s": pa.array([r[0] for r in rows]),
            "g": pa.array([r[1] for r in rows], type=pa.int64()),
            "c": pa.array([1] * len(rows)),
        }
    )
    # the raw group_by exhibits the bug on this input (guard: if a future
    # pyarrow fixes it, this assertion flags the helper as removable)
    raw = t.group_by(["s", "g"]).aggregate([("c", "sum")])
    fixed = group_table_null_safe(t, ["s", "g"], [("c", "sum")])
    n_expected = len(set(rows))
    assert fixed.num_rows == n_expected
    assert raw.num_rows >= n_expected  # documents why the helper exists
    got = {
        (s, g): c
        for s, g, c in zip(
            fixed["s"].to_pylist(),
            fixed["g"].to_pylist(),
            fixed["c_sum"].to_pylist(),
        )
    }
    import collections

    exp = collections.Counter(rows)
    assert got == dict(exp)


# -- GROUPING() ----------------------------------------------------------------


def test_grouping_fn_matches_duckdb(ray_session):
    import ray.data as rd

    docs = rd.read_parquet(DOCS)
    sql = (
        "SELECT source, lang, GROUPING(source) AS gs, GROUPING(lang) AS gl, "
        "COUNT(*) AS n FROM t GROUP BY ROLLUP(source, lang)"
    )
    got = sorted(
        (
            tuple(r[c] for c in ["source", "lang", "gs", "gl", "n"])
            for r in run_sql(sql, docs).take_all()
        ),
        key=_key,
    )
    exp = sorted(
        (
            tuple(r)
            for r in _duck(
                "SELECT source, lang, CAST(GROUPING(source) AS BIGINT) AS gs, "
                "CAST(GROUPING(lang) AS BIGINT) AS gl, COUNT(*) AS n "
                "FROM t GROUP BY ROLLUP(source, lang)"
            )
        ),
        key=_key,
    )
    assert got == exp


def test_grouping_fn_in_having_only(ray_session):
    # HAVING-only GROUPING slot (hidden __grouping column, dropped after)
    import ray.data as rd

    docs = rd.read_parquet(DOCS)
    rows = run_sql(
        "SELECT lang, COUNT(*) AS n FROM t GROUP BY ROLLUP(lang) "
        "HAVING GROUPING(lang) = 1",
        docs,
    ).take_all()
    assert len(rows) == 1 and rows[0]["lang"] is None
    assert set(rows[0]) == {"lang", "n"}  # hidden slot dropped


def test_grouping_fn_errors():
    with pytest.raises(SqlError, match="requires ROLLUP"):
        parse_query("SELECT GROUPING(a) AS g FROM t GROUP BY a")
    with pytest.raises(SqlError, match="must be a GROUP BY key"):
        parse_query(
            "SELECT GROUPING(z) AS g, COUNT(*) AS n FROM t GROUP BY ROLLUP(a)"
        )


# -- ORDER BY … NULLS FIRST/LAST -------------------------------------------------


def test_order_by_nulls_last(ray_session):
    import ray.data as rd

    ds = rd.from_items(
        [
            {"k": 2, "v": "b"},
            {"k": None, "v": "d"},
            {"k": 1, "v": "a"},
            {"k": None, "v": "e"},
        ]
    )
    rows = run_sql("SELECT k, v FROM t ORDER BY k NULLS LAST, v", ds).take_all()
    assert [(r["k"], r["v"]) for r in rows] == [
        (1, "a"),
        (2, "b"),
        (None, "d"),
        (None, "e"),
    ]
    # engine default (no NULLS clause): NULLs first — unchanged
    rows = run_sql("SELECT k, v FROM t ORDER BY k, v", ds).take_all()
    assert [r["k"] for r in rows] == [None, None, 1, 2]
    # DESC NULLS FIRST and the top-n (LIMIT) path honour the flag too
    rows = run_sql(
        "SELECT k, v FROM t ORDER BY k DESC NULLS FIRST, v", ds
    ).take_all()
    assert [r["k"] for r in rows] == [None, None, 2, 1]
    rows = run_sql("SELECT k, v FROM t ORDER BY k NULLS LAST LIMIT 2", ds).take_all()
    assert sorted((r["k"], r["v"]) for r in rows) == [(1, "a"), (2, "b")]


def test_order_by_nulls_parse_error():
    with pytest.raises(SqlError, match="FIRST or LAST"):
        parse_query("SELECT a FROM t ORDER BY a NULLS SOMETIMES")
