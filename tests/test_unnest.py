"""UNNEST (SELECT-level explode) + the split-to-list functions."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from sqlgrep_ray.sqlfront import SqlError, parse_query


def _t():
    return pa.table(
        {
            "id": pa.array([1, 2, 3, 4], pa.int64()),
            "s": pa.array(["a b c", "", None, "x  y"]),
            "l": pa.array([[1, 2], [], None, [7]], pa.list_(pa.int64())),
        }
    )


def test_unnest_list_and_split_vs_duckdb(ray_session):
    import ray.data

    from sqlgrep_ray.api import run_sql

    src = ray.data.from_arrow(_t())
    t = _t()  # registered for the duckdb replays below
    got = sorted(
        (r["id"], r["e"])
        for r in run_sql("SELECT id, UNNEST(l) AS e FROM t", src).take_all()
    )
    exp = sorted(tuple(r) for r in duckdb.sql(
        "SELECT id, UNNEST(l) AS e FROM t").fetchall())
    assert got == exp  # empty + NULL lists drop their rows
    # literal-separator split (DuckDB string_split semantics: consecutive
    # separators yield empty fields); regex split matches RE2-to-RE2
    got = sorted(
        (r["id"], r["tok"])
        for r in run_sql(
            "SELECT id, UNNEST(string_to_array(s, ' ')) AS tok FROM t", src
        ).take_all()
    )
    exp = sorted(tuple(r) for r in duckdb.sql(
        "SELECT id, UNNEST(string_split(s, ' ')) AS tok FROM t").fetchall())
    assert got == exp
    got = sorted(
        (r["id"], r["tok"])
        for r in run_sql(
            "SELECT id, UNNEST(regexp_split_to_array(s, ' +')) AS tok FROM t",
            src,
        ).take_all()
    )
    exp = sorted(tuple(r) for r in duckdb.sql(
        "SELECT id, UNNEST(regexp_split_to_array(s, ' +')) AS tok FROM t"
    ).fetchall())
    assert got == exp


def test_unnest_cte_token_count(ray_session):
    import ray.data

    from sqlgrep_ray.api import run_sql

    t = _t()
    got = sorted(
        (r["tok"], r["n"])
        for r in run_sql(
            "WITH toks AS (SELECT UNNEST(string_to_array(s, ' ')) AS tok "
            "FROM t) SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok",
            ray.data.from_arrow(t),
        ).take_all()
    )
    exp = sorted(tuple(r) for r in duckdb.sql(
        "WITH toks AS (SELECT UNNEST(string_split(s, ' ')) AS tok FROM t) "
        "SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok").fetchall())
    assert got == exp


def test_unnest_where_limit_and_wide(ray_session):
    """WHERE filters the PARENT rows (pre-explode); other projections
    repeat per element; larger random input exercises multi-block."""
    import ray.data

    from sqlgrep_ray.api import run_sql

    rng = np.random.default_rng(3)
    n = 1000
    t = pa.table(
        {
            "k": pa.array(rng.integers(0, 9, n).astype("int64")),
            "l": pa.array(
                [list(range(int(x))) for x in rng.integers(0, 5, n)],
                pa.list_(pa.int64()),
            ),
        }
    )
    got = sorted(
        (r["k"], r["e"], r["k2"])
        for r in run_sql(
            "SELECT k, UNNEST(l) AS e, k * 2 AS k2 FROM t WHERE k < 4",
            ray.data.from_arrow(t).repartition(4),
        ).take_all()
    )
    exp = sorted(tuple(r) for r in duckdb.sql(
        "SELECT k, UNNEST(l) AS e, k * 2 AS k2 FROM t WHERE k < 4"
    ).fetchall())
    assert got == exp


def test_unnest_parse_errors():
    with pytest.raises(SqlError, match="top-level"):
        parse_query("SELECT UNNEST(l) + 1 AS e FROM t")
    with pytest.raises(SqlError, match="at most one UNNEST"):
        parse_query("SELECT UNNEST(a) AS x, UNNEST(b) AS y FROM t")
    with pytest.raises(SqlError, match="not allowed in WHERE"):
        parse_query("SELECT id FROM t WHERE UNNEST(l) = 1")
    with pytest.raises(SqlError, match="aggregation"):
        parse_query("SELECT UNNEST(l) AS e, COUNT(*) AS n FROM t GROUP BY e")
