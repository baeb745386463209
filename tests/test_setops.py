"""WITH (CTEs) and UNION [ALL] — parser shapes, dataset-bound run_sql
execution vs DuckDB, and the raw-text Tables surface.

ENGINE EXTENSION: the reference dialect (parser.rs) has neither set
operations nor CTEs; these are additions on the Ray Data engine."""

import duckdb
import pytest

from sqlgrep_ray.api import Tables, run_sql
from sqlgrep_ray.sqlfront import (
    Query,
    SetQuery,
    SqlError,
    WithQuery,
    parse_query,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


# -- parser ------------------------------------------------------------------


def test_union_all_parses_with_set_tail():
    s = parse_query(
        "SELECT a FROM t WHERE a = 1 UNION ALL SELECT a FROM u "
        "UNION ALL SELECT a FROM v ORDER BY a LIMIT 10"
    )
    assert isinstance(s, SetQuery) and s.all
    assert [q.table for q in s.queries] == ["t", "u", "v"]
    # the tail binds to the set, not the last member
    assert s.limit == 10 and len(s.order_by) == 1
    assert all(q.plan.limit is None and not q.plan.order_by for q in s.queries)


def test_plain_union_is_distinct():
    s = parse_query("SELECT a FROM t UNION SELECT a FROM u")
    assert isinstance(s, SetQuery) and not s.all


def test_with_parses_cte_chain():
    w = parse_query(
        "WITH x AS (SELECT a, COUNT(*) AS n FROM t GROUP BY a), "
        "y AS (SELECT a FROM x WHERE n > 2) SELECT a FROM y"
    )
    assert isinstance(w, WithQuery)
    assert [n for n, _ in w.ctes] == ["x", "y"]
    assert isinstance(w.body, Query) and w.body.table == "y"


def test_union_member_order_by_rejected():
    with pytest.raises(SqlError, match="last UNION member"):
        parse_query("SELECT a FROM t ORDER BY a UNION ALL SELECT a FROM u")


def test_mixed_union_all_rejected():
    with pytest.raises(SqlError, match="mixing"):
        parse_query(
            "SELECT a FROM t UNION SELECT a FROM u UNION ALL SELECT a FROM v"
        )


def test_duplicate_cte_rejected():
    with pytest.raises(SqlError, match="duplicate CTE"):
        parse_query(
            "WITH x AS (SELECT a FROM t), x AS (SELECT b FROM u) "
            "SELECT a FROM x"
        )


def test_single_select_still_plain_query():
    q = parse_query("SELECT a FROM t ORDER BY a LIMIT 3")
    assert isinstance(q, Query) and q.plan.limit == 3


# -- dataset-bound execution vs DuckDB ---------------------------------------


def _duck(sql: str):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{DOCS}')")
    con.execute(f"CREATE VIEW docs AS SELECT * FROM read_parquet('{DOCS}')")
    rows = con.execute(sql).fetchall()
    con.close()
    return rows


def _rows(ds, cols):
    return [tuple(r[c] for c in cols) for r in ds.take_all()]


def test_union_all_matches_duckdb(ray_session):
    import ray.data as rd

    docs = rd.read_parquet(DOCS)
    sql = (
        "SELECT lang, n_chars FROM t WHERE n_chars < 60 UNION ALL "
        "SELECT lang, n_chars FROM t WHERE n_chars > 4000 "
        "ORDER BY n_chars DESC, lang LIMIT 20"
    )
    got = _rows(run_sql(sql, docs), ["lang", "n_chars"])
    assert got == _duck(sql)


def test_plain_union_dedups_matches_duckdb(ray_session):
    import ray.data as rd

    docs = rd.read_parquet(DOCS)
    sql = (
        "SELECT lang FROM t WHERE n_chars < 500 UNION "
        "SELECT lang FROM t WHERE n_chars > 100 ORDER BY lang"
    )
    got = _rows(run_sql(sql, docs), ["lang"])
    assert got == _duck(sql)


def test_cte_agg_then_filter_matches_duckdb(ray_session):
    import ray.data as rd

    docs = rd.read_parquet(DOCS)
    sql = (
        "WITH by_lang AS (SELECT lang, COUNT(*) AS n FROM docs GROUP BY lang)"
        " SELECT lang, n FROM by_lang WHERE n > 50 ORDER BY n DESC, lang"
    )
    got = _rows(run_sql(sql, {"docs": docs}), ["lang", "n"])
    assert got == _duck(sql)


def test_cte_chain_and_union_of_ctes(ray_session):
    import ray.data as rd

    docs = rd.read_parquet(DOCS)
    sql = (
        "WITH a AS (SELECT lang, COUNT(*) AS n FROM docs GROUP BY lang), "
        "b AS (SELECT lang, n FROM a WHERE n > 50) "
        "SELECT lang, n FROM b UNION ALL SELECT lang, n FROM b "
        "ORDER BY lang, n"
    )
    got = _rows(run_sql(sql, {"docs": docs}), ["lang", "n"])
    assert got == _duck(sql)


def test_run_sql_unknown_table_errors(ray_session):
    import ray.data as rd

    docs = rd.read_parquet(DOCS)
    with pytest.raises(SqlError, match="unknown table"):
        run_sql("SELECT lang FROM nope", {"docs": docs}).take_all()


# -- raw-text Tables surface --------------------------------------------------

EV_DEF = (
    r"CREATE TABLE ev(line = '(\\w+) user=(\\d+)', "
    r"line[1] => kind TEXT, line[2] => uid INT);"
)
LINES = ["login user=1", "click user=2", "login user=2", "buy user=3"]


@pytest.fixture(scope="module")
def ev_tables():
    t = Tables()
    t.add_tables(EV_DEF)
    return t


def test_tables_with_cte(ray_session, ev_tables):
    rows = ev_tables.execute_query_rows(
        "WITH k AS (SELECT kind, COUNT(*) AS n FROM ev GROUP BY kind) "
        "SELECT kind, n FROM k WHERE n > 1",
        source=LINES,
    )
    assert rows == [{"kind": "login", "n": 2}]


def test_tables_union_distinct(ray_session, ev_tables):
    rows = ev_tables.execute_query_rows(
        "SELECT kind FROM ev WHERE uid = 1 UNION "
        "SELECT kind FROM ev WHERE uid = 3 ORDER BY kind",
        source=LINES,
    )
    assert rows == [{"kind": "buy"}, {"kind": "login"}]


def test_tables_join_against_cte(ray_session, ev_tables):
    rows = ev_tables.execute_query_rows(
        "WITH big AS (SELECT uid, COUNT(*) AS n FROM ev GROUP BY uid) "
        "SELECT ev.kind, big.n FROM ev INNER JOIN big ON ev.uid = big.uid "
        "WHERE big.n > 1 ORDER BY ev.kind",
        source=LINES,
    )
    assert rows == [
        {"ev.kind": "click", "big.n": 2},
        {"ev.kind": "login", "big.n": 2},
    ]


def test_compile_query_rejects_multi(ray_session, ev_tables):
    with pytest.raises(SqlError, match="execute_query"):
        ev_tables.compile_query("SELECT kind FROM ev UNION SELECT kind FROM ev")
