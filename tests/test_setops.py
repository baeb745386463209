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
    with pytest.raises(SqlError, match="last set-query member"):
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


# -- IN (SELECT …) subqueries -------------------------------------------------

ORDERS = "/root/testdata/sf0.001/orders.parquet"
CUSTOMER = "/root/testdata/sf0.001/customer.parquet"


def _duck2(sql: str):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{ORDERS}')")
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM read_parquet('{CUSTOMER}')"
    )
    rows = con.execute(sql).fetchall()
    con.close()
    return rows


def test_in_subquery_semi(ray_session):
    import ray.data as rd

    src = {
        "orders": rd.read_parquet(ORDERS),
        "customer": rd.read_parquet(CUSTOMER),
    }
    sql = (
        "SELECT o_orderkey, o_totalprice FROM orders WHERE "
        "o_totalprice > 100000 AND o_custkey IN "
        "(SELECT c_custkey FROM customer WHERE c_acctbal > 5000) "
        "ORDER BY o_orderkey LIMIT 25"
    )
    got = [
        (r["o_orderkey"], r["o_totalprice"]) for r in run_sql(sql, src).take_all()
    ]
    assert got == _duck2(sql)


def test_not_in_subquery_anti(ray_session):
    import ray.data as rd

    src = {
        "orders": rd.read_parquet(ORDERS),
        "customer": rd.read_parquet(CUSTOMER),
    }
    sql = (
        "SELECT COUNT(*) AS n FROM orders WHERE o_custkey NOT IN "
        "(SELECT c_custkey FROM customer WHERE c_acctbal > 5000)"
    )
    assert run_sql(sql, src).take_all()[0]["n"] == _duck2(sql)[0][0]


def test_in_subquery_over_cte(ray_session):
    import ray.data as rd

    src = {
        "orders": rd.read_parquet(ORDERS),
        "customer": rd.read_parquet(CUSTOMER),
    }
    sql = (
        "WITH rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)"
        " SELECT COUNT(*) AS n FROM orders WHERE o_custkey IN "
        "(SELECT c_custkey FROM rich)"
    )
    assert run_sql(sql, src).take_all()[0]["n"] == _duck2(sql)[0][0]


def test_in_subquery_parse_errors():
    with pytest.raises(SqlError, match="top-level AND-conjunct"):
        parse_query(
            "SELECT a FROM t WHERE a = 1 OR b IN (SELECT x FROM u)"
        )
    with pytest.raises(SqlError, match="plain column operand"):
        parse_query("SELECT a FROM t WHERE a + 1 IN (SELECT x FROM u)")
    with pytest.raises(SqlError, match="SELECT list"):
        parse_query("SELECT b IN (SELECT x FROM u) AS f FROM t")


def test_tables_in_subquery_raw_text(ray_session, ev_tables):
    rows = ev_tables.execute_query_rows(
        "SELECT kind, uid FROM ev WHERE kind IN "
        "(SELECT kind FROM ev WHERE uid = 2) ORDER BY kind, uid",
        source=LINES,
    )
    assert rows == [
        {"kind": "click", "uid": 2},
        {"kind": "login", "uid": 1},
        {"kind": "login", "uid": 2},
    ]


def test_compile_query_rejects_subquery(ray_session, ev_tables):
    with pytest.raises(SqlError, match="execute_query"):
        ev_tables.compile_query(
            "SELECT kind FROM ev WHERE kind IN (SELECT kind FROM ev)"
        )


# -- scalar subqueries ---------------------------------------------------------


def test_scalar_subquery_in_where(ray_session):
    import ray.data as rd

    src = {"orders": rd.read_parquet(ORDERS)}
    sql = (
        "SELECT COUNT(*) AS n FROM orders WHERE o_totalprice > "
        "(SELECT AVG(o_totalprice) FROM orders)"
    )
    assert run_sql(sql, src).take_all()[0]["n"] == _duck2(sql)[0][0]


def test_scalar_subquery_in_projection(ray_session):
    import ray.data as rd

    src = {"orders": rd.read_parquet(ORDERS)}
    sql = (
        "SELECT o_orderkey, o_totalprice - (SELECT AVG(o_totalprice) "
        "FROM orders) AS delta FROM orders ORDER BY o_orderkey LIMIT 5"
    )
    got = [(r["o_orderkey"], r["delta"]) for r in run_sql(sql, src).take_all()]
    exp = _duck2(sql)
    assert [k for k, _ in got] == [k for k, _ in exp]
    for (_, a), (_, b) in zip(got, exp):
        # the scalar AVG is a distributed sum: summation order may differ
        # from DuckDB by an ulp
        assert abs(a - b) < 1e-6


def test_scalar_subquery_multi_row_errors(ray_session):
    import ray.data as rd

    src = {"orders": rd.read_parquet(ORDERS)}
    with pytest.raises(SqlError, match="more than one row"):
        run_sql(
            "SELECT COUNT(*) AS n FROM orders WHERE o_totalprice > "
            "(SELECT o_totalprice FROM orders)",
            src,
        ).take_all()


def test_scalar_subquery_zero_rows_is_null(ray_session):
    import ray.data as rd

    src = {"orders": rd.read_parquet(ORDERS)}
    # NULL comparison => false => empty aggregate => zero rows
    # (reference parity: the global group appears on the first row)
    out = run_sql(
        "SELECT COUNT(*) AS n FROM orders WHERE o_totalprice > "
        "(SELECT o_totalprice FROM orders WHERE o_orderkey = -1)",
        src,
    )
    assert out.take_all() == []


def test_tables_scalar_subquery_raw_text(ray_session, ev_tables):
    rows = ev_tables.execute_query_rows(
        "SELECT kind, uid FROM ev WHERE uid > "
        "(SELECT AVG(uid) FROM ev) ORDER BY uid, kind",
        source=LINES,
    )
    # avg(uid) = 8/4 = 2 (int division); uid > 2 => only uid=3
    assert rows == [{"kind": "buy", "uid": 3}]


def test_exists_subquery(ray_session):
    import ray.data as rd

    src = {
        "orders": rd.read_parquet(ORDERS),
        "customer": rd.read_parquet(CUSTOMER),
    }
    total = rd.read_parquet(ORDERS).count()
    hit = run_sql(
        "SELECT COUNT(*) AS n FROM orders WHERE EXISTS "
        "(SELECT c_custkey FROM customer WHERE c_acctbal > 5000)",
        src,
    ).take_all()
    assert hit == [{"n": total}]
    # FALSE exists => zero rows survive the filter => empty aggregate
    # (reference parity: the global group appears on the first row)
    miss = run_sql(
        "SELECT COUNT(*) AS n FROM orders WHERE EXISTS "
        "(SELECT c_custkey FROM customer WHERE c_acctbal > 99999999)",
        src,
    ).take_all()
    assert miss == []
    neg = run_sql(
        "SELECT COUNT(*) AS n FROM orders WHERE NOT EXISTS "
        "(SELECT c_custkey FROM customer WHERE c_acctbal > 99999999)",
        src,
    ).take_all()
    assert neg == [{"n": total}]


# -- INTERSECT / EXCEPT [ALL] --------------------------------------------------


def test_intersect_except_parse_shapes():
    s = parse_query("SELECT a FROM t INTERSECT SELECT a FROM u")
    assert isinstance(s, SetQuery) and s.op == "intersect" and not s.all
    s = parse_query("SELECT a FROM t INTERSECT ALL SELECT a FROM u")
    assert s.op == "intersect" and s.all
    s = parse_query(
        "SELECT a FROM t EXCEPT SELECT a FROM u EXCEPT SELECT a FROM v"
    )
    assert s.op == "except" and not s.all and len(s.queries) == 3
    with pytest.raises(SqlError, match="mixing"):
        parse_query(
            "SELECT a FROM t UNION SELECT a FROM u INTERSECT SELECT a FROM v"
        )
    with pytest.raises(SqlError, match="mixing"):
        parse_query(
            "SELECT a FROM t EXCEPT SELECT a FROM u EXCEPT ALL SELECT a FROM v"
        )


@pytest.mark.parametrize(
    "op",
    ["INTERSECT", "INTERSECT ALL", "EXCEPT", "EXCEPT ALL"],
)
def test_set_op_matches_duckdb_on_docs(ray_session, op):
    import ray.data as rd

    docs = rd.read_parquet(DOCS)
    sql = (
        f"SELECT lang FROM t WHERE n_chars < 2000 {op} "
        "SELECT lang FROM t WHERE n_chars > 100"
    )
    got = sorted(r["lang"] for r in run_sql(sql, docs).take_all())
    assert got == sorted(r[0] for r in _duck(sql))


def test_except_chain_three_members(ray_session):
    import ray.data as rd

    docs = rd.read_parquet(DOCS)
    sql = (
        "SELECT lang FROM t WHERE n_chars < 3000 "
        "EXCEPT ALL SELECT lang FROM t WHERE n_chars > 2000 "
        "EXCEPT ALL SELECT lang FROM t WHERE n_chars < 150"
    )
    got = sorted(r["lang"] for r in run_sql(sql, docs).take_all())
    assert got == sorted(r[0] for r in _duck(sql))


def test_set_ops_null_rows_compare_equal(ray_session):
    import ray.data as rd

    a = rd.from_items([{"x": 1}, {"x": None}, {"x": None}, {"x": 2}])
    b = rd.from_items([{"x": None}, {"x": 2}, {"x": 3}])

    def vals(sql):
        return sorted(
            (r["x"] for r in run_sql(sql, {"a": a, "b": b}).take_all()),
            key=lambda v: (v is None, v),
        )

    con = duckdb.connect()
    con.execute("CREATE VIEW a AS SELECT * FROM (VALUES (1),(NULL),(NULL),(2)) v(x)")
    con.execute("CREATE VIEW b AS SELECT * FROM (VALUES (NULL),(2),(3)) v(x)")

    def duck(sql):
        return sorted(
            (r[0] for r in con.execute(sql).fetchall()),
            key=lambda v: (v is None, v),
        )

    for sql in (
        "SELECT x FROM a INTERSECT SELECT x FROM b",
        "SELECT x FROM a INTERSECT ALL SELECT x FROM b",
        "SELECT x FROM a EXCEPT SELECT x FROM b",
        "SELECT x FROM a EXCEPT ALL SELECT x FROM b",
    ):
        assert vals(sql) == duck(sql), sql
    con.close()


def test_set_op_tail_order_limit(ray_session):
    import ray.data as rd

    docs = rd.read_parquet(DOCS)
    sql = (
        "SELECT lang, n_chars FROM t WHERE n_chars < 500 INTERSECT "
        "SELECT lang, n_chars FROM t WHERE n_chars > 100 "
        "ORDER BY n_chars DESC, lang LIMIT 7"
    )
    got = _rows(run_sql(sql, docs), ["lang", "n_chars"])
    assert got == _duck(sql)


def test_tables_except_raw_text(ray_session, ev_tables):
    rows = ev_tables.execute_query_rows(
        "SELECT kind FROM ev EXCEPT SELECT kind FROM ev WHERE uid = 2 "
        "ORDER BY kind",
        source=LINES,
    )
    assert rows == [{"kind": "buy"}]
