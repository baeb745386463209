"""RIGHT [OUTER] JOIN — ENGINE EXTENSION (the reference dialect's only
join shapes are inner and streamed-side left-outer, join.rs:109-138;
OUTER/FULL are its left-outer spellings and stay that way).

Execution: runner._right_outer_broadcast — the inner broadcast probe plus
a narrow matched-key scan (per-block semi-filter + _distinct + one pull
bounded by |build keys|), then the unmatched build rows NULL-extended on
the streamed side. NULL keys follow the probe's pandas-merge semantics
(NULL == NULL matches)."""

import duckdb
import pytest

from sqlgrep_ray.api import Tables, run_sql
from sqlgrep_ray.sqlfront import parse_query

ORDERS = "/root/testdata/sf0.001/orders.parquet"
CUSTOMER = "/root/testdata/sf0.001/customer.parquet"


def _nkey(t):
    return tuple((v is None, v) for v in t)


def test_right_join_parses():
    q = parse_query("SELECT a FROM t RIGHT JOIN u ON t.k = u.k")
    assert q.join_how == "right" and q.join_table == "u"
    q = parse_query("SELECT a FROM t RIGHT OUTER JOIN u ON t.k = u.k")
    assert q.join_how == "right"
    # reference parity untouched: FULL/OUTER still mean left-outer
    q = parse_query("SELECT a FROM t FULL JOIN u ON t.k = u.k")
    assert q.join_how == "left"


def test_right_join_matches_duckdb(ray_session):
    import ray.data as rd

    src = {
        "orders": rd.read_parquet(ORDERS),
        "customer": rd.read_parquet(CUSTOMER),
    }
    sql = (
        "SELECT o_orderkey, customer.c_custkey AS ck FROM orders "
        "RIGHT JOIN customer ON o_custkey = c_custkey"
    )
    got = sorted(
        ((r["o_orderkey"], r["ck"]) for r in run_sql(sql, src).take_all()),
        key=_nkey,
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{ORDERS}')")
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM read_parquet('{CUSTOMER}')"
    )
    exp = sorted(
        (
            tuple(r)
            for r in con.execute(
                "SELECT o_orderkey, c_custkey AS ck FROM orders "
                "RIGHT JOIN customer ON o_custkey = c_custkey"
            ).fetchall()
        ),
        key=_nkey,
    )
    con.close()
    assert got == exp


def test_right_join_unmatched_build_rows_null_extended(ray_session):
    import ray.data as rd

    # CTE-filtered streamed side guarantees unmatched customers
    src = {
        "orders": rd.read_parquet(ORDERS),
        "customer": rd.read_parquet(CUSTOMER),
    }
    sql = (
        "WITH big AS (SELECT o_custkey, o_totalprice FROM orders "
        "WHERE o_totalprice > 250000) "
        "SELECT o_totalprice, customer.c_custkey AS ck FROM big "
        "RIGHT JOIN customer ON o_custkey = c_custkey"
    )
    rows = run_sql(sql, src).take_all()
    n_null = sum(1 for r in rows if r["o_totalprice"] is None)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{ORDERS}')")
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM read_parquet('{CUSTOMER}')"
    )
    exp = con.execute(
        "WITH big AS (SELECT o_custkey, o_totalprice FROM orders "
        "WHERE o_totalprice > 250000) "
        "SELECT o_totalprice, c_custkey AS ck FROM big "
        "RIGHT JOIN customer ON o_custkey = c_custkey"
    ).fetchall()
    con.close()
    assert n_null > 0  # the anti path actually fired
    got = sorted(((r["o_totalprice"], r["ck"]) for r in rows), key=_nkey)
    assert got == sorted((tuple(r) for r in exp), key=_nkey)


def test_right_join_null_key_pandas_parity(ray_session):
    # NULL==NULL matches in the probe (pandas merge semantics, shared with
    # the reference-parity inner join); the anti set honours the same rule
    import ray.data as rd

    left = rd.from_items(
        [
            {"k": 1, "v": "a"},
            {"k": 2, "v": "b"},
            {"k": 2, "v": "c"},
            {"k": None, "v": "d"},
        ]
    )
    right = rd.from_items([{"k": 2, "w": 20}, {"k": 3, "w": 30}, {"k": None, "w": 99}])
    rows = sorted(
        (
            (x["v"], x["w"])
            for x in run_sql(
                "SELECT v, r.w AS w FROM l RIGHT JOIN r ON l.k = r.k",
                {"l": left, "r": right},
            ).take_all()
        ),
        key=_nkey,
    )
    assert rows == [("b", 20), ("c", 20), ("d", 99), (None, 30)]


def test_right_join_degrades_to_inner_under_aggregation(ray_session):
    # the reference's OUTER→INNER downgrade under aggregation
    # (execution_engine.rs:227-244) applies to the extension too
    import ray.data as rd

    left = rd.from_items([{"k": 1, "v": 10}, {"k": 1, "v": 20}])
    right = rd.from_items([{"k": 1, "w": 5}, {"k": 9, "w": 7}])
    rows = run_sql(
        "SELECT r.k AS k, COUNT(*) AS n FROM l RIGHT JOIN r ON l.k = r.k "
        "GROUP BY r.k",
        {"l": left, "r": right},
    ).take_all()
    assert rows == [{"k": 1, "n": 2}]


def test_right_join_raw_text_tables(ray_session):
    t = Tables()
    t.add_tables(
        r"CREATE TABLE ev(line = '(\\w+) user=(\\d+)', "
        r"line[1] => kind TEXT, line[2] => uid INT);"
        r"CREATE TABLE users(line = 'u(\\d+):(\\w+)', "
        r"line[1] => uid INT, line[2] => name TEXT);"
    )
    rows = t.execute_query_rows(
        "SELECT kind, users.name FROM ev RIGHT JOIN users ON ev.uid = users.uid",
        source=["login user=1", "click user=2"],
        join_source=["u1:ann", "u2:bob", "u3:cid"],
    )
    got = sorted(
        ((r["kind"], r["users.name"]) for r in rows), key=_nkey
    )
    assert got == [("click", "bob"), ("login", "ann"), (None, "cid")]
