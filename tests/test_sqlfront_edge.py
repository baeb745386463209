"""SQL parser edge cases: precedence, negation, escapes, multi-statement."""

import pytest

from sqlgrep_ray.functions.exprs import Bin, Case, Cast, Col, Func, InList, Lit, Un
from sqlgrep_ray.sqlfront import SqlError, parse, parse_query


def test_and_or_precedence():
    # a > 1 AND b < 2 OR c = 3  ⇒  (a>1 AND b<2) OR c=3
    w = parse_query("SELECT a FROM t WHERE a > 1 AND b < 2 OR c = 3").plan.where
    assert w.op == "or" and w.left.op == "and" and w.right.op == "eq"


def test_arith_precedence():
    # a + 1 * 2 > 3 - 1  ⇒  (a + (1*2)) > (3-1)
    w = parse_query("SELECT a FROM t WHERE a + 1 * 2 > 3 - 1").plan.where
    assert (w.op, w.left.op, w.left.right.op, w.right.op) == (
        "gt", "add", "mul", "sub",
    )


def test_not_in_and_unary_not():
    w = parse_query("SELECT a FROM t WHERE a NOT IN (1, 2) AND NOT b").plan.where
    assert isinstance(w.left, InList) and w.left.negated
    assert isinstance(w.right, Un) and w.right.op == "not"


def test_is_not_null_and_parens():
    w = parse_query("SELECT a FROM t WHERE (x IS NOT NULL)").plan.where
    assert w.op == "is_not"


def test_string_escape_and_comments():
    q = parse_query("-- lead\nSELECT a FROM t -- trail\nWHERE a = 'it\\'s'")
    assert q.plan.where.right.value == "it's"


def test_unary_minus_folds_literal():
    w = parse_query("SELECT a FROM t WHERE a > -5").plan.where
    assert isinstance(w.right, Lit) and w.right.value == -5


def test_cast_postfix_and_index_chain():
    p = parse_query("SELECT xs[1]::int AS v FROM t").plan.projections[0]
    assert isinstance(p.expr, Cast)
    assert p.expr.operand.__class__.__name__ == "Index"


def test_nested_case():
    sql = (
        "SELECT CASE WHEN a = 1 THEN CASE WHEN b = 2 THEN 'x' ELSE 'y' END "
        "ELSE 'z' END AS c FROM t"
    )
    p = parse_query(sql).plan.projections[0]
    assert isinstance(p.expr, Case)
    assert isinstance(p.expr.whens[0][1], Case)


def test_multi_statement_defs_and_query():
    stmts = parse(
        """
        CREATE TABLE a(line = 'x(\\\\d+)', line[1] => n INT);
        CREATE TABLE b(line = 'y(\\\\d+)', line[1] => m INT);
        SELECT n FROM a WHERE n > 0;
        """
    )
    kinds = [type(s).__name__ for s in stmts]
    assert kinds == ["TableDef", "TableDef", "Query"]


def test_default_projection_names():
    q = parse_query("SELECT a, b + 1, COUNT(c), MAX(d) FROM t GROUP BY a, b + 1")
    names = [k.name for k in q.plan.group_by] + [x.name for x in q.plan.aggs]
    # column → its name; expr → p{i}; COUNT → count{i}; other agg → p{i}
    assert names == ["a", "p1", "count2", "p3"]


def test_count_distinct_requires_column():
    with pytest.raises(SqlError):
        parse_query("SELECT COUNT(DISTINCT *) AS n FROM t GROUP BY a")


def test_percentile_requires_literal_p_in_range():
    with pytest.raises(SqlError):
        parse_query("SELECT PERCENTILE(x, 1.5) AS p FROM t GROUP BY a")


def test_having_reuses_projected_aggregate_slot():
    q = parse_query(
        "SELECT a, COUNT(*) AS n FROM t GROUP BY a HAVING COUNT(*) > 1"
    )
    # no hidden slot added — HAVING references the projected n
    assert [x.name for x in q.plan.aggs] == ["n"]
    assert isinstance(q.plan.having, Bin) and q.plan.having.left == Col("n")


def test_regex_matches_alias():
    q = parse_query("SELECT a FROM t WHERE regex_matches(a, 'x+')")
    assert q.plan.where.name == "regexp_matches"


def test_user_registered_function_through_sql(ray_session):
    """Extension surface (SURVEY §2.10): a new scalar function is ONE
    registry entry and immediately usable from SQL (the reference's
    add-a-Function-variant extension path, model.rs:711-738, as a dict
    entry)."""
    import pyarrow.compute as pc

    from sqlgrep_ray import Tables
    from sqlgrep_ray.functions.exprs import _FUNCS, register_function

    name = "test_reverse_udf"

    @register_function(name)
    def _rev(arg_ks, ctx):
        k = arg_ks[0]
        return lambda t: pc.utf8_reverse(k(t))

    try:
        t = Tables()
        t.add_tables(r"CREATE TABLE lines(line = '(\\w+)', line[1] => w TEXT);")
        rows = t.execute_query_rows(
            f"SELECT {name}(w) AS r FROM lines", source=["hello there"]
        )
        assert rows == [{"r": "olleh"}]
    finally:
        _FUNCS.pop(name, None)


def test_order_by_extension(ray_session):
    """ORDER BY (engine extension; the reference dialect has none):
    asc/desc, expression keys, NULLs first, applied before LIMIT."""
    from sqlgrep_ray import Tables

    t = Tables()
    t.add_tables(
        r"CREATE TABLE kv(line = '(\\w+)=(\\d+)', line[1] => k TEXT, line[2] => v INT);"
    )
    lines = ["b=2", "a=3", "c=1", "d=3"]
    rows = t.execute_query_rows("SELECT k, v FROM kv ORDER BY v DESC, k", source=lines)
    assert [(r["k"], r["v"]) for r in rows] == [("a", 3), ("d", 3), ("b", 2), ("c", 1)]
    rows = t.execute_query_rows(
        "SELECT k, v FROM kv ORDER BY v * -1, k LIMIT 2", source=lines
    )
    assert [(r["k"], r["v"]) for r in rows] == [("a", 3), ("d", 3)]
    # aggregate path: explicit order overrides the group-key default
    rows = t.execute_query_rows(
        "SELECT k, COUNT() AS n FROM kv GROUP BY k ORDER BY k DESC LIMIT 2",
        source=lines + ["a=9"],
    )
    assert [r["k"] for r in rows] == ["d", "c"]


def test_order_by_nulls_first(ray_session):
    from sqlgrep_ray import Tables

    t = Tables()
    t.add_tables(
        r"CREATE TABLE kv(line = '(\\w+)=(\\d+)?', line[1] => k TEXT, line[2] => v INT);"
    )
    rows = t.execute_query_rows(
        "SELECT k, v FROM kv ORDER BY v, k", source=["a=2", "b=", "c=1"]
    )
    assert [(r["k"], r["v"]) for r in rows] == [("b", None), ("c", 1), ("a", 2)]


def test_order_by_topn_vs_full_sort(ray_session, monkeypatch):
    """ORDER BY + small LIMIT runs combiner-first top-n; forcing the full
    distributed Sort (TOPN_LIMIT_MAX=-1) must give the same rows in the
    same order, including NULLs-first and tie-free ordering."""
    import sqlgrep_ray.pipelines.runner as rn
    from sqlgrep_ray import Tables

    t = Tables()
    t.add_tables(
        r"CREATE TABLE kv(line = '(\\w+)=(\\d+)?', line[1] => k TEXT, line[2] => v INT);"
    )
    lines = [f"k{i:03d}={(i * 37) % 100}" for i in range(200)] + ["znull="]
    q = "SELECT k, v FROM kv ORDER BY v DESC, k LIMIT 7"
    topn = t.execute_query_rows(q, source=lines)
    monkeypatch.setattr(rn, "TOPN_LIMIT_MAX", -1)
    full = t.execute_query_rows(q, source=lines)
    assert topn == full
    assert len(topn) == 7


# ---------------------------------------------------------------------------
# window functions (engine extension)
# ---------------------------------------------------------------------------


def test_window_parse_and_plan():
    plan = parse_query(
        "SELECT conv_id, ts - LAG(ts) OVER (PARTITION BY conv_id "
        "ORDER BY turn_idx) AS latency FROM t"
    ).plan
    assert len(plan.windows) == 1
    w = plan.windows[0]
    assert (w.func, w.value_col, w.key, w.order, w.offset) == (
        "lag", "ts", "conv_id", "turn_idx", 1
    )
    # projection rewritten to reference the hidden window column
    lat = plan.projections[1]
    assert lat.name == "latency"
    assert isinstance(lat.expr, Bin) and lat.expr.right.name == w.out_col


def test_window_lead_offset():
    plan = parse_query(
        "SELECT LEAD(v, 3) OVER (PARTITION BY k ORDER BY o) AS nxt FROM t"
    ).plan
    assert plan.windows[0].func == "lead"
    assert plan.windows[0].offset == 3


def test_window_errors():
    with pytest.raises(SqlError):  # window + aggregation
        parse_query(
            "SELECT LAG(v) OVER (PARTITION BY k ORDER BY o), count(*) "
            "FROM t GROUP BY k"
        )
    with pytest.raises(SqlError):  # window in WHERE
        parse_query(
            "SELECT v FROM t WHERE LAG(v) OVER (PARTITION BY k ORDER BY o) > 1"
        )
    with pytest.raises(SqlError):  # OVER required
        parse_query("SELECT LAG(v) FROM t")
    with pytest.raises(SqlError):  # literal positive offset required
        parse_query("SELECT LAG(v, x) OVER (PARTITION BY k ORDER BY o) FROM t")


def test_window_execution(ray_session):
    import pyarrow as pa
    import ray.data

    from sqlgrep_ray.pipelines.runner import run_plan

    t = pa.table(
        {
            "conv_id": ["a", "a", "a", "b", "b"],
            "turn_idx": pa.array([0, 1, 2, 0, 1], pa.int64()),
            "ts": pa.array([10, 25, 31, 5, 9], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    plan = parse_query(
        "SELECT conv_id, turn_idx, ts - LAG(ts) OVER (PARTITION BY conv_id "
        "ORDER BY turn_idx) AS latency FROM x ORDER BY conv_id, turn_idx"
    ).plan
    out = run_plan(ds, plan).to_pandas()
    assert out["latency"].tolist()[1:3] == [15.0, 6.0]
    assert out["latency"].isna().tolist() == [True, False, False, True, False]
    # two windows sharing a frame shift in one pass
    plan2 = parse_query(
        "SELECT conv_id, LAG(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx)"
        " AS prev, LEAD(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx)"
        " AS nxt FROM x ORDER BY conv_id, prev"
    ).plan
    assert len(plan2.windows) == 2
    out2 = run_plan(ds, plan2).to_pandas()
    assert out2["nxt"].dropna().tolist() == [25.0, 31.0, 9.0]


def test_row_number_execution(ray_session):
    import pyarrow as pa
    import ray.data

    from sqlgrep_ray.pipelines.runner import run_plan

    t = pa.table(
        {
            "k": ["a", "b", "a", "b", "a"],
            "o": pa.array([30, 1, 10, 5, 20], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    plan = parse_query(
        "SELECT k, o, ROW_NUMBER() OVER (PARTITION BY k ORDER BY o) AS rn "
        "FROM x ORDER BY k, o"
    ).plan
    out = run_plan(ds, plan).to_pandas()
    assert out["rn"].tolist() == [1, 2, 3, 1, 2]
    with pytest.raises(SqlError):
        parse_query("SELECT ROW_NUMBER(v) OVER (PARTITION BY k ORDER BY o) FROM x")


def test_running_aggregates_execution(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from sqlgrep_ray.pipelines.runner import run_plan

    rng = np.random.RandomState(13)
    n = 300
    df = pd.DataFrame(
        {
            "k": [f"k{c}" for c in rng.randint(0, 9, n)],
            "o": np.arange(n, dtype=np.int64),
            "v": rng.randint(0, 50, n).astype("float64"),
        }
    )
    df.loc[df.index % 7 == 0, "v"] = None  # nulls contribute nothing
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(5)
    plan = parse_query(
        "SELECT k, o, SUM(v) OVER (PARTITION BY k ORDER BY o) AS rs, "
        "AVG(v) OVER (PARTITION BY k ORDER BY o) AS ra, "
        "COUNT(v) OVER (PARTITION BY k ORDER BY o) AS rc, "
        "COUNT(*) OVER (PARTITION BY k ORDER BY o) AS rn FROM x "
        "ORDER BY k, o"
    ).plan
    out = run_plan(ds, plan).to_pandas()
    ref = df.sort_values(["k", "o"]).reset_index(drop=True)
    g = ref.groupby("k")["v"]
    exp_rs = g.expanding().sum().reset_index(drop=True)
    exp_ra = g.expanding().mean().reset_index(drop=True)
    exp_rc = g.expanding().count().reset_index(drop=True)
    pd.testing.assert_series_equal(out["rs"], exp_rs, check_names=False)
    pd.testing.assert_series_equal(out["ra"], exp_ra, check_names=False)
    assert out["rc"].tolist() == exp_rc.astype(int).tolist()
    exp_rn = ref.groupby("k").cumcount() + 1
    assert out["rn"].tolist() == exp_rn.tolist()


def test_running_aggregate_errors():
    with pytest.raises(SqlError):  # unsupported window aggregate
        parse_query("SELECT stddev(v) OVER (PARTITION BY k ORDER BY o) FROM t")
    with pytest.raises(SqlError):  # DISTINCT in window
        parse_query("SELECT sum(DISTINCT v) OVER (PARTITION BY k ORDER BY o) FROM t")
    # expression argument (round-5 extension): lifts into a hidden
    # pre-window input column instead of raising
    q = parse_query(
        "SELECT sum(v + 1) OVER (PARTITION BY k ORDER BY o) AS s FROM t"
    )
    assert len(q.plan.win_inputs) == 1
    assert q.plan.windows[0].value_col == q.plan.win_inputs[0][0]


def test_rank_dense_rank_with_ties(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from sqlgrep_ray.pipelines.runner import run_plan

    t = pa.table(
        {
            "k": ["a"] * 6 + ["b"] * 3,
            "o": pa.array([10, 10, 20, 20, 20, 30, 5, 5, 6], pa.int64()),
            "i": pa.array(list(range(9)), pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    plan = parse_query(
        "SELECT k, o, i, RANK() OVER (PARTITION BY k ORDER BY o) AS r, "
        "DENSE_RANK() OVER (PARTITION BY k ORDER BY o) AS dr FROM x "
        "ORDER BY k, i"
    ).plan
    out = run_plan(ds, plan).to_pandas()
    assert out["r"].tolist() == [1, 1, 3, 3, 3, 6, 1, 1, 3]
    assert out["dr"].tolist() == [1, 1, 2, 2, 2, 3, 1, 1, 2]
    # pandas cross-check
    ref = out[["k", "o"]]
    pd.testing.assert_series_equal(
        out["r"].astype("float64"),
        ref.groupby("k")["o"].rank(method="min"),
        check_names=False,
    )
    pd.testing.assert_series_equal(
        out["dr"].astype("float64"),
        ref.groupby("k")["o"].rank(method="dense"),
        check_names=False,
    )


def test_first_value_execution(ray_session):
    import pyarrow as pa
    import ray.data

    from sqlgrep_ray.pipelines.runner import run_plan

    t = pa.table(
        {
            "k": ["a", "a", "b", "a", "b"],
            "o": pa.array([2, 1, 9, 3, 8], pa.int64()),
            "v": ["x2", "x1", "y9", "x3", "y8"],
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    plan = parse_query(
        "SELECT k, o, FIRST_VALUE(v) OVER (PARTITION BY k ORDER BY o) AS fv "
        "FROM x ORDER BY k, o"
    ).plan
    out = run_plan(ds, plan).to_pandas()
    assert out["fv"].tolist() == ["x1", "x1", "x1", "y8", "y8"]
    with pytest.raises(SqlError):
        parse_query("SELECT FIRST_VALUE(v, 2) OVER (PARTITION BY k ORDER BY o) FROM t")


def test_window_null_partition_keys(ray_session):
    """SQL semantics: NULL partition keys form ONE partition (DuckDB
    parity), and NULL order values tie together for RANK."""
    import duckdb
    import pyarrow as pa
    import ray.data

    from sqlgrep_ray.pipelines.runner import run_plan

    t = pa.table(
        {
            "k": pa.array(["a", None, "a", None, None], pa.string()),
            "o": pa.array([1, 10, 2, 20, 30], pa.int64()),
            "v": pa.array([5, 6, 7, 8, 9], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(2)
    sql = (
        "SELECT k, o, ROW_NUMBER() OVER (PARTITION BY k ORDER BY o) AS rn, "
        "SUM(v) OVER (PARTITION BY k ORDER BY o) AS cum FROM x"
    )
    out = (
        run_plan(ds, parse_query(sql).plan)
        .to_pandas()
        .sort_values(["o"])
        .reset_index(drop=True)
    )
    ref = (
        duckdb.arrow(t)
        .query("x", sql.replace("FROM x", "FROM x"))
        .df()
        .sort_values(["o"])
        .reset_index(drop=True)
    )
    assert out["rn"].tolist() == ref["rn"].tolist()
    assert out["cum"].tolist() == ref["cum"].astype("int64").tolist()


def test_window_composite_partition_key(ray_session):
    """PARTITION BY a, b (composite keys) across the window family — rows
    partition only when EVERY key column matches (DuckDB parity)."""
    import duckdb
    import pyarrow as pa
    import ray.data

    from sqlgrep_ray.pipelines.runner import run_plan

    t = pa.table(
        {
            "a": ["x", "x", "x", "y", "y", "x"],
            "b": pa.array([1, 1, 2, 1, 1, None], pa.int64()),
            "o": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
            "v": pa.array([10, 20, 30, 40, 50, 60], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    sql = (
        "SELECT a, b, o, "
        "LAG(v) OVER (PARTITION BY a, b ORDER BY o) AS lg, "
        "ROW_NUMBER() OVER (PARTITION BY a, b ORDER BY o) AS rn, "
        "SUM(v) OVER (PARTITION BY a, b ORDER BY o) AS rs FROM x"
    )
    out = (
        run_plan(ds, parse_query(sql).plan)
        .to_pandas()
        .sort_values("o")
        .reset_index(drop=True)
    )
    ref = (
        duckdb.arrow(t)
        .query("x", sql)
        .df()
        .sort_values("o")
        .reset_index(drop=True)
    )
    assert out["rn"].tolist() == ref["rn"].tolist()
    assert out["rs"].tolist() == ref["rs"].astype("int64").tolist()
    got_lg, exp_lg = out["lg"], ref["lg"]
    assert got_lg.isna().tolist() == exp_lg.isna().tolist()
    assert got_lg.dropna().tolist() == exp_lg.dropna().tolist()


def test_window_frame_clause_parse():
    """Explicit frame clauses: both frames parse on running aggregates,
    unsupported/incomplete frames are SqlErrors."""
    q = parse_query(
        "SELECT SUM(v) OVER (PARTITION BY k ORDER BY o "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s FROM t"
    )
    assert q.plan.windows[0].frame == "rows"
    q2 = parse_query(
        "SELECT COUNT(*) OVER (PARTITION BY k ORDER BY o "
        "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c FROM t"
    )
    assert q2.plan.windows[0].frame == "range"
    assert q2.plan.windows[0].func == "run_count_star"
    # default (no clause) is the SQL default: RANGE
    q3 = parse_query(
        "SELECT AVG(v) OVER (PARTITION BY k ORDER BY o) AS a FROM t"
    )
    assert q3.plan.windows[0].frame == "range"
    with pytest.raises(SqlError):  # incomplete frame clause
        parse_query(
            "SELECT SUM(v) OVER (PARTITION BY k ORDER BY o ROWS) AS s FROM t"
        )
    # bounded ROWS frames are supported since round 4 (moving windows)
    qb = parse_query(
        "SELECT SUM(v) OVER (PARTITION BY k ORDER BY o "
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS s FROM t"
    )
    assert qb.plan.windows[0].preceding == 2
    # bounded RANGE is supported since round 5 (order-value lookback)
    qr = parse_query(
        "SELECT SUM(v) OVER (PARTITION BY k ORDER BY o "
        "RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS s FROM t"
    )
    assert qr.plan.windows[0].frame == "range"
    assert qr.plan.windows[0].preceding == 2
    # RANGE … FOLLOWING supported since the round-5 range_end kernel
    qrf = parse_query(
        "SELECT SUM(v) OVER (PARTITION BY k ORDER BY o "
        "RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS s FROM t"
    )
    assert qrf.plan.windows[0].frame == "range"
    assert qrf.plan.windows[0].following == 2


def test_qualify_parse_and_errors():
    """QUALIFY: window required; invalid with aggregation; alias and
    direct-call forms both lift into plan.qualify with spec dedup."""
    q = parse_query(
        "SELECT k, ROW_NUMBER() OVER (PARTITION BY k ORDER BY o) AS rn "
        "FROM t QUALIFY rn = 1"
    )
    assert q.plan.qualify is not None
    assert len(q.plan.windows) == 1  # SELECT + QUALIFY share one spec
    q2 = parse_query(
        "SELECT k, o FROM t "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY k ORDER BY o) <= 2"
    )
    assert q2.plan.qualify is not None and len(q2.plan.windows) == 1
    with pytest.raises(SqlError):  # no window anywhere
        parse_query("SELECT k FROM t QUALIFY k = 1")
    with pytest.raises(SqlError):  # aggregation + qualify
        parse_query(
            "SELECT k, COUNT(*) FROM t GROUP BY k "
            "QUALIFY ROW_NUMBER() OVER (PARTITION BY k ORDER BY k) = 1"
        )


def test_sql_approx_count_distinct(ray_session):
    """APPROX_COUNT_DISTINCT through SQL (round 5): grouped + global +
    HAVING + NULL group key, hash-exact vs DuckDB's exact count in the
    sparse regime; unsupported shapes raise clearly."""
    import duckdb
    import numpy as np
    import pandas.testing as pdt
    import pyarrow as pa
    import ray.data

    from sqlgrep_ray.api import run_sql

    rng = np.random.default_rng(4)
    n = 5000
    t = pa.table(
        {
            "k": pa.array(
                rng.integers(0, 9, n).astype("int64"),
                mask=rng.random(n) < 0.02,
            ),
            "v": pa.array(
                rng.integers(0, 300, n).astype("int64"),
                mask=rng.random(n) < 0.05,
            ),
        }
    )
    src = {"t": ray.data.from_arrow(t)}
    got = (
        run_sql("SELECT k, APPROX_COUNT_DISTINCT(v) AS nd FROM t GROUP BY k", src)
        .to_pandas()
        .sort_values("k", na_position="first")
        .reset_index(drop=True)
    )
    want = (
        duckdb.sql(
            "SELECT k, CAST(COUNT(DISTINCT v) AS BIGINT) AS nd "
            "FROM t GROUP BY k"
        )
        .df()
        .sort_values("k", na_position="first")
        .reset_index(drop=True)
    )
    pdt.assert_frame_equal(got, want, check_dtype=False)
    g2 = run_sql("SELECT APPROX_COUNT_DISTINCT(v) AS nd FROM t", src).to_pandas()
    assert g2["nd"].tolist() == [300]
    g3 = run_sql(
        "SELECT k, APPROX_COUNT_DISTINCT(v) AS nd FROM t GROUP BY k "
        "HAVING nd > 250",
        src,
    ).to_pandas()
    w3 = duckdb.sql(
        "SELECT k FROM t GROUP BY k HAVING COUNT(DISTINCT v) > 250"
    ).df()
    assert len(g3) == len(w3)
    # zero input rows -> zero output rows (reference global-group parity)
    e = pa.table({"k": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    g4 = run_sql(
        "SELECT APPROX_COUNT_DISTINCT(v) AS nd FROM t",
        {"t": ray.data.from_arrow(e)},
    ).to_pandas()
    assert len(g4) == 0
    # unsupported shapes error clearly
    with pytest.raises(ValueError, match="cannot mix"):
        run_sql(
            "SELECT k, APPROX_COUNT_DISTINCT(v) AS nd, COUNT(v) AS c "
            "FROM t GROUP BY k",
            src,
        )


def test_sql_mode_aggregate(ray_session):
    """MODE(x) through SQL (round 5): grouped + global + NULL keys +
    a group whose every value is NULL (yields NULL, the group survives),
    deterministic smallest-value tie-break — vs an explicit DuckDB
    replay. Mixing with other aggregates raises."""
    import duckdb
    import numpy as np
    import pandas.testing as pdt
    import pyarrow as pa
    import ray.data

    from sqlgrep_ray.api import run_sql

    rng = np.random.default_rng(6)
    n = 8000
    t = pa.table(
        {
            "k": pa.array(
                rng.integers(0, 12, n).astype("int64"),
                mask=rng.random(n) < 0.02,
            ),
            "v": pa.array(
                rng.choice(["x", "y", "z", "w"], n), mask=rng.random(n) < 0.1
            ),
        }
    )
    t = pa.concat_tables(
        [
            t,
            pa.table(
                {
                    "k": pa.array([99, 99], pa.int64()),
                    "v": pa.array([None, None], pa.string()),
                }
            ),
        ]
    )
    src = {"t": ray.data.from_arrow(t)}
    got = (
        run_sql("SELECT k, MODE(v) AS mv FROM t GROUP BY k", src)
        .to_pandas()
        .sort_values("k", na_position="first")
        .reset_index(drop=True)
    )
    want = (
        duckdb.sql(
            """
      WITH c AS (SELECT k, v, count(*) AS c FROM t
                 WHERE v IS NOT NULL GROUP BY k, v),
      r AS (SELECT k, v, row_number() OVER (PARTITION BY k
                 ORDER BY c DESC, v ASC) AS rn FROM c)
      SELECT d.k, r.v AS mv FROM (SELECT DISTINCT k FROM t) d
      LEFT JOIN r ON (d.k IS NOT DISTINCT FROM r.k) AND r.rn = 1
    """
        )
        .df()
        .sort_values("k", na_position="first")
        .reset_index(drop=True)
    )
    pdt.assert_frame_equal(got, want, check_dtype=False)
    assert got[got.k == 99]["mv"].isna().all()  # all-NULL group survives
    g2 = run_sql("SELECT MODE(v) AS mv FROM t", src).to_pandas()
    assert g2["mv"].tolist() == ["y"]
    e = pa.table({"k": pa.array([], pa.int64()), "v": pa.array([], pa.string())})
    assert (
        len(
            run_sql(
                "SELECT MODE(v) AS mv FROM t", {"t": ray.data.from_arrow(e)}
            ).to_pandas()
        )
        == 0
    )
    with pytest.raises(ValueError, match="cannot mix"):
        run_sql("SELECT k, MODE(v) AS mv, COUNT(v) AS c FROM t GROUP BY k", src)


# -- aggregate FILTER (WHERE …) --------------------------------------------------


def test_agg_filter_vs_duckdb(ray_session):
    """FILTER clauses on grouped and global aggregates, incl. HAVING and
    string_agg/percentile parameter args riding unchanged — pinned
    against DuckDB."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from sqlgrep_ray.api import run_sql

    rng = np.random.default_rng(11)
    n = 3000
    t = pa.table(
        {
            "k": pa.array(rng.integers(0, 6, n).astype("int64")),
            "x": pa.array(
                rng.integers(0, 100, n).astype("int64"),
                mask=rng.random(n) < 0.1,
            ),
            "s": pa.array([f"v{i % 7}" for i in range(n)]),
        }
    )
    got = sorted(
        (r["k"], r["c"], r["sx"], r["cd"], r["mn"])
        for r in run_sql(
            "SELECT k, COUNT(*) FILTER (WHERE x > 50) AS c, "
            "SUM(x) FILTER (WHERE s = 'v3') AS sx, "
            "COUNT(DISTINCT s) FILTER (WHERE x < 20) AS cd, "
            "MIN(x) FILTER (WHERE s <> 'v0') AS mn "
            "FROM t GROUP BY k "
            "HAVING COUNT(*) FILTER (WHERE x IS NULL) > 10",
            ray.data.from_arrow(t),
        ).take_all()
    )
    exp = sorted(
        duckdb.sql(
            "SELECT k, COUNT(*) FILTER (WHERE x > 50), "
            "SUM(x) FILTER (WHERE s = 'v3'), "
            "COUNT(DISTINCT s) FILTER (WHERE x < 20), "
            "MIN(x) FILTER (WHERE s <> 'v0') FROM t GROUP BY k "
            "HAVING COUNT(*) FILTER (WHERE x IS NULL) > 10"
        ).fetchall()
    )
    assert got == [tuple(r) for r in exp]
    # global aggregate, no matching rows ⇒ SQL NULL / COUNT 0
    g = run_sql(
        "SELECT COUNT(*) FILTER (WHERE x > 1000) AS c, "
        "MAX(x) FILTER (WHERE x > 1000) AS m FROM t",
        ray.data.from_arrow(t),
    ).take_all()
    assert (g[0]["c"], g[0]["m"]) == (0, None)


def test_agg_filter_parse_errors():
    with pytest.raises(SqlError, match="not allowed in FILTER"):
        parse_query(
            "SELECT SUM(x) FILTER (WHERE COUNT(*) > 1) AS s FROM t GROUP BY k"
        )
    with pytest.raises(SqlError):
        parse_query("SELECT SUM(x) FILTER (x > 1) AS s FROM t GROUP BY k")


# -- ARRAY_AGG / STRING_AGG ... ORDER BY ------------------------------------------


def test_ordered_array_string_agg_vs_duckdb(ray_session):
    """ORDER BY inside ARRAY_AGG/STRING_AGG: elements sort by the order
    key (NULL keys last either direction), ties by the VALUE ascending —
    replayed in DuckDB as ORDER BY key [DESC], value."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from sqlgrep_ray.api import run_sql

    rng = np.random.default_rng(17)
    n = 2000
    t = pa.table(
        {
            "k": pa.array(rng.integers(0, 5, n).astype("int64")),
            "o": pa.array(
                rng.integers(0, 25, n).astype("int64"),
                mask=rng.random(n) < 0.05,
            ),
            "v": pa.array(rng.permutation(n).astype("int64")),
            "s": pa.array([f"w{i % 13}" for i in range(n)]),
        }
    )
    got = sorted(
        (r["k"], tuple(r["ids"]), r["js"])
        for r in run_sql(
            "SELECT k, ARRAY_AGG(v ORDER BY o DESC) AS ids, "
            "STRING_AGG(s, ',' ORDER BY v) AS js FROM t GROUP BY k",
            ray.data.from_arrow(t).repartition(4),
        ).take_all()
    )
    exp = sorted(
        (k, tuple(ids), js)
        for k, ids, js in duckdb.sql(
            "SELECT k, ARRAY_AGG(v ORDER BY o DESC, v) AS ids, "
            "STRING_AGG(s, ',' ORDER BY v) AS js FROM t GROUP BY k"
        ).fetchall()
    )
    assert got == exp


def test_ordered_agg_parse_errors():
    with pytest.raises(SqlError, match="ARRAY_AGG/STRING_AGG"):
        parse_query("SELECT SUM(v ORDER BY o) AS s FROM t GROUP BY k")
    with pytest.raises(SqlError, match="subqueries"):
        parse_query(
            "SELECT ARRAY_AGG(v ORDER BY o IN (SELECT x FROM u)) AS s "
            "FROM t GROUP BY k"
        )
    # scalar subqueries in the agg ORDER BY are LEGAL — they substitute
    # to a literal like every other slot (api._substitute_scalar_subs)
    p = parse_query(
        "SELECT ARRAY_AGG(v ORDER BY (SELECT MAX(x) FROM u)) AS s "
        "FROM t GROUP BY k"
    )
    assert p.plan.aggs[0].order is not None


# -- ORDER BY ordinals / LIMIT OFFSET / DISTINCT aggs ----------------------------


def test_order_ordinals_offset_vs_duckdb(ray_session):
    """ORDER BY <int> = 1-based SELECT ordinal (previously a constant
    no-op key); LIMIT n OFFSET m over ordered, unordered, and aggregate
    outputs — pinned against DuckDB where deterministic."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from sqlgrep_ray.api import run_sql

    rng = np.random.default_rng(31)
    n = 1000
    t = pa.table(
        {
            "a": pa.array(rng.permutation(n).astype("int64")),
            "b": pa.array(rng.integers(0, 10, n).astype("int64")),
        }
    )
    src = ray.data.from_arrow(t).repartition(4)
    got = [
        (r["a"], r["nb"])
        for r in run_sql(
            "SELECT a, b * 2 AS nb FROM t ORDER BY 2 DESC, 1 LIMIT 5", src
        ).take_all()
    ]
    exp = duckdb.sql(
        "SELECT a, b * 2 AS nb FROM t ORDER BY 2 DESC, 1 LIMIT 5"
    ).fetchall()
    assert got == [tuple(r) for r in exp]
    got = [
        r["a"]
        for r in run_sql(
            "SELECT a FROM t ORDER BY a LIMIT 7 OFFSET 3", src
        ).take_all()
    ]
    assert got == [3, 4, 5, 6, 7, 8, 9]
    got = [
        (r["b"], r["n"])
        for r in run_sql(
            "SELECT b, COUNT(*) AS n FROM t GROUP BY b "
            "ORDER BY 1 LIMIT 3 OFFSET 2",
            src,
        ).take_all()
    ]
    exp = duckdb.sql(
        "SELECT b, COUNT(*) AS n FROM t GROUP BY b ORDER BY 1 LIMIT 3 OFFSET 2"
    ).fetchall()
    assert got == [tuple(r) for r in exp]
    # unordered: row choice arbitrary, count contract only (+ past-end)
    assert len(run_sql("SELECT a FROM t LIMIT 10 OFFSET 990", src).take_all()) == 10
    assert len(run_sql("SELECT a FROM t LIMIT 10 OFFSET 995", src).take_all()) == 5


def test_distinct_array_string_agg(ray_session):
    import duckdb
    import pyarrow as pa
    import ray.data

    from sqlgrep_ray.api import run_sql

    t2 = pa.table({"k": [0, 0, 0, 1], "x": [2, 1, 2, 5], "s": ["b", "a", "b", "c"]})
    got = sorted(
        (r["k"], tuple(r["xs"]), r["ss"])
        for r in run_sql(
            "SELECT k, ARRAY_AGG(DISTINCT x) AS xs, "
            "STRING_AGG(DISTINCT s, ',') AS ss FROM t GROUP BY k",
            ray.data.from_arrow(t2),
        ).take_all()
    )
    exp = [
        (k, tuple(xs), ss)
        for k, xs, ss in duckdb.sql(
            "SELECT k, ARRAY_AGG(DISTINCT x ORDER BY x) AS xs, "
            "STRING_AGG(DISTINCT s, ',' ORDER BY s) AS ss "
            "FROM t2 GROUP BY k ORDER BY k"
        ).fetchall()
    ]
    assert got == exp


def test_ordinal_offset_distinct_parse_errors():
    with pytest.raises(SqlError, match="OFFSET requires LIMIT"):
        parse_query("SELECT a FROM t OFFSET 5")
    with pytest.raises(SqlError, match="out of range"):
        parse_query("SELECT a FROM t ORDER BY 3")
    with pytest.raises(SqlError, match="explicit SELECT list"):
        parse_query("SELECT * FROM t ORDER BY 1")
    with pytest.raises(SqlError, match="DISTINCT is not supported"):
        parse_query("SELECT STDDEV(DISTINCT x) AS s FROM t GROUP BY k")
    with pytest.raises(SqlError, match="ARRAY_AGG/STRING_AGG only"):
        parse_query(
            "SELECT SUM(DISTINCT x ORDER BY x) AS s FROM t GROUP BY k"
        )
    with pytest.raises(SqlError, match="cannot be combined"):
        parse_query(
            "SELECT ARRAY_AGG(DISTINCT x ORDER BY y) AS s FROM t GROUP BY k"
        )


# -- GROUP BY ordinal / ALL, CASE without ELSE, TIMESTAMP/DATE literals ----------


def test_group_by_ordinal_and_all(ray_session):
    import datetime as dt

    import duckdb
    import pyarrow as pa
    import ray.data

    from sqlgrep_ray.api import run_sql

    t = pa.table(
        {
            "lang": ["en", "fr", "en", "de"],
            "n": [1, 2, 3, 4],
            "ts": pa.array(
                [
                    dt.datetime(2024, 1, 1, 5),
                    dt.datetime(2024, 2, 1),
                    dt.datetime(2023, 12, 31),
                    dt.datetime(2024, 1, 1),
                ],
                pa.timestamp("us"),
            ),
        }
    )
    src = ray.data.from_arrow(t)
    for q, dq in [
        ("SELECT lang, COUNT(*) AS c FROM t GROUP BY 1", None),
        (
            "SELECT lang, SUM(n) AS s FROM t GROUP BY ALL",
            "SELECT lang, SUM(n) AS s FROM t GROUP BY lang",
        ),
        (
            "SELECT CASE WHEN n > 2 THEN 'big' END AS x, n FROM t",
            None,
        ),
        (
            "SELECT n FROM t WHERE ts >= TIMESTAMP '2024-01-01 00:00:00' "
            "ORDER BY n",
            None,
        ),
        ("SELECT n FROM t WHERE ts > DATE '2024-01-01' ORDER BY n", None),
    ]:
        key = lambda x: tuple((v is None, v) for v in x)  # noqa: E731
        got = sorted(
            (tuple(r.values()) for r in run_sql(q, src).take_all()), key=key
        )
        exp = sorted((tuple(r) for r in duckdb.sql(dq or q).fetchall()), key=key)
        assert got == exp, q


def test_group_by_ordinal_errors():
    with pytest.raises(SqlError, match="out of range"):
        parse_query("SELECT a, COUNT(*) AS n FROM t GROUP BY 5")
    with pytest.raises(SqlError, match="explicit SELECT"):
        parse_query("SELECT * FROM t GROUP BY ALL")
    with pytest.raises(SqlError, match="no non-aggregate"):
        parse_query("SELECT COUNT(*) AS n FROM t GROUP BY ALL")
    with pytest.raises(SqlError, match="invalid TIMESTAMP"):
        parse_query("SELECT a FROM t WHERE ts > TIMESTAMP 'nonsense'")


def test_interval_arithmetic_vs_duckdb(ray_session):
    """INTERVAL '<n> <unit>' / 'H:M:S' literals compile to duration
    scalars — timestamp ± interval is one Arrow kernel; month/year
    (calendar units) are rejected."""
    import datetime as dt

    import duckdb
    import pyarrow as pa
    import ray.data

    from sqlgrep_ray.api import run_sql

    t = pa.table(
        {
            "i": [0, 1],
            "ts": pa.array(
                [dt.datetime(2024, 1, 1, 12), dt.datetime(2024, 1, 3)],
                pa.timestamp("us"),
            ),
        }
    )
    q = (
        "SELECT i, ts + INTERVAL '1 day 2 hours' AS t2, "
        "ts - INTERVAL '30 minutes' AS t3 FROM t "
        "WHERE ts > TIMESTAMP '2024-01-02 00:00:00' - INTERVAL '13 hours'"
    )
    got = sorted(
        (r["i"], r["t2"], r["t3"])
        for r in run_sql(q, ray.data.from_arrow(t)).take_all()
    )
    exp = sorted(tuple(r) for r in duckdb.sql(q).fetchall())
    assert got == exp
    # dialect H:M:S form
    rows = run_sql(
        "SELECT ts + INTERVAL '1:30:00' AS t4, i FROM t ORDER BY i",
        ray.data.from_arrow(t),
    ).take_all()
    assert rows[0]["t4"] == dt.datetime(2024, 1, 1, 13, 30)


def test_interval_parse_errors():
    with pytest.raises(SqlError, match="unsupported interval unit"):
        parse_query("SELECT ts + INTERVAL '3 months' AS x FROM t")
    with pytest.raises(SqlError, match="interval"):
        parse_query("SELECT ts + INTERVAL '' AS x FROM t")


def test_multikey_join_vs_duckdb(ray_session):
    """Composite-key broadcast join (ON a = x AND b = y): the pandas
    merge takes the key list directly; INNER and LEFT, NULL==NULL per
    key; RIGHT JOIN keeps the single-key contract."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from sqlgrep_ray.api import run_sql

    rng = np.random.default_rng(8)
    n = 500
    lt = pa.table(
        {
            "a": pa.array(rng.integers(0, 20, n).astype("int64")),
            "b": pa.array([f"g{int(x)}" for x in rng.integers(0, 5, n)]),
            "v": pa.array(rng.integers(0, 100, n).astype("int64")),
        }
    )
    rt = pa.table(
        {
            "x": pa.array(np.repeat(np.arange(20), 5).astype("int64")),
            "y": pa.array([f"g{i % 5}" for i in range(100)]),
            "w": pa.array(np.arange(100).astype("int64")),
        }
    )
    key = lambda t_: tuple((v is None, v) for v in t_)  # noqa: E731
    got = sorted(
        (
            (r["a"], r["b"], r["v"], r["w"])
            for r in run_sql(
                "SELECT a, b, v, r.w AS w FROM l "
                "INNER JOIN r ON l.a = r.x AND l.b = r.y",
                {"l": ray.data.from_arrow(lt), "r": ray.data.from_arrow(rt)},
            ).take_all()
        ),
        key=key,
    )
    exp = sorted(
        (
            tuple(t_)
            for t_ in duckdb.sql(
                "SELECT a, b, v, rt.w AS w FROM lt "
                "JOIN rt ON lt.a = rt.x AND lt.b = rt.y"
            ).fetchall()
        ),
        key=key,
    )
    assert got == exp
    rt10 = rt.slice(0, 10)
    got = sorted(
        (
            (r["a"], r["b"], r["w"])
            for r in run_sql(
                "SELECT a, b, r.w AS w FROM l "
                "LEFT JOIN r ON l.a = r.x AND l.b = r.y",
                {"l": ray.data.from_arrow(lt),
                 "r": ray.data.from_arrow(rt10)},
            ).take_all()
        ),
        key=key,
    )
    exp = sorted(
        (
            tuple(t_)
            for t_ in duckdb.sql(
                "SELECT a, b, rt10.w AS w FROM lt "
                "LEFT JOIN rt10 ON lt.a = rt10.x AND lt.b = rt10.y"
            ).fetchall()
        ),
        key=key,
    )
    assert got == exp
    with pytest.raises(Exception, match="single join key"):
        run_sql(
            "SELECT a FROM l RIGHT JOIN r ON l.a = r.x AND l.b = r.y",
            {"l": ray.data.from_arrow(lt), "r": ray.data.from_arrow(rt)},
        )


# -- SUM/AVG(DISTINCT) and the round-5 scalar additions --------------------------


def test_sql_sum_avg_distinct(ray_session):
    """SUM/AVG(DISTINCT x) (round-5 extension): grouped via the skew-safe
    two-stage path (all distinct aggs share one arg), global, the
    holistic map_groups fallback (mixed with percentile), negative ints
    (trunc-toward-zero AVG, engine parity), floats, NULL values and an
    all-NULL group."""
    import duckdb
    import numpy as np
    import pandas.testing as pdt
    import pyarrow as pa
    import ray.data

    from sqlgrep_ray.api import run_sql

    rng = np.random.default_rng(11)
    n = 4000
    k = rng.integers(0, 7, n).astype("int64")
    v = rng.integers(-50, 50, n).astype("int64")
    t = pa.table(
        {
            "k": k,
            # group 6 is all-NULL in v
            "v": pa.array(v, mask=(rng.random(n) < 0.05) | (k == 6)),
            "f": pa.array(
                np.round(rng.random(n) * 10, 3), mask=rng.random(n) < 0.05
            ),
        }
    )
    src = {"t": ray.data.from_arrow(t)}

    def trunc_avg(s, c):
        if c == 0:
            return None
        q = abs(s) // c
        return -q if s < 0 else q

    # grouped, two-stage eligible (sum/avg/count DISTINCT same arg + COUNT(*))
    got = (
        run_sql(
            "SELECT k, SUM(DISTINCT v) AS sd, AVG(DISTINCT v) AS ad, "
            "COUNT(DISTINCT v) AS cd, COUNT(*) AS n FROM t GROUP BY k",
            src,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        duckdb.sql(
            "SELECT k, CAST(SUM(DISTINCT v) AS BIGINT) AS sd, "
            "COUNT(DISTINCT v) AS cd, COUNT(*) AS n FROM t GROUP BY k"
        )
        .df()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want.insert(
        2, "ad",
        [trunc_avg(s, c) if s == s else None
         for s, c in zip(want["sd"].fillna(np.nan), want["cd"])],
    )
    pdt.assert_frame_equal(got, want, check_dtype=False)
    # the all-NULL group came out NULL for both distinct aggs
    assert got.loc[got["k"] == 6, "sd"].isna().all()
    assert got.loc[got["k"] == 6, "ad"].isna().all()

    # float AVG(DISTINCT) — true division
    gf = (
        run_sql("SELECT k, AVG(DISTINCT f) AS af FROM t GROUP BY k", src)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    wf = (
        duckdb.sql("SELECT k, AVG(DISTINCT f) AS af FROM t GROUP BY k")
        .df().sort_values("k").reset_index(drop=True)
    )
    assert np.allclose(gf["af"], wf["af"], equal_nan=True)

    # global (no GROUP BY)
    gg = run_sql("SELECT SUM(DISTINCT v) AS sd, AVG(DISTINCT v) AS ad FROM t", src).to_pandas()
    wgs = duckdb.sql("SELECT CAST(SUM(DISTINCT v) AS BIGINT) s, COUNT(DISTINCT v) c FROM t").fetchone()
    assert gg["sd"].tolist() == [wgs[0]]
    assert gg["ad"].tolist() == [trunc_avg(wgs[0], wgs[1])]

    # holistic fallback: mixed args disqualify the two-stage path
    gm = (
        run_sql(
            "SELECT k, SUM(DISTINCT v) AS sd, PERCENTILE(f, 0.5) AS p50 "
            "FROM t GROUP BY k",
            src,
        )
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    pdt.assert_frame_equal(
        gm[["k", "sd"]], want[["k", "sd"]], check_dtype=False
    )


def test_sql_scalar_ext2_functions(ray_session):
    """Round-5 scalar additions vs DuckDB: trig family, degrees/radians,
    cbrt, 1-/2-arg log, POSITION(x IN y), translate (delete past-end
    chars), md5, ascii (0 for ''), chr, to_hex; initcap vs the Postgres
    word-capitalization shape (DuckDB lacks initcap)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from sqlgrep_ray.api import run_sql

    t = pa.table(
        {
            "i": pa.array([0, 1, 5, 255, 1000, None], pa.int64()),
            "s": pa.array(
                ["abcabc", "hello world", "", "xyz", None, "foo-bar baz"]
            ),
        }
    )
    src = {"t": ray.data.from_arrow(t)}
    sql = (
        "SELECT i, round(sin(i), 9) AS sn, round(cos(i), 9) AS cs, "
        "round(tan(i), 9) AS tn, round(atan(i), 9) AS at1, "
        "round(atan2(i, 3), 9) AS a2, round(degrees(i), 6) AS dg, "
        "round(radians(i), 9) AS rd, round(cbrt(i + 1), 9) AS cb, "
        "round(log(i + 10), 9) AS lg10, round(log(2, i + 10), 9) AS lg2, "
        "position('b' IN s) AS pb, translate(s, 'abc', 'xy') AS tr, "
        "md5(s) AS h, ascii(s) AS ac, "
        "chr(CAST(65 + mod(i, 26) AS INTEGER)) AS ch, to_hex(i) AS hx "
        "FROM t"
    )
    got = run_sql(sql, src).to_pandas()
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(sql).df()
    con.close()
    for c in want.columns:
        g, w = got[c], want[c]
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            assert np.allclose(
                g.astype(float), w.astype(float), equal_nan=True
            ), c
        else:
            assert g.fillna("__N").tolist() == w.fillna("__N").tolist(), c

    # asin/acos on a bounded domain
    t2 = pa.table({"x": pa.array([-1.0, -0.5, 0.0, 0.5, 1.0, None])})
    src2 = {"t": ray.data.from_arrow(t2)}
    sql2 = ("SELECT round(asin(x), 9) AS a, round(acos(x), 9) AS b FROM t")
    g2 = run_sql(sql2, src2).to_pandas()
    con = duckdb.connect()
    con.register("t", t2)
    w2 = con.execute(sql2).df()
    con.close()
    for c in ("a", "b"):
        assert np.allclose(g2[c], w2[c], equal_nan=True), c

    # initcap: Postgres shape (no DuckDB twin)
    g3 = run_sql("SELECT initcap(s) AS t FROM t", src).to_pandas()["t"]
    assert g3.tolist() == [
        "Abcabc", "Hello World", "", "Xyz", None, "Foo-Bar Baz"
    ]


# -- derived tables and table aliases (round-5 extension) ------------------------


def test_derived_table_parse():
    q = parse_query(
        "SELECT a FROM (SELECT a FROM base WHERE a > 1) t WHERE a < 9"
    )
    assert q.table == "t"
    assert len(q.derived) == 1 and q.derived[0][0] == "t"
    assert q.derived[0][1].table == "base"
    # alias keyword form + bare form both accepted
    q2 = parse_query("SELECT a FROM (SELECT a FROM base) AS u")
    assert q2.table == "u"
    # derived join side
    q3 = parse_query(
        "SELECT a FROM l JOIN (SELECT x FROM r) j ON l.a = j.x"
    )
    assert q3.join_table == "j" and q3.derived[0][0] == "j"
    # missing alias is an error
    with pytest.raises(SqlError):
        parse_query("SELECT a FROM (SELECT a FROM base) WHERE a > 1")


def test_table_alias_parse():
    q = parse_query("SELECT d.a FROM base d WHERE d.a > 1")
    assert q.table == "base" and q.table_alias == "d"
    q2 = parse_query(
        "SELECT d.a, r.b FROM base AS d JOIN other r ON d.k = r.k"
    )
    assert (q2.table, q2.table_alias) == ("base", "d")
    assert (q2.join_table, q2.join_alias) == ("other", "r")
    # clause keywords never swallow as aliases
    q3 = parse_query("SELECT a FROM base WHERE a > 1")
    assert q3.table_alias is None


def test_derived_tables_execute(ray_session):
    """Derived FROM + derived JOIN + aliases vs DuckDB, nested derived,
    and the raw-text Tables surface."""
    import duckdb
    import pyarrow as pa
    import ray.data

    from sqlgrep_ray.api import run_sql

    t = pa.table(
        {
            "k": ["a", "b", "a", "c", "b", "a", "c", "c"],
            "v": [1, 2, 3, 4, 5, 6, 7, 8],
        }
    )
    src = {"base": ray.data.from_arrow(t)}
    con = duckdb.connect()
    con.register("base", t)

    # FROM (SELECT ...) t
    got = sorted(
        (r["k"], r["n"]) for r in run_sql(
            "SELECT k, COUNT(*) AS n FROM (SELECT k FROM base WHERE v > 2) t "
            "GROUP BY k",
            src,
        ).take_all()
    )
    exp = sorted(
        con.execute(
            "SELECT k, COUNT(*) n FROM (SELECT k FROM base WHERE v > 2) t "
            "GROUP BY k"
        ).fetchall()
    )
    assert got == exp

    # nested derived + set-query derived member
    got2 = run_sql(
        "SELECT MAX(n) AS m FROM (SELECT k, COUNT(*) AS n FROM "
        "(SELECT k FROM base) u GROUP BY k) t",
        src,
    ).take_all()
    assert got2 == [{"m": 3}]

    # aliased FROM joined to a derived aggregate, alias-qualified refs
    got3 = sorted(
        (r["k"], r["tot"]) for r in run_sql(
            "SELECT d.k AS k, s.total AS tot FROM base d JOIN "
            "(SELECT k, SUM(v) AS total FROM base GROUP BY k) s "
            "ON d.k = s.k WHERE d.v >= 5",
            src,
        ).take_all()
    )
    exp3 = sorted(
        con.execute(
            "SELECT d.k, CAST(s.total AS BIGINT) FROM base d JOIN "
            "(SELECT k, SUM(v) AS total FROM base GROUP BY k) s "
            "ON d.k = s.k WHERE d.v >= 5"
        ).fetchall()
    )
    assert got3 == exp3
    con.close()

    # same alias reused for DIFFERENT subqueries in set-query members
    got4 = run_sql(
        "SELECT COUNT(*) AS n FROM (SELECT k FROM base WHERE v > 6) t "
        "UNION ALL "
        "SELECT COUNT(*) AS n FROM (SELECT k FROM base WHERE v <= 6) t",
        src,
    ).take_all()
    assert sorted(r["n"] for r in got4) == [2, 6]

    # raw-text Tables surface
    from sqlgrep_ray import Tables

    tb = Tables()
    tb.add_tables(
        r"CREATE TABLE kv(line = '(\\w+)=(\\d+)', line[1] => k TEXT, line[2] => v INT);"
    )
    rows = tb.execute_query_rows(
        "SELECT k, n FROM (SELECT k, COUNT(*) AS n FROM kv GROUP BY k) t "
        "WHERE n > 1 ORDER BY k",
        source=["a=1", "b=2", "a=3", "c=4", "a=5", "b=6"],
    )
    assert rows == [{"k": "a", "n": 3}, {"k": "b", "n": 2}]


def test_sql_stats_aggregates(ray_session):
    """stddev_samp/var_samp/stddev_pop/var_pop, two-column
    covar_pop/covar_samp/corr (pairwise NULL semantics), MEDIAN — vs
    DuckDB on the associative combiner path AND the holistic map_groups
    path (mixed with percentile); degenerate inputs give NULL."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from sqlgrep_ray.api import run_sql

    rng = np.random.default_rng(7)
    n = 3000
    k = rng.integers(0, 5, n)
    t = pa.table(
        {
            "k": k.astype("int64"),
            "x": pa.array(rng.normal(0, 10, n), type=pa.float64()),
            "y": pa.array(rng.normal(5, 2, n) + k, type=pa.float64()),
        }
    )
    nullmask = pa.array(rng.random(n) < 0.1)
    t = t.set_column(
        1, "x", pc.if_else(nullmask, pa.scalar(None, pa.float64()), t["x"])
    )
    src = {"t": ray.data.from_arrow(t)}
    sql = (
        "SELECT k, round(stddev_samp(x), 7) AS ss, round(var_samp(x), 7) AS vs, "
        "round(stddev_pop(x), 7) AS sp, round(var_pop(x), 7) AS vp, "
        "round(covar_pop(x, y), 7) AS cp, round(covar_samp(x, y), 7) AS cs2, "
        "round(corr(x, y), 7) AS cr FROM t GROUP BY k"
    )
    got = sorted(run_sql(sql, src).take_all(), key=lambda r: r["k"])
    con = duckdb.connect()
    con.register("t", t)
    exp = sorted(con.execute(sql).fetchall())
    for g, e in zip(got, exp):
        gv = (g["k"], g["ss"], g["vs"], g["sp"], g["vp"], g["cp"], g["cs2"], g["cr"])
        assert all(abs(a - b) < 1e-6 for a, b in zip(gv, e)), (gv, e)

    # holistic path: mixed with percentile forces GroupEvaluator/map_groups
    sqlh = (
        "SELECT k, round(corr(x, y), 7) AS cr, round(var_samp(x), 7) AS vs, "
        "percentile(x, 0.5) AS p FROM t GROUP BY k"
    )
    goth = sorted(run_sql(sqlh, src).take_all(), key=lambda r: r["k"])
    for g, gh in zip(got, goth):
        assert abs(g["cr"] - gh["cr"]) < 1e-9
        assert abs(g["vs"] - gh["vs"]) < 1e-9

    # expression second argument binds through the normal path
    ge = run_sql("SELECT round(covar_pop(x, y + 1.0), 7) AS c FROM t", src).take_all()
    we = con.execute("SELECT round(covar_pop(x, y + 1.0), 7) FROM t").fetchone()
    assert abs(ge[0]["c"] - we[0]) < 1e-6
    con.close()

    # degenerate: single observation / no valid pairs ⇒ NULL
    e2 = pa.table({"x": pa.array([1.0, None]), "y": pa.array([None, 2.0])})
    g3 = run_sql(
        "SELECT covar_samp(x, y) AS c, var_samp(x) AS v, corr(x, y) AS r, "
        "stddev_samp(x) AS s FROM t",
        {"t": ray.data.from_arrow(e2)},
    ).take_all()
    assert g3 == [{"c": None, "v": None, "r": None, "s": None}]

    # median ≡ percentile 0.5 (engine truncation-index semantics)
    gm = run_sql("SELECT median(x) AS m, percentile(x, 0.5) AS p FROM t", src).take_all()
    assert gm[0]["m"] == gm[0]["p"]

    # arity errors
    with pytest.raises(SqlError):
        parse_query("SELECT corr(x) AS c FROM t")
    with pytest.raises(SqlError):
        parse_query("SELECT median(x, 0.3) AS m FROM t")


def test_window_expression_arguments(ray_session):
    """Expression window arguments (round-5 extension): SUM(a*b) OVER,
    LAG(a+b) OVER, FIRST_VALUE(a-b) OVER — lifted into hidden __wv*
    pre-window columns (one per distinct expr); vs DuckDB on the
    partitioned exchange path AND the global ranged path; nesting a
    window inside a window argument is refused."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from sqlgrep_ray.api import run_sql

    rng = np.random.default_rng(9)
    n = 400
    t = pa.table(
        {
            "k": rng.integers(0, 4, n).astype("int64"),
            "o": np.arange(n, dtype="int64"),
            "v": rng.integers(0, 100, n).astype("int64"),
            "w": rng.integers(1, 10, n).astype("int64"),
        }
    )
    src = {"t": ray.data.from_arrow(t)}
    con = duckdb.connect()
    con.register("t", t)

    got = sorted(
        run_sql(
            "SELECT k, o, SUM(v * w) OVER (PARTITION BY k ORDER BY o) AS s, "
            "LAG(v + w) OVER (PARTITION BY k ORDER BY o) AS l, "
            "FIRST_VALUE(v - w) OVER (PARTITION BY k ORDER BY o) AS f FROM t",
            src,
        ).take_all(),
        key=lambda r: (r["k"], r["o"]),
    )
    exp = con.execute(
        "SELECT k, o, CAST(SUM(v * w) OVER (PARTITION BY k ORDER BY o) AS BIGINT), "
        "LAG(v + w) OVER (PARTITION BY k ORDER BY o), "
        "FIRST_VALUE(v - w) OVER (PARTITION BY k ORDER BY o) "
        "FROM t ORDER BY k, o"
    ).fetchall()
    assert [(g["k"], g["o"], g["s"], g["l"], g["f"]) for g in got] == exp

    # global associative auto-route keeps working with an expr arg
    g2 = sorted(
        run_sql("SELECT o, SUM(v * 2) OVER (ORDER BY o) AS rs FROM t", src).take_all(),
        key=lambda r: r["o"],
    )
    e2 = con.execute(
        "SELECT o, CAST(SUM(v * 2) OVER (ORDER BY o) AS BIGINT) FROM t ORDER BY o"
    ).fetchall()
    assert [(g["o"], g["rs"]) for g in g2] == e2
    con.close()

    # identical exprs share ONE hidden input column
    q = parse_query(
        "SELECT SUM(v * w) OVER (PARTITION BY k ORDER BY o) AS a, "
        "AVG(v * w) OVER (PARTITION BY k ORDER BY o) AS b FROM t"
    )
    assert len(q.plan.win_inputs) == 1
    assert all(w.value_col == q.plan.win_inputs[0][0] for w in q.plan.windows)

    # nested window in a window argument is refused
    with pytest.raises(SqlError, match="nest"):
        parse_query(
            "SELECT SUM(LAG(v) OVER (PARTITION BY k ORDER BY o) + 1) "
            "OVER (PARTITION BY k ORDER BY o) AS x FROM t"
        )


def test_multi_join_chain(ray_session):
    """Multi-join chains (round-5 extension): each further JOIN is one
    more broadcast stage (Query.extra_joins). Parse structure, SELECT
    and GROUP BY paths vs DuckDB, LEFT in chain, chained ON referencing
    an earlier join, the text-table surface, and the RIGHT-JOIN
    placement error."""
    import duckdb
    import pyarrow as pa
    import ray.data

    from sqlgrep_ray.api import run_sql

    q = parse_query(
        "SELECT a FROM t JOIN u ON t.k = u.k JOIN v w ON u.g = w.g "
        "LEFT JOIN x ON w.h = x.h"
    )
    assert q.join_table == "u" and len(q.extra_joins) == 2
    assert q.extra_joins[0][0] == "v" and q.extra_joins[0][2] == "w"
    # chained ON key referencing the earlier join rides prefixed
    assert q.extra_joins[0][3] == "u.g"
    assert q.extra_joins[1][5] == "left"
    with pytest.raises(SqlError, match="first join"):
        parse_query(
            "SELECT a FROM t JOIN u ON t.k = u.k RIGHT JOIN v ON u.g = v.g"
        )

    lt = pa.table({"k": [1, 2, 3, 4], "a": ["p", "q", "r", "s"]})
    ut = pa.table({"k": [1, 2, 3], "g": [10, 20, 10]})
    vt = pa.table({"g": [10, 20], "lbl": ["x", "y"]})
    src = {
        "t": ray.data.from_arrow(lt),
        "u": ray.data.from_arrow(ut),
        "v": ray.data.from_arrow(vt),
    }
    con = duckdb.connect()
    for nm, tt in (("t", lt), ("u", ut), ("v", vt)):
        con.register(nm, tt)

    sql = (
        "SELECT t.a AS a, v.lbl AS lbl FROM t "
        "JOIN u ON t.k = u.k JOIN v ON u.g = v.g"
    )
    got = sorted((r["a"], r["lbl"]) for r in run_sql(sql, src).take_all())
    exp = sorted(con.execute(sql).fetchall())
    assert got == exp

    # LEFT in chain keeps unmatched stream rows
    sql2 = (
        "SELECT t.a AS a, v.lbl AS lbl FROM t "
        "LEFT JOIN u ON t.k = u.k LEFT JOIN v ON u.g = v.g"
    )
    got2 = sorted(
        (r["a"], r["lbl"]) for r in run_sql(sql2, src).take_all()
    )
    exp2 = sorted(con.execute(sql2).fetchall())
    assert got2 == exp2

    # aggregate path with chain + qualified keys by alias or table name
    sql3 = (
        "SELECT v.lbl AS lbl, COUNT(*) AS n FROM t "
        "JOIN u uu ON t.k = uu.k JOIN v ON u.g = v.g GROUP BY v.lbl"
    )
    got3 = sorted((r["lbl"], r["n"]) for r in run_sql(sql3, src).take_all())
    exp3 = sorted(
        con.execute(
            "SELECT v.lbl, COUNT(*) FROM t JOIN u uu ON t.k = uu.k "
            "JOIN v ON uu.g = v.g GROUP BY v.lbl"
        ).fetchall()
    )
    assert got3 == exp3
    con.close()

    # text-table surface: chain over CTE-bound tables
    from sqlgrep_ray import Tables

    tb = Tables()
    tb.add_tables(
        r"CREATE TABLE ev(line = 'u=(\\d+)', line[1] => uid INT);"
    )
    rows = tb.execute_query_rows(
        "WITH u AS (SELECT 1 AS id, 10 AS g FROM ev WHERE uid = 1), "
        "g AS (SELECT 10 AS g, 2 AS two FROM ev WHERE uid = 1) "
        "SELECT ev.uid AS uid, g.two AS two "
        "FROM ev JOIN u ON ev.uid = u.id JOIN g ON u.g = g.g",
        source=["u=1", "u=2"],
    )
    assert rows == [{"uid": 1, "two": 2}]


def test_range_following_frames(ray_session):
    """RANGE frames with FOLLOWING bounds (round-5 extension): all four
    new forms vs DuckDB over a tied/gappy numeric order column, the
    interval form over timestamps, and parse errors for unsupported
    shapes."""
    import datetime as dt

    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from sqlgrep_ray.api import run_sql

    rng = np.random.default_rng(17)
    n = 500
    t = pa.table(
        {
            "k": rng.integers(0, 4, n).astype("int64"),
            "o": rng.integers(0, 150, n).astype("float64"),
            "v": rng.integers(0, 50, n).astype("int64"),
        }
    )
    src = {"t": ray.data.from_arrow(t)}
    con = duckdb.connect()
    con.register("t", t)
    cases = [
        "SUM(v) OVER (PARTITION BY k ORDER BY o "
        "RANGE BETWEEN 10 PRECEDING AND 5 FOLLOWING)",
        "COUNT(*) OVER (PARTITION BY k ORDER BY o "
        "RANGE BETWEEN 10 PRECEDING AND 5 FOLLOWING)",
        "AVG(v) OVER (PARTITION BY k ORDER BY o "
        "RANGE BETWEEN CURRENT ROW AND 7 FOLLOWING)",
        "SUM(v) OVER (PARTITION BY k ORDER BY o "
        "RANGE BETWEEN UNBOUNDED PRECEDING AND 3 FOLLOWING)",
        "COUNT(v) OVER (PARTITION BY k ORDER BY o "
        "RANGE BETWEEN 4 PRECEDING AND UNBOUNDED FOLLOWING)",
    ]
    for expr in cases:
        got = sorted(
            run_sql(f"SELECT k, o, v, {expr} AS w FROM t", src).take_all(),
            key=lambda r: (r["k"], r["o"], r["v"]),
        )
        exp = con.execute(
            f"SELECT k, o, v, {expr} FROM t ORDER BY k, o, v"
        ).fetchall()
        gw = [None if g["w"] is None else round(float(g["w"]), 9) for g in got]
        ew = [None if e[3] is None else round(float(e[3]), 9) for e in exp]
        assert gw == ew, expr

    # interval FOLLOWING over timestamps
    base = dt.datetime(2026, 1, 1)
    ts = pa.array(
        [base + dt.timedelta(seconds=int(s)) for s in rng.integers(0, 3600, n)],
        pa.timestamp("us"),
    )
    t2 = t.append_column("ts", ts)
    src2 = {"t": ray.data.from_arrow(t2)}
    con.register("t2", t2)
    got = sorted(
        run_sql(
            "SELECT k, ts, v, SUM(v) OVER (PARTITION BY k ORDER BY ts "
            "RANGE BETWEEN INTERVAL '0:05:00' PRECEDING AND "
            "INTERVAL '0:02:00' FOLLOWING) AS w FROM t",
            src2,
        ).take_all(),
        key=lambda r: (r["k"], r["ts"], r["v"]),
    )
    exp = con.execute(
        "SELECT k, ts, v, CAST(SUM(v) OVER (PARTITION BY k ORDER BY ts "
        "RANGE BETWEEN INTERVAL 5 MINUTE PRECEDING AND "
        "INTERVAL 2 MINUTE FOLLOWING) AS BIGINT) "
        "FROM t2 ORDER BY k, ts, v"
    ).fetchall()
    assert [g["w"] for g in got] == [e[3] for e in exp]
    con.close()

    # unsupported: MIN/MAX over RANGE FOLLOWING
    with pytest.raises(Exception, match="SUM/AVG/COUNT"):
        run_sql(
            "SELECT MIN(v) OVER (PARTITION BY k ORDER BY o "
            "RANGE BETWEEN 4 PRECEDING AND 2 FOLLOWING) AS w FROM t",
            src,
        ).take_all()


def test_cross_join(ray_session):
    """CROSS JOIN (round-5 extension): cartesian product with a small
    broadcast side, aliases, chaining with equi-joins, aggregation over
    the product — vs DuckDB. `cross` never parses as a bare table
    alias."""
    import duckdb
    import pyarrow as pa
    import ray.data

    from sqlgrep_ray.api import run_sql

    q = parse_query("SELECT a FROM l CROSS JOIN r")
    assert q.join_how == "cross" and q.join_left_col is None
    q2 = parse_query("SELECT a FROM l JOIN r ON l.a = r.b CROSS JOIN s")
    assert q2.extra_joins[0][5] == "cross"

    lt = pa.table({"a": [1, 2, 3], "x": ["p", "q", "r"]})
    rt = pa.table({"b": [1, 2], "y": ["u", "v"]})
    src = {"l": ray.data.from_arrow(lt), "r": ray.data.from_arrow(rt)}
    con = duckdb.connect()
    con.register("l", lt)
    con.register("r", rt)
    got = sorted(
        (r["a"], r["b"], r["y"]) for r in run_sql(
            "SELECT l.a AS a, r.b AS b, r.y AS y FROM l CROSS JOIN r", src
        ).take_all()
    )
    exp = sorted(con.execute("SELECT l.a, r.b, r.y FROM l CROSS JOIN r").fetchall())
    assert got == exp and len(got) == 6

    # aggregate over the product
    g3 = sorted(
        (r["a"], r["n"]) for r in run_sql(
            "SELECT l.a AS a, COUNT(*) AS n FROM l CROSS JOIN r GROUP BY l.a",
            src,
        ).take_all()
    )
    assert g3 == [(1, 2), (2, 2), (3, 2)]

    # chained cross + equi
    g4 = run_sql(
        "SELECT COUNT(*) AS n FROM l CROSS JOIN r JOIN r r2 ON l.a = r2.b",
        src,
    ).take_all()
    e4 = con.execute(
        "SELECT COUNT(*) FROM l CROSS JOIN r JOIN r r2 ON l.a = r2.b"
    ).fetchone()
    assert g4[0]["n"] == e4[0]
    con.close()


def test_join_using_sugar(ray_session):
    """JOIN … USING (k [, …]) — sugar for ON l.k = r.k AND …; executes
    through the same broadcast path (right columns stay prefixed)."""
    import pyarrow as pa
    import ray.data

    from sqlgrep_ray.api import run_sql

    q = parse_query("SELECT a FROM l JOIN r USING (k, j)")
    assert q.join_left_col == ("k", "j") and q.join_right_col == ("k", "j")

    lt = pa.table({"k": [1, 2, 3], "a": ["p", "q", "r"]})
    rt = pa.table({"k": [1, 2], "w": [10, 20]})
    got = sorted(
        (r["a"], r["w"]) for r in run_sql(
            "SELECT l.a AS a, r.w AS w FROM l JOIN r USING (k)",
            {"l": ray.data.from_arrow(lt), "r": ray.data.from_arrow(rt)},
        ).take_all()
    )
    assert got == [("p", 10), ("q", 20)]


def test_group_by_select_alias(ray_session):
    """GROUP BY <select alias> (round-5 extension): a bare name matching
    a SELECT alias resolves to that projection's expression; composes
    with HAVING alias references and expression keys."""
    import duckdb
    import pyarrow as pa
    import ray.data

    from sqlgrep_ray.api import run_sql

    q = parse_query("SELECT upper(x) AS u, COUNT(*) AS n FROM t GROUP BY u")
    assert q.plan.group_by[0].expr == parse_query(
        "SELECT upper(x) AS u FROM t"
    ).plan.projections[0].expr

    t = pa.table({"lang": ["en", "de", "EN", "de"], "v": [1, 2, 3, 4]})
    src = {"t": ray.data.from_arrow(t)}
    con = duckdb.connect()
    con.register("t", t)
    sql = "SELECT upper(lang) AS l, COUNT(*) AS n FROM t GROUP BY l"
    got = sorted((r["l"], r["n"]) for r in run_sql(sql, src).take_all())
    exp = sorted(con.execute(sql).fetchall())
    assert got == exp
    con.close()


def test_window_expression_partition_keys(ray_session):
    """Expression PARTITION BY keys (round-5): non-column keys lift into
    hidden __wv* inputs; mixed plain+expression composite keys; vs
    DuckDB; shared exprs dedupe to one hidden column."""
    import datetime as dt

    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from sqlgrep_ray.api import run_sql

    rng = np.random.default_rng(21)
    n = 300
    base = dt.datetime(2026, 1, 1)
    t = pa.table(
        {
            "ts": pa.array(
                [base + dt.timedelta(hours=int(h))
                 for h in rng.integers(0, 96, n)],
                pa.timestamp("us"),
            ),
            "o": np.arange(n, dtype="int64"),
            "v": rng.integers(0, 50, n).astype("int64"),
            "k": rng.integers(0, 3, n).astype("int64"),
        }
    )
    src = {"t": ray.data.from_arrow(t)}
    con = duckdb.connect()
    con.register("t", t)
    got = sorted(
        run_sql(
            "SELECT o, SUM(v) OVER (PARTITION BY date_trunc('day', ts) "
            "ORDER BY o) AS s, "
            "ROW_NUMBER() OVER (PARTITION BY mod(k, 2), "
            "date_trunc('day', ts) ORDER BY o) AS rn FROM t",
            src,
        ).take_all(),
        key=lambda r: r["o"],
    )
    exp = con.execute(
        "SELECT o, CAST(SUM(v) OVER (PARTITION BY date_trunc('day', ts) "
        "ORDER BY o) AS BIGINT), "
        "ROW_NUMBER() OVER (PARTITION BY mod(k, 2), date_trunc('day', ts) "
        "ORDER BY o) FROM t ORDER BY o"
    ).fetchall()
    assert [(g["o"], g["s"], g["rn"]) for g in got] == exp
    con.close()

    # one hidden input per distinct expression, shared across functions
    q = parse_query(
        "SELECT SUM(v) OVER (PARTITION BY mod(k, 2) ORDER BY o) AS a, "
        "COUNT(v) OVER (PARTITION BY mod(k, 2) ORDER BY o) AS b, "
        "AVG(v + 1) OVER (PARTITION BY mod(k, 2) ORDER BY o) AS c FROM t"
    )
    assert len(q.plan.win_inputs) == 2  # mod(k,2) and v+1


def test_window_expression_order_keys(ray_session):
    """Expression ORDER BY keys inside OVER (round-5): bare single-
    ascending expr, composite with DESC, and a value-RANGE frame over an
    expression order — all via the hidden __wv* lift; vs DuckDB."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from sqlgrep_ray.api import run_sql

    rng = np.random.default_rng(23)
    n = 200
    t = pa.table(
        {
            "k": rng.integers(0, 3, n).astype("int64"),
            "o": rng.integers(0, 40, n).astype("int64"),
            "j": np.arange(n, dtype="int64"),
            "v": rng.integers(0, 50, n).astype("int64"),
        }
    )
    src = {"t": ray.data.from_arrow(t)}
    con = duckdb.connect()
    con.register("t", t)
    got = sorted(
        run_sql(
            "SELECT j, ROW_NUMBER() OVER (PARTITION BY k ORDER BY o * 2 + j) AS rn, "
            "SUM(v) OVER (PARTITION BY k ORDER BY mod(o, 7) DESC, j) AS s "
            "FROM t",
            src,
        ).take_all(),
        key=lambda r: r["j"],
    )
    exp = con.execute(
        "SELECT j, ROW_NUMBER() OVER (PARTITION BY k ORDER BY o * 2 + j), "
        "CAST(SUM(v) OVER (PARTITION BY k ORDER BY mod(o, 7) DESC, j) AS BIGINT) "
        "FROM t ORDER BY j"
    ).fetchall()
    assert [(g["j"], g["rn"], g["s"]) for g in got] == exp

    # value-RANGE frame over an expression order key
    g2 = sorted(
        run_sql(
            "SELECT j, SUM(v) OVER (PARTITION BY k ORDER BY o + 0 "
            "RANGE BETWEEN 5 PRECEDING AND 3 FOLLOWING) AS s FROM t",
            src,
        ).take_all(),
        key=lambda r: r["j"],
    )
    e2 = con.execute(
        "SELECT j, CAST(SUM(v) OVER (PARTITION BY k ORDER BY o + 0 "
        "RANGE BETWEEN 5 PRECEDING AND 3 FOLLOWING) AS BIGINT) "
        "FROM t ORDER BY j"
    ).fetchall()
    assert [(g["j"], g["s"]) for g in g2] == e2
    con.close()


def test_error_message_hygiene():
    """Malformed queries raise SqlError with actionable text — never a
    raw ValueError from deeper layers."""
    cases = [
        ("SELECT SUM(a, b) AS s FROM t", "exactly one argument"),
        ("SELECT CAST(a AS NOPE) AS x FROM t", "unknown type"),
        ("SELECT TRY_CAST(a AS NOPE) AS x FROM t", "unknown type"),
        ("SELECT a FROM t WHERE a > ALL (1, 2)", "requires a subquery"),
        ("SELECT a FROM (SELECT a FROM t)", "end of input"),
    ]
    for sql, msg in cases:
        with pytest.raises(SqlError, match=msg):
            parse_query(sql)


def test_bare_alias_simple_case_is_distinct(ray_session):
    """Round-5 idiom closers: bare projection aliases (`COUNT(*) n`),
    simple CASE (`CASE a WHEN 1 THEN …` — desugars to searched-form
    equalities), IS [NOT] DISTINCT FROM (null-safe (in)equality) — vs
    DuckDB with NULLs in play."""
    import duckdb
    import pyarrow as pa
    import ray.data

    from sqlgrep_ray.api import run_sql

    q = parse_query("SELECT a x, COUNT(*) n FROM t GROUP BY a")
    assert [k.name for k in q.plan.group_by] == ["x"]
    assert q.plan.aggs[0].name == "n"
    qc = parse_query("SELECT CASE a WHEN 1 THEN 'x' END c FROM t")
    w = qc.plan.projections[0].expr.whens[0][0]
    assert isinstance(w, Bin) and w.op == "eq"

    t = pa.table({"a": [1, 2, None, 2], "b": [1, None, None, 3]})
    src = {"t": ray.data.from_arrow(t)}
    con = duckdb.connect()
    con.register("t", t)
    key = lambda r: tuple((v is None, v) for v in r)  # noqa: E731
    for sql in [
        "SELECT a x, COUNT(*) n FROM t GROUP BY a",
        "SELECT CASE a WHEN 1 THEN 'one' WHEN 2 THEN 'two' "
        "ELSE 'other' END c FROM t",
        "SELECT a, b FROM t WHERE a IS DISTINCT FROM b",
        "SELECT a, b FROM t WHERE a IS NOT DISTINCT FROM b",
    ]:
        got = sorted(
            (tuple(r.values()) for r in run_sql(sql, src).take_all()), key=key
        )
        exp = sorted((tuple(r) for r in con.execute(sql).fetchall()), key=key)
        assert got == exp, sql
    con.close()
