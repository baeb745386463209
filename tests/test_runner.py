"""Select / aggregate / join runner vs a DuckDB oracle on sf0.001."""

import math

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sqlgrep_ray.functions.exprs import Bin, Case, Col, Func, Lit
from sqlgrep_ray.pipelines.plan import (
    AggItem,
    AggregatePlan,
    GroupKey,
    JoinSpec,
    Projection,
    SelectPlan,
)
from sqlgrep_ray.pipelines.runner import run_plan


def oracle(sql, sf_dir):
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "nation", "events"):
        con.execute(
            f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.sql(sql).fetchall()


def normalize(rows):
    def norm(v):
        if isinstance(v, float):
            return round(v, 6)
        return v

    return sorted(
        tuple(norm(v) for v in (r.values() if isinstance(r, dict) else r))
        for r in rows
    )


def check(ds_rows, sql, sf_dir):
    assert normalize(ds_rows) == normalize(oracle(sql, sf_dir))


def test_select_filter_project(ray_session, sf_dir):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet")
    plan = SelectPlan(
        projections=(
            Projection("l_orderkey", Col("l_orderkey")),
            Projection(
                "revenue",
                Bin(
                    "mul",
                    Col("l_extendedprice"),
                    Bin("sub", Lit(1.0), Col("l_discount")),
                ),
            ),
        ),
        where=Bin("gt", Col("l_quantity"), Lit(49.0)),
    )
    rows = run_plan(ds, plan).take_all()
    check(
        [tuple(r.values()) for r in rows],
        "select l_orderkey, l_extendedprice * (1 - l_discount) as revenue "
        "from lineitem where l_quantity > 49",
        sf_dir,
    )


def test_aggregate_associative(ray_session, sf_dir):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet")
    plan = AggregatePlan(
        group_by=(
            GroupKey("l_returnflag", Col("l_returnflag")),
            GroupKey("l_linestatus", Col("l_linestatus")),
        ),
        aggs=(
            AggItem("n", "count_star"),
            AggItem("sum_qty", "sum", Col("l_quantity")),
            AggItem("min_price", "min", Col("l_extendedprice")),
            AggItem("max_price", "max", Col("l_extendedprice")),
            AggItem("avg_disc", "avg", Col("l_discount")),
            AggItem("var_qty", "variance", Col("l_quantity")),
        ),
    )
    rows = [tuple(r.values()) for r in run_plan(ds, plan).take_all()]
    check(
        rows,
        "select l_returnflag, l_linestatus, count(*) n, sum(l_quantity), "
        "min(l_extendedprice), max(l_extendedprice), avg(l_discount), "
        "var_pop(l_quantity) from lineitem group by 1, 2",
        sf_dir,
    )


def test_aggregate_int_avg_integer_division(ray_session, sf_dir):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet")
    plan = AggregatePlan(
        group_by=(GroupKey("o_orderstatus", Col("o_orderstatus")),),
        aggs=(AggItem("avg_key", "avg", Col("o_custkey")),),
    )
    rows = [tuple(r.values()) for r in run_plan(ds, plan).take_all()]
    # reference int AVG = sum/count integer division (aggregate_execution.rs:473-489)
    check(
        rows,
        "select o_orderstatus, sum(o_custkey) // count(o_custkey) "
        "from orders group by 1",
        sf_dir,
    )


def test_aggregate_group_by_expression(ray_session, sf_dir):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet")
    plan = AggregatePlan(
        group_by=(GroupKey("hr", Func("timestamp_extract_hour", (Col("ts"),))),),
        aggs=(AggItem("n", "count_star"), AggItem("mx", "max", Col("value"))),
    )
    rows = [tuple(r.values()) for r in run_plan(ds, plan).take_all()]
    check(
        rows,
        "select extract(hour from ts)::bigint hr, count(*) n, max(value) mx "
        "from events group by 1",
        sf_dir,
    )


def test_having_with_extra_aggregate(ray_session, sf_dir):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet")
    plan = AggregatePlan(
        group_by=(GroupKey("l_suppkey", Col("l_suppkey")),),
        aggs=(
            AggItem("n", "count_star"),
            AggItem("__having0", "max", Col("l_quantity")),
        ),
        having=Bin(
            "and",
            Bin("gt", Col("n"), Lit(500)),
            Bin("ge", Col("__having0"), Lit(50.0)),
        ),
    )
    rows = [tuple(r.values()) for r in run_plan(ds, plan).take_all()]
    check(
        rows,
        "select l_suppkey, count(*) n from lineitem group by 1 "
        "having count(*) > 500 and max(l_quantity) >= 50",
        sf_dir,
    )


def test_transform_on_aggregate_value(ray_session, sf_dir):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet")
    # SUM(x) * 2 (aggregate_execution_tests.rs:1094-1157 shape)
    plan = AggregatePlan(
        group_by=(GroupKey("l_returnflag", Col("l_returnflag")),),
        aggs=(
            AggItem(
                "double_qty",
                "sum",
                Col("l_quantity"),
                transform=Bin("mul", Col("$value"), Lit(2.0)),
            ),
        ),
    )
    rows = [tuple(r.values()) for r in run_plan(ds, plan).take_all()]
    check(
        rows,
        "select l_returnflag, sum(l_quantity) * 2 from lineitem group by 1",
        sf_dir,
    )


def test_count_distinct_and_percentile(ray_session, sf_dir):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet")
    plan = AggregatePlan(
        group_by=(GroupKey("l_returnflag", Col("l_returnflag")),),
        aggs=(
            AggItem("nd", "count_distinct", Col("l_suppkey")),
            AggItem("p50", "percentile", Col("l_quantity"), extra=0.5),
        ),
    )
    rows = {r["l_returnflag"]: r for r in run_plan(ds, plan).take_all()}
    orc = oracle(
        "select l_returnflag, count(distinct l_suppkey) nd, "
        "count(*) cnt from lineitem group by 1",
        sf_dir,
    )
    for flag, nd, cnt in orc:
        assert rows[flag]["nd"] == nd
        # reference percentile: sorted values, index trunc(p*n)
        vals = oracle(
            f"select l_quantity from lineitem where l_returnflag = '{flag}' "
            "order by 1",
            sf_dir,
        )
        assert rows[flag]["p50"] == vals[int(0.5 * cnt)][0]


def test_select_distinct(ray_session, sf_dir):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet")
    plan = SelectPlan(
        projections=(
            Projection("o_orderstatus", Col("o_orderstatus")),
            Projection("o_orderpriority", Col("o_orderpriority")),
        ),
        distinct=True,
    )
    rows = [tuple(r.values()) for r in run_plan(ds, plan).take_all()]
    check(
        rows,
        "select distinct o_orderstatus, o_orderpriority from orders",
        sf_dir,
    )


def test_broadcast_join_inner_and_left(ray_session, sf_dir):
    import ray
    import ray.data as rd

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    right = ray.put(nation)
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet")

    inner = SelectPlan(
        projections=(
            Projection("c_name", Col("c_name")),
            Projection("n_name", Col("n_name")),
        ),
        join=JoinSpec(right=right, left_key="c_nationkey", right_key="n_nationkey"),
    )
    rows = [tuple(r.values()) for r in run_plan(cust, inner).take_all()]
    check(
        rows,
        "select c_name, n_name from customer join nation on c_nationkey = n_nationkey",
        sf_dir,
    )

    # left-outer: restrict build side so some customers miss
    small = nation.filter(pa.compute.less(nation["n_nationkey"], 10))
    left = SelectPlan(
        projections=(
            Projection("c_name", Col("c_name")),
            Projection("n_name", Col("n_name")),
        ),
        join=JoinSpec(
            right=ray.put(small),
            left_key="c_nationkey",
            right_key="n_nationkey",
            how="left",
        ),
    )
    rows = [tuple(r.values()) for r in run_plan(cust, left).take_all()]
    check(
        rows,
        "select c_name, n_name from customer left join "
        "(select * from nation where n_nationkey < 10) n "
        "on c_nationkey = n_nationkey",
        sf_dir,
    )


def test_join_one_to_many_fanout(ray_session, sf_dir):
    import ray
    import ray.data as rd

    # build side with duplicate keys → 1:N fan-out (join.rs:109-123)
    dup = pa.table(
        {"k": pa.array([0, 0, 1], pa.int32()), "v": pa.array(["a", "b", "c"])}
    )
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet")
    plan = SelectPlan(
        projections=(Projection("c_custkey", Col("c_custkey")), Projection("v", Col("v"))),
        join=JoinSpec(right=ray.put(dup), left_key="c_nationkey", right_key="k"),
    )
    rows = run_plan(cust, plan).take_all()
    n0 = oracle("select count(*) from customer where c_nationkey = 0", sf_dir)[0][0]
    n1 = oracle("select count(*) from customer where c_nationkey = 1", sf_dir)[0][0]
    assert len(rows) == 2 * n0 + n1


def test_limit(ray_session, sf_dir):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet")
    plan = SelectPlan(limit=17)
    assert len(run_plan(ds, plan).take_all()) == 17


def test_case_projection(ray_session, sf_dir):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet")
    plan = SelectPlan(
        projections=(
            Projection("o_orderkey", Col("o_orderkey")),
            Projection(
                "bucket",
                Case(
                    whens=(
                        (Bin("gt", Col("o_totalprice"), Lit(200000.0)), Lit("big")),
                        (Bin("gt", Col("o_totalprice"), Lit(50000.0)), Lit("mid")),
                    ),
                    else_=Lit("small"),
                ),
            ),
        ),
    )
    rows = [tuple(r.values()) for r in run_plan(ds, plan).take_all()]
    check(
        rows,
        "select o_orderkey, case when o_totalprice > 200000 then 'big' "
        "when o_totalprice > 50000 then 'mid' else 'small' end bucket from orders",
        sf_dir,
    )


def test_referenced_columns_pruning():
    from sqlgrep_ray.functions.exprs import Bin, Col, Func, Lit
    from sqlgrep_ray.pipelines.plan import (
        AggItem,
        AggregatePlan,
        GroupKey,
        JoinSpec,
        Projection,
        SelectPlan,
    )
    from sqlgrep_ray.pipelines.runner import referenced_columns
    import pyarrow as pa

    p1 = SelectPlan(
        projections=(Projection("a", Col("a")), Projection("c2", Bin("mul", Col("c"), Lit(2)))),
        where=Bin("gt", Col("b"), Lit(1)),
    )
    assert referenced_columns(p1) == ["a", "b", "c"]
    assert referenced_columns(SelectPlan(projections=None)) is None  # wildcard

    right = pa.table({"rk": [1], "rv": ["x"]})
    p2 = AggregatePlan(
        group_by=(GroupKey("rv", Col("rv")),),  # right-side key → not read
        aggs=(AggItem("n", "count_star"), AggItem("s", "sum", Col("v"))),
        having=Bin("gt", Col("n"), Lit(0)),  # output name → not read
        join=JoinSpec(right=right, left_key="lk", right_key="rk"),
    )
    assert referenced_columns(p2) == ["lk", "v"]


def test_referenced_columns_window_plan():
    """Window plans report INPUT columns (value/partition/order), never
    the hidden __win outputs the rewritten projections reference."""
    from sqlgrep_ray.pipelines.runner import referenced_columns
    from sqlgrep_ray.sqlfront import parse_query

    plan = parse_query(
        "SELECT k, ts - LAG(ts) OVER (PARTITION BY k, d ORDER BY o) AS l "
        "FROM t WHERE x > 1"
    ).plan
    assert referenced_columns(plan) == ["d", "k", "o", "ts", "x"]


def test_window_prunes_before_shuffle(ray_session):
    """A window query over a wide table only ships referenced columns
    through the bucket shuffle (and unreferenced columns don't break it)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from sqlgrep_ray.pipelines.runner import run_plan
    from sqlgrep_ray.sqlfront import parse_query

    n = 50
    t = pa.table(
        {
            "k": pa.array(["a", "b"] * 25),
            "o": pa.array(np.arange(n, dtype=np.int64)),
            "v": pa.array(np.arange(n, dtype=np.int64)),
            # wide payload the query never mentions
            **{f"w{i}": pa.array(["x" * 50] * n) for i in range(8)},
        }
    )
    plan = parse_query(
        "SELECT k, o, SUM(v) OVER (PARTITION BY k ORDER BY o) AS rs FROM t"
    ).plan
    out = (
        run_plan(ray.data.from_arrow(t).repartition(4), plan)
        .to_pandas()
        .sort_values("o")
        .reset_index(drop=True)
    )
    assert out.columns.tolist() == ["k", "o", "rs"]
    assert out["rs"].iloc[-1] == sum(range(1, n, 2))  # k='b' total
