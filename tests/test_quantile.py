"""Distributed exact percentile (stages/quantile.py) — equals the holistic
truncation-index rule with bounded memory."""

import numpy as np
import pyarrow as pa
import pytest

from sqlgrep_ray.stages.quantile import distributed_percentile


def _expected(vals, p):
    a = np.sort(np.asarray([v for v in vals if v is not None]))
    k = int(p * len(a))
    return None if k >= len(a) else a[k]


@pytest.mark.parametrize("p", [0.0, 0.25, 0.5, 0.9, 0.99])
def test_distributed_percentile_exact(ray_session, p):
    import ray.data

    rng = np.random.RandomState(7)
    vals = rng.lognormal(0, 2, 20_000)
    t = pa.table({"x": pa.array(vals, pa.float64())})
    ds = ray.data.from_arrow(t).repartition(8)
    got = distributed_percentile(ds, "x", p, sample_size=500, bracket_budget=3000)
    assert got == _expected(vals, p)


def test_distributed_percentile_nulls_and_oob(ray_session):
    import ray.data

    t = pa.table({"x": pa.array([None, 3.0, 1.0, None, 2.0], pa.float64())})
    ds = ray.data.from_arrow(t)
    assert distributed_percentile(ds, "x", 0.5) == 2.0
    assert distributed_percentile(ds, "x", 1.0) is None  # OOB ⇒ NULL
    empty = ray.data.from_arrow(pa.table({"x": pa.array([], pa.float64())}))
    assert distributed_percentile(empty, "x", 0.5) is None


def test_distributed_percentile_matches_plan_path(ray_session):
    """Same value as the holistic plan-path percentile on integers."""
    import ray.data

    from sqlgrep_ray.functions.exprs import Col
    from sqlgrep_ray.pipelines.plan import AggItem, AggregatePlan
    from sqlgrep_ray.pipelines.runner import run_plan

    rng = np.random.RandomState(3)
    vals = rng.randint(0, 10_000, 5000)
    t = pa.table({"x": pa.array(vals, pa.int64())})
    plan = AggregatePlan(aggs=(AggItem("p90", "percentile", Col("x"), extra=0.9),))
    hol = run_plan(ray.data.from_arrow(t).repartition(4), plan).take_all()[0]["p90"]
    dist = distributed_percentile(
        ray.data.from_arrow(t).repartition(4), "x", 0.9, sample_size=200,
        bracket_budget=1000,
    )
    assert dist == hol


def test_plan_path_routes_global_percentile_distributed(ray_session, monkeypatch):
    """A keyless all-percentile plan runs through distributed_percentile
    (never ships the column to one map_groups worker), including multiple
    percentile aggs, $value transforms, and NULL args; grouped and empty
    inputs keep the holistic path."""
    import ray.data

    import sqlgrep_ray.stages.quantile as q
    from sqlgrep_ray.functions.exprs import Bin, Col, Lit
    from sqlgrep_ray.pipelines.plan import AggItem, AggregatePlan, GroupKey
    from sqlgrep_ray.pipelines.runner import run_plan

    calls = []
    real = q.distributed_percentile

    def spy(*a, **k):
        calls.append(a)
        return real(*a, **k)

    monkeypatch.setattr(q, "distributed_percentile", spy)

    rng = np.random.RandomState(5)
    vals = rng.randint(0, 1000, 4000).astype(float)
    vals[::7] = np.nan
    xs = pa.array([None if np.isnan(v) else v for v in vals], pa.float64())
    t = pa.table({"x": xs})
    ds = ray.data.from_arrow(t).repartition(4)
    plan = AggregatePlan(
        aggs=(
            AggItem("p50", "percentile", Col("x"), extra=0.5),
            AggItem(
                "p90x2", "percentile", Col("x"), extra=0.9,
                transform=Bin("mul", Col("$value"), Lit(2.0)),
            ),
        )
    )
    rows = run_plan(ds, plan).take_all()
    assert len(calls) == 2
    clean = sorted(v for v in vals if not np.isnan(v))
    assert rows[0]["p50"] == clean[int(0.5 * len(clean))]
    assert rows[0]["p90x2"] == clean[int(0.9 * len(clean))] * 2.0

    # empty input: zero rows (reference parity), no crash
    empty = ray.data.from_arrow(pa.table({"x": pa.array([], pa.float64())}))
    assert run_plan(empty, plan).take_all() == []

    # grouped percentile keeps the holistic path (no new spy calls)
    n_calls = len(calls)
    gt = pa.table(
        {"g": pa.array([1, 1, 2, 2], pa.int64()),
         "x": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64())}
    )
    gplan = AggregatePlan(
        group_by=(GroupKey("g", Col("g")),),
        aggs=(AggItem("p0", "percentile", Col("x"), extra=0.0),),
    )
    grows = run_plan(ray.data.from_arrow(gt), gplan).take_all()
    assert [(r["g"], r["p0"]) for r in grows] == [(1, 1.0), (2, 3.0)]
    assert len(calls) == n_calls


def test_grouped_percentile_vs_reference(ray_session):
    """Bucketized per-key percentile == per-group sorted[int(p*n)], with
    NULL values dropped and a NULL-key group (SQL semantics)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from sqlgrep_ray.stages.quantile import grouped_percentile

    rng = np.random.RandomState(17)
    n = 3000
    keys = [None if c == 9 else f"k{c}" for c in rng.randint(0, 10, n)]
    vals = [None if rng.rand() < 0.05 else int(v) for v in rng.randint(0, 1000, n)]
    t = pa.table({"k": pa.array(keys, pa.string()), "v": pa.array(vals, pa.int64())})
    ds = ray.data.from_arrow(t).repartition(7)
    for p in (0.0, 0.5, 0.9, 1.0):
        out = {
            r["k"]: r["p"]
            for r in grouped_percentile(ds, "k", "v", p, out_col="p").take_all()
        }
        groups: dict = {}
        for k, v in zip(keys, vals):
            if v is not None:
                groups.setdefault(k, []).append(v)
        exp = {
            k: sorted(vs)[min(int(np.floor(p * len(vs))), len(vs) - 1)]
            for k, vs in groups.items()
        }
        assert out == exp, p
