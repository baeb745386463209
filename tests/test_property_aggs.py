"""Hypothesis: the aggregate engine's two physical paths (single-block
merge vs distributed shuffle) both match an independent per-group Python
reference of the documented semantics — COUNT/COUNT(col)/MIN/MAX/SUM,
AVG with INTEGER division for int columns, population STDDEV — over random
grouped data with NULL keys and NULL values."""

import math

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from sqlgrep_ray.functions.exprs import Col
from sqlgrep_ray.pipelines.plan import AggItem, AggregatePlan, GroupKey
from sqlgrep_ray.pipelines.runner import run_plan

_key = st.one_of(st.none(), st.sampled_from(["a", "b", "c"]))
_val = st.one_of(st.none(), st.integers(min_value=-50, max_value=50))


@st.composite
def grouped_data(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    keys = draw(st.lists(_key, min_size=n, max_size=n))
    vals = draw(st.lists(_val, min_size=n, max_size=n))
    return keys, vals


def _ref(keys, vals):
    groups: dict = {}
    for k, v in zip(keys, vals):
        groups.setdefault(k, []).append(v)
    out = {}
    for k, vs in groups.items():
        present = [v for v in vs if v is not None]
        row = {"n": len(vs), "nv": len(present)}
        row["mn"] = min(present) if present else None
        row["mx"] = max(present) if present else None
        row["sm"] = sum(present) if present else None
        if present:
            s = sum(present)
            # AVG over ints = truncating integer division (reference parity)
            q = abs(s) // len(present)
            row["av"] = q if s >= 0 else -q
            m = s / len(present)
            row["sd"] = math.sqrt(sum((v - m) ** 2 for v in present) / len(present))
        else:
            row["av"] = None
            row["sd"] = None
        out[k] = row
    return out


@settings(max_examples=60, deadline=None)
@given(grouped_data(), st.booleans())
def test_aggregate_paths_match_reference(ray_session, data, small):
    import ray.data

    keys, vals = data
    t = pa.table(
        {
            "k": pa.array(keys, pa.string()),
            "v": pa.array(vals, pa.int64()),
        }
    )
    plan = AggregatePlan(
        group_by=(GroupKey("k", Col("k")),),
        aggs=(
            AggItem("n", "count_star"),
            AggItem("nv", "count", Col("v")),
            AggItem("mn", "min", Col("v")),
            AggItem("mx", "max", Col("v")),
            AggItem("sm", "sum", Col("v")),
            AggItem("av", "avg", Col("v")),
            AggItem("sd", "stddev", Col("v")),
        ),
        small_result=small,
    )
    ds = ray.data.from_arrow(t).repartition(3)
    got = {r["k"]: r for r in run_plan(ds, plan).take_all()}
    want = _ref(keys, vals)
    assert set(got) == set(want)
    for k, w in want.items():
        g = got[k]
        for f in ("n", "nv", "mn", "mx", "sm", "av"):
            assert g[f] == w[f], (k, f, g[f], w[f], small)
        if w["sd"] is None:
            assert g["sd"] is None
        else:
            assert abs(g["sd"] - w["sd"]) < 1e-9, (k, g["sd"], w["sd"])


@st.composite
def paired_data(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    keys = draw(st.lists(_key, min_size=n, max_size=n))
    xs = draw(st.lists(_val, min_size=n, max_size=n))
    ys = draw(st.lists(_val, min_size=n, max_size=n))
    return keys, xs, ys


def _stats_ref(keys, xs, ys):
    """Independent per-group reference for the round-5 statistical
    family: sample variance/stddev ((n−1), NULL under two), covar_pop/
    covar_samp/corr over pairwise-complete observations."""
    groups: dict = {}
    for k, x, y in zip(keys, xs, ys):
        groups.setdefault(k, []).append((x, y))
    out = {}
    for k, rows in groups.items():
        px = [x for x, _ in rows if x is not None]
        pairs = [(x, y) for x, y in rows if x is not None and y is not None]
        row: dict = {}
        if len(px) >= 2:
            m = sum(px) / len(px)
            row["vs"] = sum((v - m) ** 2 for v in px) / (len(px) - 1)
            row["ss"] = math.sqrt(row["vs"])
        else:
            row["vs"] = row["ss"] = None
        if pairs:
            mx = sum(x for x, _ in pairs) / len(pairs)
            my = sum(y for _, y in pairs) / len(pairs)
            cov = sum((x - mx) * (y - my) for x, y in pairs) / len(pairs)
            row["cp"] = cov
            row["cs"] = (
                cov * len(pairs) / (len(pairs) - 1) if len(pairs) >= 2 else None
            )
            vx = sum((x - mx) ** 2 for x, _ in pairs) / len(pairs)
            vy = sum((y - my) ** 2 for _, y in pairs) / len(pairs)
            den = math.sqrt(vx * vy)
            row["cr"] = cov / den if den > 0 else None
        else:
            row["cp"] = row["cs"] = row["cr"] = None
        out[k] = row
    return out


@settings(max_examples=40, deadline=None)
@given(paired_data(), st.booleans())
def test_stats_aggregate_paths_match_reference(ray_session, data, small):
    """Round-5 statistical aggregates on BOTH physical paths (single-
    block merge vs distributed shuffle) vs an independent Python
    reference — NULL keys, NULL values (pairwise semantics), groups of
    size one."""
    import ray.data

    keys, xs, ys = data
    t = pa.table(
        {
            "k": pa.array(keys, pa.string()),
            "x": pa.array(xs, pa.int64()),
            "y": pa.array(ys, pa.int64()),
        }
    )
    plan = AggregatePlan(
        group_by=(GroupKey("k", Col("k")),),
        aggs=(
            AggItem("ss", "stddev_samp", Col("x")),
            AggItem("vs", "var_samp", Col("x")),
            AggItem("cp", "covar_pop", Col("x"), extra=Col("y")),
            AggItem("cs", "covar_samp", Col("x"), extra=Col("y")),
            AggItem("cr", "corr", Col("x"), extra=Col("y")),
        ),
        small_result=small,
    )
    ds = ray.data.from_arrow(t).repartition(3)
    got = {r["k"]: r for r in run_plan(ds, plan).take_all()}
    want = _stats_ref(keys, xs, ys)
    assert set(got) == set(want)
    for k, w in want.items():
        g = got[k]
        for f in ("ss", "vs", "cp", "cs", "cr"):
            if w[f] is None:
                assert g[f] is None, (k, f, g[f], small)
            else:
                assert g[f] is not None and abs(g[f] - w[f]) < 1e-8, (
                    k, f, g[f], w[f], small,
                )
