"""Windowed / session aggregation (stages/window.py)."""

import datetime as dt

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from sqlgrep_ray.functions.exprs import Col
from sqlgrep_ray.pipelines.plan import AggItem
from sqlgrep_ray.stages.window import sessionize, tumbling_window


def _events():
    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: two sessions (gap > 10 min between idx 2 and 3)
        (1, base + dt.timedelta(minutes=0), 1.0),
        (1, base + dt.timedelta(minutes=2), 2.0),
        (1, base + dt.timedelta(minutes=4), 3.0),
        (1, base + dt.timedelta(minutes=30), 4.0),
        (1, base + dt.timedelta(minutes=31), 5.0),
        # user 2: one session
        (2, base + dt.timedelta(minutes=90), 6.0),
        (2, base + dt.timedelta(minutes=95), 7.0),
    ]
    return pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "value": pa.array([r[2] for r in rows], pa.float64()),
        }
    )


def test_sessionize_gap_split(ray_session):
    import ray.data

    out = (
        sessionize(ray.data.from_arrow(_events()).repartition(3),
                   key="user_id", ts_col="ts", gap_s=600)
        .to_pandas()
        .sort_values(["user_id", "session_idx"])
        .reset_index(drop=True)
    )
    assert len(out) == 3
    u1 = out[out.user_id == 1]
    assert list(u1["n_events"]) == [3, 2]
    assert list(u1["duration_s"]) == [240.0, 60.0]
    assert u1.iloc[1]["session_start"] == dt.datetime(2024, 1, 1, 0, 30)
    u2 = out[out.user_id == 2]
    assert list(u2["n_events"]) == [2]


def test_sessionize_boundary_gap_not_split(ray_session):
    """A gap of EXACTLY gap_s stays in the same session (strict >)."""
    import ray.data

    base = dt.datetime(2024, 1, 1)
    t = pa.table(
        {
            "user_id": pa.array([1, 1], pa.int64()),
            "ts": pa.array(
                [base, base + dt.timedelta(seconds=600)], pa.timestamp("us")
            ),
        }
    )
    out = sessionize(
        ray.data.from_arrow(t), key="user_id", ts_col="ts", gap_s=600
    ).to_pandas()
    assert len(out) == 1 and out.iloc[0]["n_events"] == 2


def test_tumbling_window(ray_session):
    import ray.data

    out = (
        tumbling_window(
            ray.data.from_arrow(_events()).repartition(2),
            ts_col="ts",
            width_s=3600,
            aggs=(AggItem("n", "count_star"), AggItem("mx", "max", Col("value"))),
        )
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    assert len(out) == 2
    assert out.iloc[0]["window_start"] == dt.datetime(2024, 1, 1, 0, 0)
    assert out.iloc[0]["n"] == 5 and out.iloc[0]["mx"] == 5.0
    assert out.iloc[1]["window_start"] == dt.datetime(2024, 1, 1, 1, 0)
    assert out.iloc[1]["n"] == 2 and out.iloc[1]["mx"] == 7.0


def test_tumbling_with_extra_key(ray_session):
    import ray.data

    out = tumbling_window(
        ray.data.from_arrow(_events()),
        ts_col="ts",
        width_s=3600,
        aggs=(AggItem("n", "count_star"),),
        extra_keys=("user_id",),
    ).to_pandas()
    key = {(r["window_start"].hour, r["user_id"]): r["n"] for _, r in out.iterrows()}
    assert key == {(0, 1): 5, (1, 2): 2}


def test_hopping_window(ray_session):
    import ray.data

    from sqlgrep_ray.stages.window import hopping_window

    out = (
        hopping_window(
            ray.data.from_arrow(_events()).repartition(2),
            ts_col="ts",
            width_s=3600,
            hop_s=1800,
            aggs=(AggItem("n", "count_star"),),
        )
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    # events at minutes 0,2,4,30,31,90,95; 60-min windows hopping every
    # 30 min: each event lands in exactly 2 windows
    got = {
        (r["window_start"].hour, r["window_start"].minute): r["n"]
        for _, r in out.iterrows()
    }
    # exact reference: window w contains event t iff w <= t < w + width
    import collections

    ref = collections.Counter()
    for _, row in _events().to_pandas().iterrows():
        t = row["ts"]
        us = int(t.timestamp() * 1e6)
        w0 = (us // (1800 * 10**6)) * 1800 * 10**6
        for j in range(2):
            ref[dt.datetime.utcfromtimestamp((w0 - j * 1800 * 10**6) / 1e6)] += 1
    assert {k: v for k, v in got.items()} == {
        (k.hour, k.minute): v for k, v in ref.items()
    }


def test_hopping_window_requires_divisible_hop(ray_session):
    import pytest
    import ray.data

    from sqlgrep_ray.stages.window import hopping_window

    with pytest.raises(ValueError):
        hopping_window(
            ray.data.from_arrow(_events()), ts_col="ts", width_s=3600,
            hop_s=700, aggs=(AggItem("n", "count_star"),),
        )


def test_assign_sessions_row_level(ray_session):
    import ray.data

    from sqlgrep_ray.stages.window import assign_sessions

    t = _events()
    out = assign_sessions(
        ray.data.from_arrow(t).repartition(3),
        key="user_id", ts_col="ts", gap_s=600, keep_cols=["value"],
    ).take_all()
    got = {(r["user_id"], r["value"]): r["session_idx"] for r in out}
    # user 1: minutes 0,2,4 (session 0) then 30,31 (session 1); user 2: one
    assert got == {
        (1, 1.0): 0, (1, 2.0): 0, (1, 3.0): 0,
        (1, 4.0): 1, (1, 5.0): 1,
        (2, 6.0): 0, (2, 7.0): 0,
    }


def test_trailing_window_agg(ray_session):
    import ray.data

    from sqlgrep_ray.stages.window import trailing_window_agg

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 2), (1, base + dt.timedelta(minutes=10), 3),
        (1, base + dt.timedelta(minutes=10), 5),  # peer tie
        (1, base + dt.timedelta(minutes=45), 7),
        (2, base + dt.timedelta(minutes=5), 11),
    ]
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "v": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    out = trailing_window_agg(
        ray.data.from_arrow(t).repartition(2),
        key="user_id", ts_col="ts", window_s=1800, sum_col="v",
    ).take_all()
    got = {(r["user_id"], r["v"]): (r["trailing_count"], r["trailing_sum"]) for r in out}
    # DuckDB RANGE-frame reference (verified): ties are peers
    assert got == {
        (1, 2): (1, 2),
        (1, 3): (3, 10),
        (1, 5): (3, 10),
        (1, 7): (1, 7),   # 45-30=15 > 10, window excludes the ties
        (2, 11): (1, 11),
    }


def test_lag_shift_vs_pandas(ray_session):
    """lag_shift == pandas groupby shift, for lag and lead, across
    arbitrary block boundaries."""
    import pandas as pd
    import ray.data

    from sqlgrep_ray.stages.window import lag_shift

    rng = np.random.RandomState(7)
    n = 500
    df = pd.DataFrame(
        {
            "k": [f"k{c:02d}" for c in rng.randint(0, 23, n)],
            "o": np.arange(n, dtype=np.int64),  # unique order key
            "v": rng.randint(-100, 100, n).astype(np.int64),
            "s": [f"s{r}" for r in rng.randint(0, 9, n)],
        }
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(7)
    for off, col in [(1, "lag1"), (3, "lag3"), (-2, "lead2")]:
        out = (
            lag_shift(ds, "k", "o", ["v", "s"], offset=off)
            .to_pandas()
            .sort_values(["k", "o"])
            .reset_index(drop=True)
        )
        ref = df.sort_values(["k", "o"]).reset_index(drop=True)
        exp_v = ref.groupby("k")["v"].shift(off)
        exp_s = ref.groupby("k")["s"].shift(off)
        got_v = out[f"v_{col}"]
        got_s = out[f"s_{col}"]
        assert got_v.isna().equals(exp_v.isna())
        assert (got_v.dropna().astype(np.int64) == exp_v.dropna().astype(np.int64)).all()
        assert got_s.fillna("<N>").tolist() == exp_s.fillna("<N>").tolist()


def test_lag_shift_zero_offset_rejected(ray_session):
    import ray.data

    from sqlgrep_ray.stages.window import lag_shift

    ds = ray.data.from_arrow(_events())
    try:
        lag_shift(ds, "user_id", "ts", ["value"], offset=0)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_reassemble_conversations_vs_naive(ray_session):
    """reassemble_conversations == sort + per-conv join, including
    single-turn convs and arbitrary block boundaries."""
    import pandas as pd
    import ray.data

    from sqlgrep_ray.stages.conversation import reassemble_conversations

    rng = np.random.RandomState(11)
    n = 400
    df = pd.DataFrame(
        {
            "conv_id": [f"c{c:03d}" for c in rng.randint(0, 60, n)],
            "turn_idx": np.arange(n, dtype=np.int64),
            "role": [["user", "assistant", "tool"][r] for r in rng.randint(0, 3, n)],
            "text": [f"msg {i}é中" for i in range(n)],  # multi-byte
        }
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(9)
    out = (
        reassemble_conversations(ds)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    ref = df.sort_values(["conv_id", "turn_idx"])
    exp = (
        ref.assign(line=ref.role + ": " + ref.text)
        .groupby("conv_id")
        .agg(n_turns=("line", "size"), doc=("line", "\n".join))
        .reset_index()
    )
    assert out["conv_id"].tolist() == exp["conv_id"].tolist()
    assert out["n_turns"].tolist() == exp["n_turns"].tolist()
    assert out["doc"].tolist() == exp["doc"].tolist()


def test_reassemble_no_role(ray_session):
    import ray.data

    from sqlgrep_ray.stages.conversation import reassemble_conversations

    t = pa.table(
        {
            "conv_id": ["a", "b", "a"],
            "turn_idx": pa.array([1, 0, 0], pa.int64()),
            "text": ["second", "only", "first"],
        }
    )
    out = (
        reassemble_conversations(
            ray.data.from_arrow(t), role_col=None, sep=" | "
        )
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert out["doc"].tolist() == ["first | second", "only"]
    assert out["n_turns"].tolist() == [2, 1]


def test_auto_buckets_wired(ray_session, monkeypatch):
    """VERDICT r3 #1: the num_buckets=None default must actually resolve
    through auto_buckets — the executed bucket count grows once the corpus
    crosses BUCKET_ROW_TARGET (shrunk here so the test stays small), and
    the result is identical to a forced fixed-64 run."""
    import ray.data

    from sqlgrep_ray.stages import window

    monkeypatch.setattr(window, "BUCKET_ROW_TARGET", 50)
    n = 20_000
    rng = np.random.default_rng(7)
    t = pa.table(
        {
            "k": pa.array((rng.integers(0, 500, n)).astype("int64")),
            "ts": pa.array(
                np.sort(rng.integers(0, 10**9, n)).astype("int64")
            ).cast(pa.timestamp("us")),
        }
    )
    ds = ray.data.from_arrow(t).repartition(8)
    window.LAST_RESOLVED_BUCKETS = None
    auto = (
        window.assign_sessions(ds, "k", "ts", gap_s=100.0)
        .to_pandas()
        .sort_values(["k", "ts"])
        .reset_index(drop=True)
    )
    resolved = window.LAST_RESOLVED_BUCKETS
    assert resolved is not None, "auto path never resolved a bucket count"
    assert resolved > window.WINDOW_BUCKETS, resolved
    assert resolved == window.auto_buckets(n)
    fixed = (
        window.assign_sessions(ds, "k", "ts", gap_s=100.0, num_buckets=64)
        .to_pandas()
        .sort_values(["k", "ts"])
        .reset_index(drop=True)
    )
    assert auto.equals(fixed)


def test_multi_window_single_shuffle(ray_session, monkeypatch):
    """VERDICT r3 #3: a 3-function query sharing one (PARTITION BY, ORDER
    BY) frame runs ONE partition_windows call (one bucket shuffle), and
    each value matches a per-function reference."""
    import ray.data

    import sqlgrep_ray.pipelines.runner as rn
    from sqlgrep_ray.pipelines.runner import run_plan
    from sqlgrep_ray.sqlfront import parse_query
    from sqlgrep_ray.stages import window

    calls = []
    real = window.partition_windows

    def spy(ds, key, order_col, funcs, **kw):
        calls.append(list(funcs))
        return real(ds, key, order_col, funcs, **kw)

    # run_select imports partition_windows from the window module at call
    # time, so patching the module attribute intercepts the runner's call
    monkeypatch.setattr(window, "partition_windows", spy)

    t = pa.table(
        {
            "k": ["a", "a", "a", "b", "b"],
            "o": pa.array([1, 2, 3, 1, 2], pa.int64()),
            "v": pa.array([10, None, 30, 5, 7], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    plan = parse_query(
        "SELECT k, o, ROW_NUMBER() OVER (PARTITION BY k ORDER BY o) AS rn, "
        "SUM(v) OVER (PARTITION BY k ORDER BY o) AS rs, "
        "LAG(v) OVER (PARTITION BY k ORDER BY o) AS pv "
        "FROM x ORDER BY k, o"
    ).plan
    out = run_plan(ds, plan).to_pandas()
    assert len(calls) == 1, f"expected 1 shared-frame shuffle, saw {len(calls)}"
    assert len(calls[0]) == 3
    assert out["rn"].tolist() == [1, 2, 3, 1, 2]
    assert out["rs"].tolist() == [10, 10, 40, 5, 12]
    assert out["pv"].tolist()[0:3] == [None, 10, None] or out[
        "pv"
    ].isna().tolist() == [True, False, True, True, False]


def _running_ref(df, keys, func):
    """Pandas reference for RANGE-frame running aggregates."""
    import pandas as pd

    df = df.sort_values([*keys, "o"], kind="stable").reset_index(drop=True)
    out = np.empty(len(df), dtype=np.float64)
    grp = df.groupby(keys, dropna=False, sort=False)
    for _, g in grp:
        v = g["v"].to_numpy(dtype=np.float64)
        nn = g["v"].notna().to_numpy()
        cs = np.cumsum(np.where(nn, np.nan_to_num(v), 0.0))
        cc = np.cumsum(nn)
        o = g["o"]
        run_change = np.r_[True, ~(o.iloc[1:].reset_index(drop=True).eq(
            o.iloc[:-1].reset_index(drop=True)) | (
            o.iloc[1:].isna().reset_index(drop=True)
            & o.iloc[:-1].isna().reset_index(drop=True))).to_numpy()]
        starts = np.flatnonzero(run_change)
        lens = np.diff(np.r_[starts, len(g)])
        run_end = np.repeat(starts + lens - 1, lens)
        s, c = cs[run_end], cc[run_end]
        if func == "sum":
            res = np.where(c > 0, s, np.nan)
        elif func == "count":
            res = c.astype(np.float64)
        else:
            res = np.where(c > 0, s / np.maximum(c, 1), np.nan)
        out[g.index.to_numpy()] = res
    df = df.copy()
    df["running"] = out
    return df


@pytest.mark.parametrize("func", ["sum", "avg", "count"])
def test_partition_running_ranged_equivalence(ray_session, func):
    """VERDICT r3 #7: the chunk-safe two-phase running aggregate matches
    partition_running bit-for-bit on a skewed corpus — one hot key far
    larger than chunk_rows, order ties (RANGE peers), NULL values, NULL
    keys, and a null-order row."""
    import pandas as pd
    import ray.data

    from sqlgrep_ray.stages.window import (
        partition_running,
        partition_running_ranged,
    )

    rng = np.random.default_rng(11)
    n_hot, n_small = 12_000, 3_000
    keys = np.r_[
        np.repeat("hot", n_hot),
        np.array([f"k{i}" for i in rng.integers(0, 50, n_small)]),
    ].astype(object)
    keys[::97] = None  # null partition keys form ONE partition
    order = rng.integers(0, 4_000, n_hot + n_small)  # dense → many ties
    vals = rng.integers(-100, 100, n_hot + n_small).astype(np.float64)
    vals[::13] = np.nan
    t = pa.table(
        {
            "k": pa.array(keys.tolist(), pa.string()),
            "o": pa.array(order, pa.int64()),
            "v": pa.array(vals),  # nan → stays nan (float col); add nulls:
        }
    )
    t = t.set_column(2, "v", pc.if_else(
        pa.array(np.isnan(vals)), pa.scalar(None, pa.float64()), pa.array(vals)
    ))
    ds = ray.data.from_arrow(t).repartition(12)
    single = (
        partition_running(ds, "k", "o", "v", func=func, out_col="running")
        .to_pandas()
        .sort_values(["k", "o", "v", "running"], na_position="last")
        .reset_index(drop=True)
    )
    ranged = (
        partition_running_ranged(
            ds, "k", "o", "v", func=func, out_col="running", chunk_rows=2_000
        )
        .to_pandas()
        .sort_values(["k", "o", "v", "running"], na_position="last")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        single[["k", "o", "v", "running"]], ranged[["k", "o", "v", "running"]]
    )
    # and both match an independent pandas reference
    ref = (
        _running_ref(t.to_pandas(), ["k"], func)
        .sort_values(["k", "o", "v", "running"], na_position="last")
        .reset_index(drop=True)
    )
    np.testing.assert_allclose(
        single["running"].to_numpy(dtype=np.float64),
        ref["running"].to_numpy(),
        rtol=1e-9, equal_nan=True,
    )


def test_partition_running_ranged_int_and_delegate(ray_session):
    """Int sums stay int64 through the ranged path; small inputs delegate
    to the one-task path."""
    import ray.data

    from sqlgrep_ray.stages.window import partition_running_ranged

    big = 2**55  # would lose precision through float64
    t = pa.table(
        {
            "k": pa.array(["a"] * 4),
            "o": pa.array([1, 2, 3, 4], pa.int64()),
            "v": pa.array([big, 1, 1, 1], pa.int64()),
        }
    )
    out = (
        partition_running_ranged(
            ray.data.from_arrow(t), "k", "o", "v", func="sum", chunk_rows=2
        )
        .to_pandas()
        .sort_values("o")
    )
    assert out["running"].tolist() == [big, big + 1, big + 2, big + 3]
    # delegation: below chunk_rows the result comes from partition_running
    out2 = (
        partition_running_ranged(
            ray.data.from_arrow(t), "k", "o", "v", func="sum", chunk_rows=100
        )
        .to_pandas()
        .sort_values("o")
    )
    assert out2["running"].tolist() == [big, big + 1, big + 2, big + 3]


def test_rows_frame_ties_multiset(ray_session):
    """ROWS frame under tied order values: each row gets its own prefix
    (tie order engine-defined), so per-partition the MULTISET of running
    counts is exactly 1..n and the final running sum equals the partition
    total — both invariant to tie order; RANGE peers share instead."""
    import ray.data

    from sqlgrep_ray.stages.window import WinFunc, partition_windows

    t = pa.table(
        {
            "k": pa.array(["a"] * 4 + ["b"] * 2),
            "o": pa.array([1, 1, 1, 2, 5, 5], pa.int64()),
            "v": pa.array([10, 20, 30, 40, 1, 2], pa.int64()),
        }
    )
    out = (
        partition_windows(
            ray.data.from_arrow(t),
            "k",
            "o",
            [
                WinFunc("run_count_star", "rcs_rows", frame="rows"),
                WinFunc("run_count_star", "rcs_range", frame="range"),
                WinFunc("run_sum", "rs_rows", value_col="v", frame="rows"),
                WinFunc("run_sum", "rs_range", value_col="v", frame="range"),
            ],
        )
        .to_pandas()
        .sort_values(["k", "o", "rcs_rows"])
    )
    a = out[out["k"] == "a"]
    assert sorted(a["rcs_rows"]) == [1, 2, 3, 4]      # per-row ordinals
    assert a["rcs_range"].tolist() == [3, 3, 3, 4]     # peers share
    assert a["rs_rows"].max() == 100 and a["rs_range"].tolist()[:3] == [60, 60, 60]
    b = out[out["k"] == "b"]
    assert sorted(b["rcs_rows"]) == [1, 2] and b["rcs_range"].tolist() == [2, 2]


def test_bounded_rows_frames_vs_duckdb(ray_session):
    """ROWS BETWEEN k PRECEDING AND CURRENT ROW for sum/avg/count(*)
    plus MIN/MAX OVER (unbounded RANGE and bounded ROWS), with NULL
    values interleaved — all six vs DuckDB on a multi-block corpus."""
    import duckdb
    import numpy as np
    import ray.data

    from sqlgrep_ray.stages.window import WinFunc, partition_windows

    rng = np.random.default_rng(11)
    n = 4000
    t = pa.table(
        {
            "k": pa.array(rng.integers(0, 30, n)),
            "o": pa.array(rng.permutation(n)),
            "v": pa.array(
                [
                    None if i % 7 == 0 else int(rng.integers(-40, 40))
                    for i in range(n)
                ],
                pa.int64(),
            ),
        }
    )
    out = partition_windows(
        ray.data.from_arrow(t).repartition(5),
        "k",
        "o",
        [
            WinFunc("run_sum", "ms", value_col="v", frame="rows", preceding=3),
            WinFunc("run_avg", "ma", value_col="v", frame="rows", preceding=3),
            WinFunc("run_count_star", "mc", frame="rows", preceding=2),
            WinFunc("run_min", "mn", value_col="v"),
            WinFunc("run_max", "mx", value_col="v"),
            WinFunc("run_max", "mxb", value_col="v", frame="rows", preceding=4),
        ],
        num_buckets=4,
    )
    df = out.to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    exp = con.execute(
        """
        SELECT k, o,
          CAST(SUM(v) OVER (PARTITION BY k ORDER BY o
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) ms,
          AVG(v) OVER (PARTITION BY k ORDER BY o
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) ma,
          CAST(COUNT(*) OVER (PARTITION BY k ORDER BY o
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) mc,
          MIN(v) OVER (PARTITION BY k ORDER BY o) mn,
          MAX(v) OVER (PARTITION BY k ORDER BY o) mx,
          MAX(v) OVER (PARTITION BY k ORDER BY o
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) mxb
        FROM t ORDER BY k, o
        """
    ).fetchdf()
    for c in ["ms", "ma", "mc", "mn", "mx", "mxb"]:
        a, b = df[c], exp[c]
        assert bool(((a.isna() & b.isna()) | (a == b)).all()), c


def test_min_max_range_frame_ties(ray_session):
    """MIN/MAX OVER the default RANGE frame share the tie-run-end value
    (peers see the same frame), matching DuckDB on tied order values."""
    import duckdb
    import ray.data

    from sqlgrep_ray.stages.window import WinFunc, partition_windows

    t = pa.table(
        {
            "k": pa.array(["a"] * 5),
            "o": pa.array([1, 1, 2, 2, 3], pa.int64()),
            "v": pa.array([5, -2, 9, 1, 0], pa.int64()),
        }
    )
    out = (
        partition_windows(
            ray.data.from_arrow(t),
            "k",
            "o",
            [
                WinFunc("run_min", "mn", value_col="v"),
                WinFunc("run_max", "mx", value_col="v"),
            ],
            num_buckets=1,
        )
        .to_pandas()
        .sort_values(["o", "v"])
    )
    # RANGE: both o=1 peers see min(5,-2)=-2, max 5; o=2 peers see 9
    assert out["mn"].tolist() == [-2, -2, -2, -2, -2]
    assert out["mx"].tolist() == [5, 5, 9, 9, 9]


def test_bounded_frame_validation(ray_session):
    import ray.data

    from sqlgrep_ray.stages.window import WinFunc, partition_windows

    t = pa.table({"k": ["a"], "o": [1], "v": [1]})
    ds = ray.data.from_arrow(t)
    with pytest.raises(ValueError, match="running aggregates"):
        partition_windows(
            ds, "k", "o",
            [WinFunc("row_number", "rn", frame="rows", preceding=2)],
        )
    # round 5: frame="range" + preceding is the legal RANGE x PRECEDING
    # form (for SUM/AVG/COUNT/COUNT(*)); "full" + preceding stays illegal
    with pytest.raises(ValueError, match="ROWS or RANGE"):
        partition_windows(
            ds, "k", "o",
            [WinFunc("run_sum", "s", value_col="v", frame="full", preceding=2)],
        )
    with pytest.raises(ValueError, match="MIN/MAX"):
        partition_windows(
            ds, "k", "o",
            [WinFunc("run_min", "s", value_col="v", preceding=2)],
        )
    with pytest.raises(ValueError, match="FOLLOWING"):
        partition_windows(
            ds, "k", "o",
            [WinFunc("run_sum", "s", value_col="v", following=2)],
        )
    with pytest.raises(ValueError, match="SUM/AVG/COUNT"):
        partition_windows(
            ds, "k", "o",
            [WinFunc("run_max", "s", value_col="v", frame="rows",
                     preceding=1, following=2)],
        )


def test_sql_bounded_frame_parses():
    from sqlgrep_ray.sqlfront import SqlError, parse_query

    plan = parse_query(
        "SELECT k, MAX(v) OVER (PARTITION BY k ORDER BY o "
        "ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS m FROM t"
    ).plan
    w = plan.windows[0]
    assert w.func == "run_max" and w.preceding == 5 and w.frame == "rows"
    # round 5: RANGE x PRECEDING parses (order-value lookback)
    w2 = parse_query(
        "SELECT k, SUM(v) OVER (PARTITION BY k ORDER BY o "
        "RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS m FROM t"
    ).plan.windows[0]
    assert w2.frame == "range" and w2.preceding == 5 and w2.following is None
    w3 = parse_query(
        "SELECT k, SUM(v) OVER (PARTITION BY k ORDER BY o "
        "ROWS BETWEEN 2 PRECEDING AND 3 FOLLOWING) AS m FROM t"
    ).plan.windows[0]
    assert w3.frame == "rows" and w3.preceding == 2 and w3.following == 3
    with pytest.raises(SqlError, match="running aggregates"):
        parse_query(
            "SELECT k, ROW_NUMBER() OVER (PARTITION BY k ORDER BY o "
            "ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS m FROM t"
        )


def test_nth_value_vs_duckdb(ray_session):
    """NTH_VALUE under the default RANGE frame (NULL until the frame
    reaches row n; ties share) and the whole-partition frame — both
    pinned against DuckDB."""
    import duckdb
    import numpy as np
    import ray.data

    from sqlgrep_ray.stages.window import WinFunc, partition_windows

    rng = np.random.default_rng(13)
    n = 3000
    t = pa.table(
        {
            "k": pa.array(rng.integers(0, 40, n)),
            "o": pa.array(rng.integers(0, 50, n)),  # real ties
            "i": pa.array(np.arange(n)),
            "v": pa.array(rng.integers(0, 1000, n).astype("float64")),
        }
    )
    # unique order key via (o, i) is NOT used: DuckDB's nth_value under
    # ties picks by its internal order, so pin on a tie-free order col
    t = t.set_column(1, "o", pa.array(rng.permutation(n)))
    out = (
        partition_windows(
            ray.data.from_arrow(t).repartition(5),
            "k",
            "o",
            [
                WinFunc("nth_value", "n3", value_col="v", param=3),
                WinFunc("nth_value", "n2f", value_col="v", param=2, frame="full"),
            ],
            num_buckets=4,
        )
        .to_pandas()
        .sort_values(["k", "o"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    exp = con.execute(
        """
        SELECT k, o,
          NTH_VALUE(v, 3) OVER (PARTITION BY k ORDER BY o) n3,
          NTH_VALUE(v, 2) OVER (PARTITION BY k ORDER BY o
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) n2f
        FROM t ORDER BY k, o
        """
    ).fetchdf()
    for c in ["n3", "n2f"]:
        a, b = out[c], exp[c]
        assert bool(((a.isna() & b.isna()) | (a == b)).all()), c


def test_nth_value_sql_parse_errors():
    from sqlgrep_ray.sqlfront import SqlError, parse_query

    w = parse_query(
        "SELECT NTH_VALUE(v, 4) OVER (PARTITION BY k ORDER BY o) AS x FROM t"
    ).plan.windows[0]
    assert w.func == "nth_value" and w.offset == 4
    with pytest.raises(SqlError, match="positive integer"):
        parse_query(
            "SELECT NTH_VALUE(v, 0) OVER (PARTITION BY k ORDER BY o) AS x "
            "FROM t"
        )


def _global_running_input(n=5000, seed=11):
    """Adversarial global-window input: heavy order-value TIES (peers),
    NULL values, NULL order values, int and float value columns."""
    rng = np.random.default_rng(seed)
    ts = rng.integers(0, 400, n).astype("int64")  # ~12 peers per value
    ts_null = rng.random(n) < 0.02
    v_int = rng.integers(-50, 50, n).astype("int64")
    v_null = rng.random(n) < 0.1
    return pa.table(
        {
            "ts": pa.array(ts, mask=ts_null),
            "vi": pa.array(v_int, mask=v_null),
            "vf": pa.array(
                rng.standard_normal(n), mask=rng.random(n) < 0.1
            ),
            "tag": pa.array(rng.integers(0, 9, n).astype("int64")),
        }
    )


def test_global_running_ranged_bit_equal(ray_session):
    """VERDICT r4 #3: the chunk-safe global path is bit-identical to the
    one-task partition_windows contract — SQL NULL handling (sum NULL over
    an all-NULL prefix), RANGE peers sharing frame-end values, NULL order
    last, COUNT(*) vs COUNT(v), int sums staying int64 — with chunking
    FORCED (chunk_rows far below the row count)."""
    import ray.data

    from sqlgrep_ray.stages import window
    from sqlgrep_ray.stages.window import WinFunc, global_running_ranged

    t = _global_running_input()
    funcs = [
        WinFunc("run_sum", "rs", value_col="vi"),
        WinFunc("run_count", "rc", value_col="vi"),
        WinFunc("run_avg", "ra", value_col="vi"),
        WinFunc("run_sum", "rsf", value_col="vf"),
        WinFunc("run_count_star", "rn"),
    ]
    ds = ray.data.from_arrow(t).repartition(8)
    window.LAST_GLOBAL_WINDOW_PATH = None
    chunked = (
        global_running_ranged(ds, "ts", funcs, chunk_rows=250)
        .to_pandas()
        .sort_values(["ts", "tag", "vi"])
        .reset_index(drop=True)
    )
    assert window.LAST_GLOBAL_WINDOW_PATH == "ranged"
    window.LAST_GLOBAL_WINDOW_PATH = None
    one = (
        global_running_ranged(ds, "ts", funcs, chunk_rows=10**9)
        .to_pandas()
        .sort_values(["ts", "tag", "vi"])
        .reset_index(drop=True)
    )
    assert window.LAST_GLOBAL_WINDOW_PATH == "one-task"
    assert list(chunked.columns) == list(one.columns)
    import pandas.testing as pdt

    pdt.assert_frame_equal(chunked, one)


def test_global_running_ranged_delegates(ray_session):
    """Non-numeric order columns and all-NULL order columns delegate to
    the one-task contract instead of erroring."""
    import ray.data

    from sqlgrep_ray.stages import window
    from sqlgrep_ray.stages.window import WinFunc, global_running_ranged

    t = pa.table(
        {
            "o": pa.array(["b", "a", "c", "a"]),
            "v": pa.array([1, 2, 3, 4], pa.int64()),
        }
    )
    window.LAST_GLOBAL_WINDOW_PATH = None
    out = (
        global_running_ranged(
            ray.data.from_arrow(t), "o",
            [WinFunc("run_sum", "rs", value_col="v")], chunk_rows=1,
        )
        .to_pandas()
        .sort_values("o")
        .reset_index(drop=True)
    )
    assert window.LAST_GLOBAL_WINDOW_PATH == "one-task"
    assert out["rs"].tolist() == [6, 6, 7, 10]  # peers on 'a' share

    t2 = pa.table(
        {
            "o": pa.array([None, None, None], pa.int64()),
            "v": pa.array([1, 2, 4], pa.int64()),
        }
    )
    window.LAST_GLOBAL_WINDOW_PATH = None
    out2 = global_running_ranged(
        ray.data.from_arrow(t2), "o",
        [WinFunc("run_sum", "rs", value_col="v")], chunk_rows=1,
    ).to_pandas()
    assert window.LAST_GLOBAL_WINDOW_PATH == "one-task"
    assert out2["rs"].tolist() == [7, 7, 7]  # one peer run


def test_sql_global_window_auto_routes(ray_session, monkeypatch):
    """The SQL runner dispatches an all-associative global frame to the
    ranged path (chunking forced via GLOBAL_RANGED_CHUNK_ROWS); a frame
    holding any order-sensitive function keeps the one-task contract.
    Values match a DuckDB oracle either way."""
    import duckdb
    import ray.data

    from sqlgrep_ray.pipelines.runner import run_plan
    from sqlgrep_ray.sqlfront import parse_query
    from sqlgrep_ray.stages import window

    t = _global_running_input(n=3000, seed=5)
    monkeypatch.setattr(window, "GLOBAL_RANGED_CHUNK_ROWS", 200)

    plan = parse_query(
        "SELECT ts, vi, SUM(vi) OVER (ORDER BY ts) AS rs, "
        "COUNT(*) OVER (ORDER BY ts) AS rn FROM t"
    ).plan
    window.LAST_GLOBAL_WINDOW_PATH = None
    got = (
        run_plan(ray.data.from_arrow(t).repartition(6), plan)
        .to_pandas()
        .sort_values(["ts", "vi", "rs"])
        .reset_index(drop=True)
    )
    assert window.LAST_GLOBAL_WINDOW_PATH == "ranged"
    want = (
        duckdb.sql(
            "SELECT ts, vi, SUM(vi) OVER (ORDER BY ts) AS rs, "
            "CAST(COUNT(*) OVER (ORDER BY ts) AS BIGINT) AS rn FROM t"
        )
        .df()
        .sort_values(["ts", "vi", "rs"])
        .reset_index(drop=True)
    )
    import pandas.testing as pdt

    pdt.assert_frame_equal(got, want, check_dtype=False)

    # order-sensitive frame: stays one-task (ranged path never fires)
    plan2 = parse_query(
        "SELECT ts, ROW_NUMBER() OVER (ORDER BY ts) AS rn2, "
        "SUM(vi) OVER (ORDER BY ts) AS rs FROM t"
    ).plan
    window.LAST_GLOBAL_WINDOW_PATH = None
    n = run_plan(ray.data.from_arrow(t), plan2).count()
    assert n == 3000
    assert window.LAST_GLOBAL_WINDOW_PATH is None


def test_time_range_window_vs_duckdb(ray_session):
    """Round-5: trailing TIME window — RANGE BETWEEN [INTERVAL] 'H:M:S'
    PRECEDING AND CURRENT ROW over a timestamp order column, with tied
    timestamps (peers) and NULL timestamps (their own peer run). Matches
    DuckDB's native INTERVAL RANGE frame."""
    import datetime

    import duckdb
    import ray.data

    from sqlgrep_ray.pipelines.runner import run_plan
    from sqlgrep_ray.sqlfront import parse_query

    rng = np.random.default_rng(13)
    n = 4000
    base = datetime.datetime(2024, 1, 1)
    secs = np.sort(rng.integers(0, 600, n))  # many ties
    ts_null = rng.random(n) < 0.01
    t = pa.table(
        {
            "k": pa.array(rng.integers(0, 40, n).astype("int64")),
            "ts": pa.array(
                secs.astype("int64") * 1_000_000, pa.timestamp("us")
            ).cast(pa.timestamp("us")),
            "v": pa.array(
                rng.integers(0, 100, n).astype("int64"),
                mask=rng.random(n) < 0.05,
            ),
        }
    )
    # punch NULL timestamps in
    tsarr = t["ts"].combine_chunks()
    t = t.set_column(
        1, "ts", pa.array(tsarr.to_pylist(), pa.timestamp("us"), mask=ts_null)
    )
    plan = parse_query(
        "SELECT k, ts, v, "
        "SUM(v) OVER (PARTITION BY k ORDER BY ts "
        "RANGE BETWEEN INTERVAL '0:0:45' PRECEDING AND CURRENT ROW) AS s, "
        "COUNT(*) OVER (PARTITION BY k ORDER BY ts "
        "RANGE BETWEEN '0:1:30' PRECEDING AND CURRENT ROW) AS c FROM t"
    ).plan
    got = (
        run_plan(ray.data.from_arrow(t).repartition(5), plan)
        .to_pandas()
        .sort_values(["k", "ts", "v"])
        .reset_index(drop=True)
    )
    want = (
        duckdb.sql(
            "SELECT k, ts, v, "
            "SUM(v) OVER (PARTITION BY k ORDER BY ts RANGE BETWEEN "
            "INTERVAL '45 seconds' PRECEDING AND CURRENT ROW) AS s, "
            "CAST(COUNT(*) OVER (PARTITION BY k ORDER BY ts RANGE BETWEEN "
            "INTERVAL '90 seconds' PRECEDING AND CURRENT ROW) AS BIGINT) AS c "
            "FROM t"
        )
        .df()
        .sort_values(["k", "ts", "v"])
        .reset_index(drop=True)
    )
    import pandas.testing as pdt

    pdt.assert_frame_equal(got, want, check_dtype=False)


def test_ignore_nulls_vs_duckdb(ray_session):
    """IGNORE NULLS navigation (LAG/LEAD k-th non-null back/forward,
    FIRST_VALUE/LAST_VALUE first/last non-null in frame) pinned against
    DuckDB on a NULL-dense column, through the SQL dialect end-to-end."""
    import duckdb
    import ray.data

    from sqlgrep_ray.pipelines.runner import run_plan
    from sqlgrep_ray.sqlfront import parse_query

    rng = np.random.default_rng(7)
    n = 4000
    t = pa.table(
        {
            "k": pa.array(rng.integers(0, 30, n).astype("int64")),
            "o": pa.array(rng.permutation(n).astype("int64")),
            "v": pa.array(
                rng.integers(0, 1000, n).astype("int64"),
                mask=rng.random(n) < 0.4,  # 40% NULLs
            ),
        }
    )
    plan = parse_query(
        "SELECT k, o, v, "
        "LAG(v, 2) IGNORE NULLS OVER (PARTITION BY k ORDER BY o) AS l2, "
        "LAG(v, 1, -1) IGNORE NULLS OVER (PARTITION BY k ORDER BY o) AS l1d, "
        "LEAD(v) IGNORE NULLS OVER (PARTITION BY k ORDER BY o) AS ld1, "
        "FIRST_VALUE(v) IGNORE NULLS OVER (PARTITION BY k ORDER BY o) AS fv, "
        "LAST_VALUE(v) IGNORE NULLS OVER (PARTITION BY k ORDER BY o) AS lv, "
        "LAST_VALUE(v) IGNORE NULLS OVER (PARTITION BY k ORDER BY o "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lvf, "
        "LAG(v) RESPECT NULLS OVER (PARTITION BY k ORDER BY o) AS lr "
        "FROM t"
    ).plan
    got = (
        run_plan(ray.data.from_arrow(t).repartition(5), plan)
        .to_pandas()
        .sort_values(["k", "o"])
        .reset_index(drop=True)
    )
    want = (
        duckdb.sql(
            "SELECT k, o, v, "
            "LAG(v, 2 IGNORE NULLS) OVER (PARTITION BY k ORDER BY o) AS l2, "
            "LAG(v, 1, -1 IGNORE NULLS) OVER (PARTITION BY k ORDER BY o) AS l1d, "
            "LEAD(v, 1 IGNORE NULLS) OVER (PARTITION BY k ORDER BY o) AS ld1, "
            "FIRST_VALUE(v IGNORE NULLS) OVER (PARTITION BY k ORDER BY o) AS fv, "
            "LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY k ORDER BY o) AS lv, "
            "LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY k ORDER BY o "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lvf, "
            "LAG(v) OVER (PARTITION BY k ORDER BY o) AS lr "
            "FROM t"
        )
        .df()
        .sort_values(["k", "o"])
        .reset_index(drop=True)
    )
    import pandas.testing as pdt

    pdt.assert_frame_equal(got, want, check_dtype=False)


def test_ignore_nulls_all_null_partition(ray_session):
    """Partitions whose value column is ALL NULL (and an all-NULL bucket)
    yield NULL everywhere — the nn_pos-empty guard path."""
    import ray.data

    from sqlgrep_ray.pipelines.runner import run_plan
    from sqlgrep_ray.sqlfront import parse_query

    t = pa.table(
        {
            "k": pa.array([1, 1, 1, 2, 2], pa.int64()),
            "o": pa.array([1, 2, 3, 1, 2], pa.int64()),
            "v": pa.array([None, None, None, 10, None], pa.int64()),
        }
    )
    plan = parse_query(
        "SELECT k, o, "
        "LAG(v) IGNORE NULLS OVER (PARTITION BY k ORDER BY o) AS l, "
        "FIRST_VALUE(v) IGNORE NULLS OVER (PARTITION BY k ORDER BY o) AS fv "
        "FROM t"
    ).plan
    rows = {
        (r["k"], r["o"]): (r["l"], r["fv"])
        for r in run_plan(ray.data.from_arrow(t), plan).take_all()
    }
    assert rows == {
        (1, 1): (None, None),
        (1, 2): (None, None),
        (1, 3): (None, None),
        (2, 1): (None, 10),
        (2, 2): (10, 10),
    }


def test_ignore_nulls_parse_errors():
    from sqlgrep_ray.sqlfront import SqlError, parse_query

    with pytest.raises(SqlError, match="IGNORE NULLS applies"):
        parse_query(
            "SELECT ROW_NUMBER() IGNORE NULLS OVER "
            "(PARTITION BY k ORDER BY o) AS r FROM t"
        )
    w = parse_query(
        "SELECT LEAD(v) IGNORE NULLS OVER (PARTITION BY k ORDER BY o) AS x "
        "FROM t"
    ).plan.windows[0]
    assert w.ignore_nulls and w.func == "lead"


def test_window_order_desc_composite_vs_duckdb(ray_session):
    """DESC and composite OVER(ORDER BY …) (round-5 extension): ranking,
    navigation, running aggregates and IGNORE NULLS all pinned against
    DuckDB, including NULL order keys (both engines default NULLS LAST
    in either direction)."""
    import duckdb
    import ray.data

    from sqlgrep_ray.pipelines.runner import run_plan
    from sqlgrep_ray.sqlfront import parse_query

    rng = np.random.default_rng(23)
    n = 4000
    t = pa.table(
        {
            "k": pa.array(rng.integers(0, 20, n).astype("int64")),
            "o1": pa.array(
                rng.integers(0, 30, n).astype("int64"),
                mask=rng.random(n) < 0.04,  # NULL order keys
            ),
            "o2": pa.array(rng.permutation(n).astype("int64")),
            "v": pa.array(
                rng.integers(0, 100, n).astype("int64"),
                mask=rng.random(n) < 0.2,
            ),
        }
    )
    sql_mine = (
        "SELECT k, o1, o2, "
        "ROW_NUMBER() OVER (PARTITION BY k ORDER BY o1 DESC, o2) AS rn, "
        "DENSE_RANK() OVER (PARTITION BY k ORDER BY o1 DESC) AS dr, "
        "LAG(v, 2) OVER (PARTITION BY k ORDER BY o1 DESC, o2) AS l2, "
        "LEAD(v) IGNORE NULLS OVER (PARTITION BY k ORDER BY o1 DESC, o2) "
        "AS ldn, "
        "SUM(v) OVER (PARTITION BY k ORDER BY o1 DESC) AS rs, "
        "LAST_VALUE(v) OVER (PARTITION BY k ORDER BY o1 DESC, o2 DESC "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lvf "
        "FROM t"
    )
    sql_duck = sql_mine.replace(
        "LEAD(v) IGNORE NULLS", "LEAD(v, 1 IGNORE NULLS)"
    )
    got = (
        run_plan(ray.data.from_arrow(t).repartition(5),
                 parse_query(sql_mine).plan)
        .to_pandas()
        .sort_values(["k", "o2"])
        .reset_index(drop=True)
    )
    want = (
        duckdb.sql(sql_duck)
        .df()
        .sort_values(["k", "o2"])
        .reset_index(drop=True)[got.columns]
    )
    import pandas.testing as pdt

    pdt.assert_frame_equal(got, want, check_dtype=False)


def test_window_order_desc_range_frame_rejected(ray_session):
    """Value-based RANGE frames need a single ascending order column."""
    import ray.data

    from sqlgrep_ray.stages.window import WinFunc, partition_windows

    t = pa.table({"k": [1, 1], "o": [1, 2], "v": [3, 4]})
    with pytest.raises(ValueError, match="single ascending"):
        partition_windows(
            ray.data.from_arrow(t),
            "k",
            [("o", True)],
            [WinFunc("run_sum", "s", value_col="v", frame="range",
                     preceding=4)],
            num_buckets=1,
        )


def test_window_order_nulls_placement_vs_duckdb(ray_session):
    """NULLS FIRST/LAST in OVER(ORDER BY …) (round-5 extension): per-key
    placement rides 0/1 validity markers in the bucket sort (pyarrow's
    null_placement is global); default stays NULLS LAST either
    direction."""
    import duckdb
    import ray.data

    from sqlgrep_ray.pipelines.runner import run_plan
    from sqlgrep_ray.sqlfront import parse_query

    rng = np.random.default_rng(12)
    n = 3000
    t = pa.table(
        {
            "k": pa.array(rng.integers(0, 15, n).astype("int64")),
            "o": pa.array(
                rng.permutation(n).astype("int64"),
                mask=rng.random(n) < 0.08,
            ),
            "i": pa.array(np.arange(n)),
            "v": pa.array(rng.integers(0, 100, n).astype("int64")),
        }
    )
    sql = (
        "SELECT k, i, "
        "ROW_NUMBER() OVER (PARTITION BY k ORDER BY o NULLS FIRST, i) AS rn, "
        "SUM(v) OVER (PARTITION BY k ORDER BY o DESC NULLS FIRST, i) AS rs, "
        "LAG(v) OVER (PARTITION BY k ORDER BY o NULLS LAST, i) AS lv FROM t"
    )
    got = (
        run_plan(ray.data.from_arrow(t).repartition(5),
                 parse_query(sql).plan)
        .to_pandas()
        .sort_values(["k", "i"])
        .reset_index(drop=True)
    )
    want = (
        duckdb.sql(sql).df().sort_values(["k", "i"]).reset_index(drop=True)[
            got.columns
        ]
    )
    import pandas.testing as pdt

    pdt.assert_frame_equal(got, want, check_dtype=False)
    # explicit NULLS on a value-based RANGE frame still rejects
    from sqlgrep_ray.stages.window import WinFunc, partition_windows

    with pytest.raises(ValueError, match="single ascending"):
        partition_windows(
            ray.data.from_arrow(t),
            "k",
            [("o", False, True)],
            [WinFunc("run_sum", "s", value_col="v", frame="range",
                     preceding=4)],
            num_buckets=1,
        )
