"""Follow/tail mode (state/follow.py) — the batch substitute for sqlgrep -f
(``executor.rs:175-234``): poll for new shards, exactly-once chunk runs,
incremental aggregate snapshot re-render equal to a full recompute."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sqlgrep_ray.functions.exprs import Col
from sqlgrep_ray.pipelines.plan import AggItem, AggregatePlan, GroupKey
from sqlgrep_ray.state.follow import FollowRun

PLAN = AggregatePlan(
    group_by=(GroupKey("k", Col("k")),),
    aggs=(
        AggItem("n", "count_star"),
        AggItem("s", "sum", Col("v")),
        AggItem("mx", "max", Col("v")),
    ),
)


def _write_shard(input_dir: str, i: int, rows: int = 200) -> None:
    rng = np.random.RandomState(i)
    t = pa.table(
        {
            "k": pa.array((rng.randint(0, 7, rows)).astype("int64")),
            "v": pa.array((rng.randint(0, 1000, rows)).astype("int64")),
        }
    )
    pq.write_table(t, os.path.join(input_dir, f"shard-{i:04d}.parquet"))


def _full_recompute(input_dir: str) -> pd.DataFrame:
    frames = [
        pq.read_table(os.path.join(input_dir, f)).to_pandas()
        for f in sorted(os.listdir(input_dir))
        if f.endswith(".parquet")
    ]
    df = pd.concat(frames)
    out = (
        df.groupby("k")
        .agg(n=("v", "size"), s=("v", "sum"), mx=("v", "max"))
        .reset_index()
        .sort_values("k")
        .reset_index(drop=True)
    )
    return out


def _norm(t: pa.Table) -> pd.DataFrame:
    return t.to_pandas().sort_values("k").reset_index(drop=True)


def test_follow_incremental_snapshot_equals_full_recompute(ray_session, tmp_path):
    input_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    os.makedirs(input_dir)
    for i in range(3):
        _write_shard(input_dir, i)

    fr = FollowRun(input_dir, out_dir, PLAN)
    snap = fr.poll_once()
    assert snap is not None
    pd.testing.assert_frame_equal(_norm(snap), _full_recompute(input_dir), check_dtype=False)

    # nothing new → no re-render (reference only redraws on input)
    assert fr.poll_once() is None

    # append shards mid-run → refreshed snapshot == full recompute oracle
    for i in (3, 4):
        _write_shard(input_dir, i)
    snap2 = fr.poll_once()
    assert snap2 is not None
    pd.testing.assert_frame_equal(_norm(snap2), _full_recompute(input_dir), check_dtype=False)

    # exactly-once: every chunk has a manifest, one per shard
    manifests = os.listdir(os.path.join(out_dir, "_manifest"))
    assert len([m for m in manifests if m.endswith(".json")]) == 5


def test_follow_resume_skips_processed_chunks(ray_session, tmp_path):
    input_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    os.makedirs(input_dir)
    for i in range(4):
        _write_shard(input_dir, i)

    fr = FollowRun(input_dir, out_dir, PLAN)
    fr.poll_once()

    # a fresh FollowRun (simulated restart) rebuilds its snapshot from the
    # checkpointed OUTPUT without reprocessing any input chunk
    fr2 = FollowRun(input_dir, out_dir, PLAN)
    results = fr2.ckpt.run()
    assert all(r.skipped for r in results)
    snap = fr2.poll_once()
    pd.testing.assert_frame_equal(_norm(snap), _full_recompute(input_dir), check_dtype=False)


def test_follow_generator_rounds(ray_session, tmp_path):
    input_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    os.makedirs(input_dir)
    _write_shard(input_dir, 0)
    fr = FollowRun(input_dir, out_dir, PLAN)
    snaps = list(fr.follow(poll_interval=0.01, max_rounds=3))
    assert len(snaps) == 1  # one round saw data, two idle
    pd.testing.assert_frame_equal(_norm(snaps[0]), _full_recompute(input_dir), check_dtype=False)
