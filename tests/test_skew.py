"""Skew mitigation: salted/two-stage aggregation on hot keys."""

import numpy as np
import pyarrow as pa

from sqlgrep_ray.stages.skew import salted_array_agg, salted_count_distinct


def _hot_table():
    # one hot key owning 80% of rows, many cold keys
    rng = np.random.RandomState(3)
    n = 5000
    keys = np.where(rng.rand(n) < 0.8, "hot", None)
    cold = np.array([f"cold-{i:03d}" for i in rng.randint(0, 50, n)])
    keys = np.where(keys == "hot", "hot", cold)
    vals = rng.randint(0, 40, n)
    return pa.table(
        {
            "k": pa.array(keys.astype(str), pa.string()),
            "v": pa.array(vals, pa.int64()),
        }
    )


def test_salted_count_distinct(ray_session):
    import ray.data

    t = _hot_table()
    out = (
        salted_count_distinct(
            ray.data.from_arrow(t).repartition(8), ["k"], "v", alias="dv"
        )
        .to_pandas()
        .set_index("k")["dv"]
        .to_dict()
    )
    df = t.to_pandas()
    expect = df.groupby("k")["v"].nunique().to_dict()
    assert out == expect


def test_salted_array_agg(ray_session):
    import ray.data

    t = _hot_table()
    out = salted_array_agg(
        ray.data.from_arrow(t).repartition(8), ["k"], "v", alias="vs", salt=8
    ).to_pandas()
    got = {r["k"]: list(r["vs"]) for _, r in out.iterrows()}
    df = t.to_pandas()
    expect = {k: sorted(g["v"].tolist()) for k, g in df.groupby("k")}
    assert got == expect
    assert len(got["hot"]) > 3500  # the hot key really is hot
