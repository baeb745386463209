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


def test_grouped_topk_nullable_int_keys_block_stable(ray_session):
    """Regression: an int64 group key with SOME null rows used to hash
    differently in blocks with vs without nulls (to_pandas dtype flip),
    splitting a group across top-k bucket tasks and duplicating it in the
    output. One output run per key, exact top-k."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from sqlgrep_ray.stages.topk import grouped_topk

    n = 300
    # key 7 appears in every block; one block also carries the null keys
    keys = [7 if i % 3 else 13 for i in range(n)]
    keys[:5] = [None] * 5
    t = pa.table(
        {
            "g": pa.array(keys, pa.int64()),
            "s": pa.array(np.arange(n, dtype=np.int64)),
            "id": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    ds = ray.data.from_arrow(t).repartition(6)
    out = grouped_topk(
        ds, keys=["g"], score_col="s", tie_col="id", k=2, distributed=True
    ).take_all()
    by_key: dict = {}
    for r in out:
        by_key.setdefault(r["g"], []).append(r["s"])
    # exactly one entry per key, holding the true top-2 scores
    expect = {}
    for kv in (7, 13, None):
        scores = [s for kk, s in zip(keys, range(n)) if kk == kv]
        expect[kv] = sorted(scores, reverse=True)[:2]
    assert {k: sorted(v, reverse=True) for k, v in by_key.items()} == expect
