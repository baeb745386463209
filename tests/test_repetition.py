"""repetition_stats: exact-equivalence to a naive per-row reference."""

import numpy as np
import pyarrow as pa

from sqlgrep_ray.stages.repetition import repetition_stats


def _naive(text: str) -> tuple[int, int, int, int, int]:
    toks = text.split()
    n = len(toks)
    if n == 0:
        return (0, 0, 0, 0, 0)
    from collections import Counter

    c = Counter(toks)
    pairs = list(zip(toks, toks[1:]))
    return (n, len(c), max(c.values()), len(pairs), len(set(pairs)))


def test_repetition_stats_matches_naive(ray_session):
    import ray.data

    rng = np.random.RandomState(5)
    words = [f"w{i}" for i in range(12)]
    texts = [" ".join(rng.choice(words, rng.randint(1, 40))) for _ in range(200)]
    texts += [
        "",  # empty
        "solo",  # single token
        "a a a a a",  # all-identical
        "a b a b a b",  # alternating (1 distinct 2-gram pair each way)
        "x y z x y z x y",  # period-3 repeat
    ]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = (
        repetition_stats(ray.data.from_arrow(t))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, text in enumerate(texts):
        n, d, m, n2, d2 = _naive(text)
        row = out.iloc[i]
        assert row["n_tokens"] == n, (i, text)
        assert row["n_distinct_tokens"] == d, (i, text)
        assert row["max_token_count"] == m, (i, text)
        assert row["n_2grams"] == n2, (i, text)
        assert row["n_distinct_2grams"] == d2, (i, text)


def test_repetition_stats_multiblock(ray_session):
    """Block boundaries must not change per-doc stats (stage is per-row)."""
    import ray.data

    texts = ["p q p q r"] * 50
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(50, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )
    one = repetition_stats(ray.data.from_arrow(t)).to_pandas()
    many = repetition_stats(
        ray.data.from_arrow(t).repartition(7)
    ).to_pandas()
    key = lambda df: df.sort_values("doc_id").reset_index(drop=True)
    assert key(one).equals(key(many))
