"""Round-2 additions: decontamination, vocabulary, PII scrub, HLL sketch,
k-means clustering, TextStats integer counts."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest


def _docs(rows):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(rows)), pa.int64()),
                "text": pa.array(rows, pa.string()),
            }
        )
    )


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------


def test_decontaminate_flags_overlap(ray_session):
    from sqlgrep_ray.stages.decontam import decontaminate

    corpus = _docs(
        [
            "alpha beta gamma delta epsilon zeta",  # contains benchmark 4-gram
            "one two three four five six seven",  # clean
            "Alpha Beta GAMMA delta end here",  # case-insensitive hit
            "tiny doc",  # < k tokens, clean
            "beta gamma",  # < k tokens -> whole-seq gram, no match
            "",  # empty: excluded from output
        ]
    )
    bench = ["xx alpha beta gamma delta yy", "unrelated text entirely here now"]
    out = {
        r["doc_id"]: r
        for r in decontaminate(corpus, bench, k=4).take_all()
    }
    assert set(out) == {0, 1, 2, 3, 4}  # empty doc dropped
    assert out[0]["contaminated"] and out[0]["n_hits"] == 1
    assert out[0]["total_grams"] == 3
    assert not out[1]["contaminated"]
    assert out[2]["contaminated"]  # lowercased match
    assert out[3] == {
        "doc_id": 3,
        "total_grams": 1,
        "n_hits": 0,
        "contaminated": False,
    }
    assert not out[4]["contaminated"]


def test_decontaminate_short_benchmark_gram(ray_session):
    from sqlgrep_ray.stages.decontam import decontaminate

    # a short benchmark doc contributes its whole sequence as one gram;
    # only an equally short corpus doc with the same tokens can hit it
    corpus = _docs(["beta gamma", "beta gamma delta more words here"])
    out = {
        r["doc_id"]: r
        for r in decontaminate(corpus, ["beta  gamma"], k=4).take_all()
    }
    assert out[0]["contaminated"]
    assert not out[1]["contaminated"]


# ---------------------------------------------------------------------------
# vocabulary
# ---------------------------------------------------------------------------


def test_token_frequencies_and_top(ray_session):
    from sqlgrep_ray.stages.vocab import token_frequencies, top_tokens

    corpus = _docs(["a b a c", "A  b\n a", "c c", None if False else ""])
    freqs = {
        r["token"]: r["count"]
        for r in token_frequencies(corpus).take_all()
    }
    assert freqs == {"a": 4, "b": 2, "c": 3}
    top = top_tokens(corpus, 2).take_all()
    assert [(r["token"], r["count"]) for r in top] == [("a", 4), ("c", 3)]


def test_top_tokens_tiebreak(ray_session):
    from sqlgrep_ray.stages.vocab import top_tokens

    corpus = _docs(["z y x", "z y x"])
    top = top_tokens(corpus, 2).take_all()
    # equal counts -> ascending token order decides
    assert [r["token"] for r in top] == ["x", "y"]


# ---------------------------------------------------------------------------
# PII scrub
# ---------------------------------------------------------------------------


def test_scrub_pii(ray_session):
    from sqlgrep_ray.stages.scrub import scrub_pii

    corpus = _docs(
        [
            "mail me at bob.smith+x@example.co.uk today",
            "server 10.0.255.1 and http://ex.org/a?b=c#d down",
            "nothing here",
            "https://u:p@host.com/x and alice@test.org and 1.2.3.4",
        ]
    )
    rows = sorted(
        scrub_pii(corpus, keep_text=True).take_all(), key=lambda r: r["doc_id"]
    )
    assert rows[0]["n_emails"] == 1 and rows[0]["redacted"] == "mail me at <EMAIL> today"
    assert rows[1]["n_ips"] == 1 and rows[1]["n_urls"] == 1
    assert rows[1]["redacted"] == "server <IP> and <URL> down"
    assert rows[2]["redacted"] == "nothing here"
    # URL redacted FIRST, so the email inside it never counts
    assert rows[3]["n_urls"] == 1 and rows[3]["n_emails"] == 1
    assert rows[3]["redacted"] == "<URL> and <EMAIL> and <IP>"
    assert "text" in rows[0]  # keep_text


def test_scrub_drops_text_by_default(ray_session):
    from sqlgrep_ray.stages.scrub import scrub_pii

    out = scrub_pii(_docs(["a@b.co"])).take_all()[0]
    assert "text" not in out and out["redacted"] == "<EMAIL>"


# ---------------------------------------------------------------------------
# HLL sketch
# ---------------------------------------------------------------------------


def test_hll_accuracy_int(ray_session):
    import ray.data

    from sqlgrep_ray.stages.sketch import approx_count_distinct, hll_error_bound

    n_distinct = 50_000
    vals = np.arange(n_distinct, dtype=np.int64) % n_distinct
    ds = ray.data.from_arrow(
        pa.table({"v": pa.array(np.concatenate([vals, vals[:10_000]]))})
    )
    est = approx_count_distinct(ds, "v", p=14)
    assert abs(est - n_distinct) / n_distinct < 4 * hll_error_bound(14)


def test_hll_strings_and_small_range(ray_session):
    import ray.data

    from sqlgrep_ray.stages.sketch import approx_count_distinct

    ds = ray.data.from_arrow(
        pa.table({"s": pa.array([f"user-{i % 37}" for i in range(5000)])})
    )
    # linear-counting regime: tiny cardinalities come back exact
    assert approx_count_distinct(ds, "s", p=14) == 37


def test_hll_sparse_regime_exact(ray_session):
    """Below 2^p/4 distinct values the HLL++ sparse path returns EXACT
    counts (the oracle contract for approx_distinct_users): many blocks,
    awkward cardinality, still bit-exact."""
    import ray.data

    from sqlgrep_ray.stages.sketch import approx_count_distinct

    n_distinct = 3777  # < 2^14/4 = 4096, prime-ish, not a block multiple
    vals = np.arange(30_000, dtype=np.int64) % n_distinct
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals)})).repartition(13)
    assert approx_count_distinct(ds, "v", p=14) == n_distinct


def test_hll_sparse_dense_merge_consistent(ray_session):
    """Crossing the sparse ceiling mid-merge (some blocks sparse, some
    dense) must agree with the all-dense estimate within the p-bound."""
    import ray.data

    from sqlgrep_ray.stages.sketch import approx_count_distinct, hll_error_bound

    rng = np.random.RandomState(7)
    # one fat block (dense partial) + many skinny ones (sparse partials)
    fat = rng.randint(0, 30_000, 60_000).astype(np.int64)
    skinny = np.arange(30_000, 31_000, dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table({"v": pa.array(np.concatenate([fat, skinny]))})
    ).repartition(2)
    exact = len(np.unique(np.concatenate([fat, skinny])))
    est = approx_count_distinct(ds, "v", p=14)
    assert abs(est - exact) / exact < 4 * hll_error_bound(14)


def test_hll_ignores_nulls(ray_session):
    import ray.data

    from sqlgrep_ray.stages.sketch import approx_count_distinct

    ds = ray.data.from_arrow(
        pa.table({"v": pa.array([1, None, 2, None, 1], pa.int64())})
    )
    assert approx_count_distinct(ds, "v") == 2


# ---------------------------------------------------------------------------
# k-means
# ---------------------------------------------------------------------------


def test_kmeans_recovers_planted_clusters(ray_session):
    import ray.data

    from sqlgrep_ray.stages.cluster import kmeans

    rng = np.random.default_rng(7)
    centers = np.array([[10.0, 0.0], [-10.0, 0.0], [0.0, 10.0]])
    pts = np.concatenate(
        [c + rng.normal(0, 0.5, size=(40, 2)) for c in centers]
    )
    labels = np.repeat(np.arange(3), 40)
    order = rng.permutation(len(pts))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(len(pts)), pa.int64()),
                "embedding": pa.array(list(pts[order].astype(np.float32))),
                "label": pa.array(labels[order], pa.int64()),
            }
        )
    )
    out, cents = kmeans(ds, k=3, n_iter=8)
    rows = out.take_all()
    assert cents.shape == (3, 2)
    # purity: every predicted cluster maps to one true label
    from collections import Counter, defaultdict

    by_cluster = defaultdict(list)
    for r in rows:
        by_cluster[r["cluster_id"]].append(r["label"])
    purity = sum(Counter(v).most_common(1)[0][1] for v in by_cluster.values())
    assert purity == len(pts)
    assert len(by_cluster) == 3


def test_kmeans_needs_enough_rows(ray_session):
    import ray.data

    from sqlgrep_ray.stages.cluster import kmeans

    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([1, 2], pa.int64()),
                "embedding": pa.array([[1.0, 0.0], [0.0, 1.0]]),
            }
        )
    )
    with pytest.raises(ValueError):
        kmeans(ds, k=5, n_iter=1)


# ---------------------------------------------------------------------------
# TextStats integer counts
# ---------------------------------------------------------------------------


def test_textstats_counts_columns(ray_session):
    from sqlgrep_ray.stages.textstats import text_stats

    corpus = _docs(["Héllo, wörld! 42 ok", "", "the cat and the hat."])
    rows = sorted(
        text_stats(
            corpus, tokens=True, quality=False, language=False,
            fingerprint=False, counts=True,
        ).take_all(),
        key=lambda r: r["doc_id"],
    )
    r0 = rows[0]
    assert (r0["n_chars"], r0["n_non_alpha"], r0["n_punct"]) == (19, 4, 2)
    assert rows[1]["n_chars"] == 0
    r2 = rows[2]
    assert r2["n_stopwords"] == 3  # the, and, the ("hat." strips to hat)
    assert r2["n_tokens_ws"] == 5


def test_kmeans_seeding_never_sorts(ray_session, monkeypatch):
    """Seed selection is a per-block min-k combine, not a corpus-wide
    ds.sort — the round-2 full shuffle for k seed rows is gone. Seeds are
    deterministic under any block layout: same centroids from a 1-block
    and an 8-block copy of the same (shuffled) data."""
    import ray.data

    from sqlgrep_ray.stages.cluster import kmeans

    monkeypatch.setattr(
        ray.data.Dataset,
        "sort",
        lambda self, *a, **k: (_ for _ in ()).throw(
            AssertionError("kmeans must not sort the corpus")
        ),
    )
    rng = np.random.default_rng(11)
    pts = rng.normal(size=(64, 4)).astype(np.float32)
    order = rng.permutation(64)
    t = pa.table(
        {
            "vec_id": pa.array(order.astype(np.int64)),
            "embedding": pa.array(list(pts[order])),
        }
    )
    _, c1 = kmeans(ray.data.from_arrow(t), k=4, n_iter=2)
    _, c8 = kmeans(ray.data.from_arrow(t).repartition(8), k=4, n_iter=2)
    np.testing.assert_allclose(c1, c8)
