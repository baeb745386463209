"""Empty-input robustness: every operator must handle a zero-row corpus
without crashing (the ADVICE-r2 HLL IndexError class of bug). An empty
dataset is what a filter chain legitimately produces on a shard with no
matches — operators sit mid-pipeline and cannot assume rows exist."""

import numpy as np
import pyarrow as pa
import pytest


def _empty_docs():
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
            }
        )
    )


def _empty_vecs(d=8):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array([], pa.float32()), d
                ),
            }
        )
    )


def test_dedup_family_empty(ray_session):
    from sqlgrep_ray.stages import dedup as dd

    assert dd.minhash_lsh_dedup(_empty_docs()).count() == 0
    assert dd.simhash_dedup(_empty_docs()).count() == 0
    assert dd.exact_dedup(_empty_docs(), key="text", id_col="doc_id").count() == 0
    assert (
        dd.embedding_dup_pairs(
            _empty_vecs(), id_col="vec_id", emb_col="embedding", bits=5
        ).count()
        == 0
    )


def test_text_ops_empty(ray_session):
    from sqlgrep_ray.stages.repetition import repetition_stats
    from sqlgrep_ray.stages.segdedup import segment_dedup
    from sqlgrep_ray.stages.textdup import duplicate_ngram_stats
    from sqlgrep_ray.stages.vocab import token_frequencies, top_tokens

    assert repetition_stats(_empty_docs()).count() == 0
    assert segment_dedup(_empty_docs()).count() == 0
    assert duplicate_ngram_stats(_empty_docs()).count() == 0
    assert token_frequencies(_empty_docs()).count() == 0
    assert top_tokens(_empty_docs(), 5).count() == 0


def test_sketch_cc_empty(ray_session):
    from sqlgrep_ray.stages.cc import connected_components
    from sqlgrep_ray.stages.sketch import approx_count_distinct

    assert approx_count_distinct(_empty_docs(), "text") == 0
    edges = _empty_docs().map_batches(
        lambda t: pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
        ),
        batch_format="pyarrow",
    )
    assert connected_components(edges).count() == 0


def test_windows_sample_empty(ray_session):
    from sqlgrep_ray.stages.sample import hash_sample
    from sqlgrep_ray.stages.topk import grouped_topk
    import ray.data

    assert hash_sample(_empty_docs(), "doc_id", 0.5).count() == 0
    t = pa.table(
        {
            "g": pa.array([], pa.string()),
            "score": pa.array([], pa.int64()),
            "id": pa.array([], pa.int64()),
        }
    )
    assert (
        grouped_topk(
            ray.data.from_arrow(t), keys=["g"], score_col="score",
            tie_col="id", k=3,
        ).count()
        == 0
    )


def test_lag_reassemble_kll_empty(ray_session):
    import ray.data

    from sqlgrep_ray.stages.conversation import reassemble_conversations
    from sqlgrep_ray.stages.sketch import approx_quantiles
    from sqlgrep_ray.stages.window import lag_shift

    empty_turns = ray.data.from_arrow(
        pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "turn_idx": pa.array([], pa.int64()),
                "role": pa.array([], pa.string()),
                "text": pa.array([], pa.string()),
            }
        )
    )
    assert lag_shift(empty_turns, "conv_id", "turn_idx", ["text"]).count() == 0
    assert reassemble_conversations(empty_turns).count() == 0
    assert approx_quantiles(_empty_docs(), "doc_id") == []


def test_bloom_cms_setops_empty(ray_session):
    import ray.data

    from sqlgrep_ray.api import run_sql
    from sqlgrep_ray.stages.bloom import bloom_semi_join
    from sqlgrep_ray.stages.sketch import count_min_counts
    from sqlgrep_ray.stages.window import WinFunc, partition_windows

    empty = ray.data.from_arrow(
        pa.table({"x": pa.array([], pa.int64()), "t": pa.array([], pa.string())})
    )
    keys = ray.data.from_arrow(pa.table({"x": pa.array([1, 2], pa.int64())}))
    # empty corpus through both bloom directions
    assert bloom_semi_join(empty, keys, "x").count() == 0
    assert bloom_semi_join(empty, keys, "x", keep=False).count() == 0
    # CMS over nothing: all queried counts zero
    assert count_min_counts(empty, "t", ["a", "b"])["n"].to_pylist() == [0, 0]
    # bounded-frame windows over nothing
    assert (
        partition_windows(
            empty, "t", "x",
            [WinFunc("run_max", "m", value_col="x", frame="rows", preceding=2)],
            num_buckets=2,
        ).count()
        == 0
    )
    # UNION of two empty selects, WITH over empty
    assert run_sql("SELECT x FROM a UNION ALL SELECT x FROM a", empty).count() == 0
    assert (
        run_sql(
            "WITH c AS (SELECT x FROM a WHERE x > 0) SELECT x FROM c",
            {"a": empty},
        ).count()
        == 0
    )


def test_round5_features_empty(ray_session, tmp_path):
    """Round-5 additions over ZERO rows: stats/distinct aggregates
    (global group parity: empty ⇒ zero rows), derived tables, multi-join
    chains, CROSS JOIN, expression windows, RANGE FOLLOWING frames, and
    a pushed-down scan of an empty parquet file."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from sqlgrep_ray.api import run_sql

    et = pa.table(
        {
            "k": pa.array([], pa.string()),
            "x": pa.array([], pa.int64()),
            "y": pa.array([], pa.int64()),
        }
    )
    empty = ray.data.from_arrow(et)
    src = {"t": empty, "u": empty}
    # global stats aggregate: zero rows (reference global-group parity)
    assert run_sql(
        "SELECT corr(x, y) AS r, var_samp(x) AS v, SUM(DISTINCT x) AS s "
        "FROM t", src,
    ).count() == 0
    # grouped: zero groups
    assert run_sql(
        "SELECT k, covar_pop(x, y) AS c FROM t GROUP BY k", src
    ).count() == 0
    # derived + chain + cross over empties
    assert run_sql(
        "SELECT d.k AS k FROM (SELECT k, x FROM t) d "
        "JOIN u ON d.x = u.x CROSS JOIN u", src,
    ).count() == 0
    # expression window + RANGE FOLLOWING over nothing
    assert run_sql(
        "SELECT SUM(x * 2) OVER (PARTITION BY k ORDER BY mod(x, 3) "
        "RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS s FROM t", src,
    ).count() == 0
    # pushdown over an empty parquet file
    p = str(tmp_path / "e.parquet")
    pq.write_table(et, p)
    assert run_sql(
        "SELECT k FROM t WHERE x > 5 AND k IN ('a')", {"t": p}
    ).count() == 0
