"""Inverted text index (stages/index.py)."""

import pyarrow as pa


def _docs():
    import ray.data

    texts = [
        "spark hash window",
        "hash hash join",   # 'hash' repeats -> single posting
        "Window SPARK",     # case folds
        "",
        "join scan",
    ]
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def test_build_inverted_index(ray_session):
    from sqlgrep_ray.stages.index import build_inverted_index

    idx = {
        r["token"]: r
        for r in build_inverted_index(_docs()).take_all()
    }
    assert list(idx["hash"]["postings"]) == [0, 1]
    assert idx["hash"]["df"] == 2
    assert list(idx["spark"]["postings"]) == [0, 2]
    assert list(idx["window"]["postings"]) == [0, 2]
    assert list(idx["join"]["postings"]) == [1, 4]
    assert "" not in idx


def test_search_index_and_or(ray_session):
    from sqlgrep_ray.stages.index import build_inverted_index, search_index

    idx = build_inverted_index(_docs()).materialize()
    both = sorted(
        r["doc_id"] for r in search_index(idx, ["spark", "hash"]).take_all()
    )
    assert both == [0]
    either = sorted(
        r["doc_id"]
        for r in search_index(idx, ["spark", "hash"], mode="or").take_all()
    )
    assert either == [0, 1, 2]
    import pytest

    with pytest.raises(ValueError):
        search_index(idx, ["x"], mode="xor")


def test_ranked_search(ray_session):
    from sqlgrep_ray.stages.index import ranked_search, token_doc_tf

    tt = token_doc_tf(_docs())
    rows = token_doc_tf(_docs()).take_all()
    assert {(r["token"], r["doc_id"], r["tf"]) for r in rows} >= {
        ("hash", 0, 1), ("hash", 1, 2), ("spark", 0, 1), ("spark", 2, 1),
    }
    top = ranked_search(tt, ["spark", "hash"], k=3).take_all()
    # doc 0 matches both terms; docs 1 and 2 match one each (doc 1 tf=2)
    assert [(r["doc_id"], r["n_matched"], r["sum_tf"]) for r in top] == [
        (0, 2, 2), (1, 1, 2), (2, 1, 1),
    ]
