"""Distributed connected components (stages/cc.py)."""

import pyarrow as pa


def _edges(pairs):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array([a for a, _ in pairs], pa.int64()),
                "id_b": pa.array([b for _, b in pairs], pa.int64()),
            }
        )
    )


def test_components_chain_and_triangle(ray_session):
    from sqlgrep_ray.stages.cc import connected_components

    # chain 1-2-3-4-5 (diameter 4), triangle 10-11-12, isolated edge 20-21
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)]
    out = {
        r["node"]: r["component"]
        for r in connected_components(_edges(pairs)).take_all()
    }
    assert out == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
    }


def test_cluster_dedup_keep_fixes_chain_overkeep(ray_session):
    """The pathology the operator exists for: path a-c-b with a < c < b.
    Min-id-neighbor keeps BOTH a and c; components keep only a."""
    from sqlgrep_ray.stages.cc import cluster_dedup_keep

    a, c, b = 1, 5, 9
    pairs = [(a, c), (c, b)]
    keep = sorted(r["node"] for r in cluster_dedup_keep(_edges(pairs)).take_all())
    assert keep == [a]
    # the local rule would have kept {a, c}: c's only smaller-id pair is a?
    # no — c pairs with a (smaller) so c drops under BOTH rules here; use
    # the true pathology: edges (a,b) with labels where the middle is high
    pairs2 = [(1, 8), (8, 3)]  # path 1-8-3: node 3's only neighbor is 8 (>3)
    local_keep = {1, 3}  # min-id-neighbor rule: 3 survives (over-keep)
    cc_keep = sorted(
        r["node"] for r in cluster_dedup_keep(_edges(pairs2)).take_all()
    )
    assert cc_keep == [1] and 3 in local_keep


def test_components_converge_on_long_chain(ray_session):
    from sqlgrep_ray.stages.cc import connected_components

    n = 12  # diameter 11 — exercises many propagation rounds
    pairs = [(i, i + 1) for i in range(n)]
    out = {
        r["node"]: r["component"]
        for r in connected_components(_edges(pairs), max_iter=32).take_all()
    }
    assert set(out.values()) == {0} and len(out) == n + 1


def test_curate_cluster_exact(ray_session):
    """curate(cluster_exact=True) keeps exactly one doc per near-dup
    cluster (exact copies planted as a 3-clique)."""
    import ray.data

    from sqlgrep_ray.pipelines.curate import curate

    base = [
        "the quick brown fox jumps over the lazy dog again and again ok",
        "completely different content about ray data pipelines and arrow",
        "a third unique document with plenty of ordinary words in it now",
    ]
    texts = base + [base[0], base[0]]  # ids 3,4 are copies of 0 (clique)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    kept = {
        r["doc_id"]
        for r in curate(
            ds, languages=None, min_quality=0.0, min_tokens=1,
            drop_near_dups=True, near_dup_threshold=0.95, cluster_exact=True,
        ).take_all()
    }
    assert kept == {0, 1, 2}


def test_local_vs_distributed_equivalence(ray_session, monkeypatch):
    """Forcing the distributed label-propagation rounds (CC_LOCAL_MAX=0)
    must give the same (node, component) map as the driver union-find."""
    import numpy as np

    import sqlgrep_ray.stages.cc as cc

    rng = np.random.RandomState(13)
    # random graph: 300 nodes, 250 edges -> many components, some chains
    pairs = [
        (int(a), int(b))
        for a, b in rng.randint(0, 300, (250, 2))
        if a != b
    ]
    local = cc.connected_components(_edges(pairs)).to_pandas()
    monkeypatch.setattr(cc, "CC_LOCAL_MAX", 0)
    dist = cc.connected_components(_edges(pairs)).to_pandas()
    key = lambda df: sorted(zip(df["node"], df["component"]))
    assert key(local) == key(dist)


def test_local_path_long_chain(ray_session):
    """Pointer doubling converges on a 5000-node path graph (diameter far
    beyond the distributed max_iter guard) without warnings."""
    import warnings

    from sqlgrep_ray.stages.cc import connected_components

    pairs = [(i, i + 1) for i in range(5000)]
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        comp = connected_components(_edges(pairs)).to_pandas()
    assert (comp["component"] == 0).all()
    assert len(comp) == 5001
