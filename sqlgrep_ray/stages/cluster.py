"""Mini-batch-free distributed k-means over an embedding column.

Corpus-level embedding clustering (semantic dedup buckets, domain
discovery, diversity sampling — the SemDeDup/DSIR-style preprocessing
step). No reference analogue. Lloyd's algorithm, Ray-Data-first:

* centroids are the ONLY global state: a (k × d) float64 array broadcast
  per iteration via ``ray.put`` — small side, read once per task;
* each iteration is one streaming ``map_batches`` pass emitting per-block
  PARTIALS (per-centroid vector sums + counts, k×(d+1) floats per block —
  never the assignments); the driver folds partials (tiny) and updates
  centroids. No shuffle at any point;
* the final pass appends ``cluster_id`` per row.

Deterministic: init = the k rows with the smallest ``id_col``, found by a
per-block min-k combine + one reduce level (never a corpus-wide sort —
order is independent of block layout); ties in assignment break to the lowest centroid
index via argmin. Iterations are fixed-count (``n_iter``) — convergence
checking would add a driver round-trip per iteration for little gain at
scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _mat(col: pa.ChunkedArray) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return np.stack(col.to_numpy(zero_copy_only=False)).astype(np.float64)


def _assign(x: np.ndarray, cents: np.ndarray) -> np.ndarray:
    # ||x-c||² = ||x||² − 2x·c + ||c||²; ||x||² is constant per row → argmin
    # over (−2x·c + ||c||²), one matmul per batch
    d2 = -2.0 * (x @ cents.T) + (cents * cents).sum(axis=1)[None, :]
    return np.argmin(d2, axis=1)


def kmeans(
    ds: "ray.data.Dataset",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    n_iter: int = 10,
) -> tuple["ray.data.Dataset", np.ndarray]:
    """Cluster rows of ``vec_col`` into ``k`` groups. Returns
    ``(ds + cluster_id column, centroids (k × d))``."""
    # seed = the k smallest-id rows, found WITHOUT a corpus sort: each block
    # keeps its own k smallest (vectorized take of sort_indices over ≤ block
    # rows), so the merge sees ≤ k × blocks narrow rows — the round-2 full
    # ds.sort(id_col) shuffled every block for k seed vectors
    def block_min_k(t: pa.Table) -> pa.Table:
        if t.num_rows > k:
            idx = pa.compute.sort_indices(t, [(id_col, "ascending")])[:k]
            t = t.take(idx)
        return t

    partials = ds.select_columns([id_col, vec_col]).map_batches(
        block_min_k, batch_format="pyarrow", zero_copy_batch=True
    )
    # one reduce level bounds the driver read at k × 32 rows even when the
    # corpus has millions of blocks (k rows ride per block after the map)
    seed_rows = (
        partials.repartition(32)
        .map_batches(block_min_k, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()
    )
    seed_rows.sort(key=lambda r: r[id_col])
    seed = seed_rows[:k]
    cents = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in seed])
    if len(cents) < k:
        raise ValueError(f"need ≥ {k} rows to seed {k} centroids")

    # pin the narrow (vec-only) projection for the n_iter re-reads; blocks
    # beyond object-store capacity spill to disk rather than re-running the
    # upstream pipeline per iteration — pass an already-materialized narrow
    # dataset to skip the copy entirely
    narrow = ds.select_columns([vec_col]).materialize()
    for _ in range(n_iter):
        ref = ray.put(cents)

        def partial(t: pa.Table, _ref=ref) -> pa.Table:
            c = ray.get(_ref)
            x = _mat(t[vec_col])
            a = _assign(x, c)
            sums = np.zeros_like(c)
            np.add.at(sums, a, x)
            counts = np.bincount(a, minlength=len(c)).astype(np.float64)
            return pa.table(
                {
                    "cid": pa.array(np.arange(len(c))),
                    "sum": pa.array(list(sums)),
                    "n": pa.array(counts),
                }
            )

        def fold(t: pa.Table) -> pa.Table:
            # pre-merge partial rows (k per block) so the driver reads a
            # bounded set no matter how many blocks streamed
            cid = t["cid"].to_numpy(zero_copy_only=False)
            s = np.stack(t["sum"].to_numpy(zero_copy_only=False))
            n = t["n"].to_numpy(zero_copy_only=False)
            sums = np.zeros((k, s.shape[1]))
            counts = np.zeros(k)
            np.add.at(sums, cid, s)
            np.add.at(counts, cid, n)
            return pa.table(
                {
                    "cid": pa.array(np.arange(k)),
                    "sum": pa.array(list(sums)),
                    "n": pa.array(counts),
                }
            )

        rows = (
            narrow.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .map_batches(fold, batch_format="pyarrow", batch_size=64 * k)
            .take_all()
        )
        sums = np.zeros_like(cents)
        counts = np.zeros(k)
        for r in rows:
            sums[r["cid"]] += np.asarray(r["sum"])
            counts[r["cid"]] += r["n"]
        nonempty = counts > 0
        cents[nonempty] = sums[nonempty] / counts[nonempty, None]

    final_ref = ray.put(cents)

    def label(t: pa.Table) -> pa.Table:
        c = ray.get(final_ref)
        x = _mat(t[vec_col])
        return t.append_column("cluster_id", pa.array(_assign(x, c)))

    return (
        ds.map_batches(label, batch_format="pyarrow", zero_copy_batch=True),
        cents,
    )
