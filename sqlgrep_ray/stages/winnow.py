"""Winnowing document fingerprints — rolling-hash local fingerprinting.

The north-star asks for "document fingerprinting (rolling hash)";
``textstats.fingerprint64`` is a whole-document hash (exact dedup key),
while this module implements LOCAL fingerprints via the classic winnowing
scheme (Schleimer/Wilkerson/Aiken, SIGMOD 2003 — the MOSS algorithm):

1. Karp-Rabin rolling hash over every ``k``-character window of the
   whitespace-normalized document (position ``i`` drops out of the hash in
   O(1) as ``i+k`` enters — the "rolling" property);
2. winnowing: within every window of ``w`` consecutive hashes keep the
   minimum (rightmost on ties); consecutive duplicate selections collapse.
   Guarantee: any shared substring of length ≥ ``w + k - 1`` yields at
   least one shared fingerprint — partial-copy detection, not just
   whole-document equality.

``winnow_fingerprints`` emits one row per (doc, selected fingerprint) —
the exploded layout feeds ``groupby(fp)`` collision analysis exactly like
the LSH bucket tables; ``shared_fingerprint_pairs`` composes it into
"documents sharing ≥ m fingerprints" via one vectorized hash aggregate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

_B = np.uint64(1_000_003)  # polynomial base
_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _rolling_hashes(data: bytes, k: int) -> np.ndarray:
    """Karp-Rabin hashes of every k-byte window (mod 2^64)."""
    b = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    n = len(b)
    if n < k:
        return np.array([], dtype=np.uint64)
    # h[i] = sum b[i+j] * B^(k-1-j); computed with k vectorized passes
    h = np.zeros(n - k + 1, dtype=np.uint64)
    for j in range(k):
        h = (h * _B + b[j : n - k + 1 + j]) & _MASK
    return h


def winnow_doc(text: str, k: int = 25, w: int = 16) -> np.ndarray:
    """Selected fingerprints (sorted unique int64) of one document."""
    import pandas as pd

    norm = " ".join((text or "").split()).lower().encode()
    h = _rolling_hashes(norm, k)
    if len(h) == 0:
        # short document: one whole-content fingerprint keeps it matchable
        if not norm:
            return np.array([], dtype=np.int64)
        pad = norm + b"\x00" * (k - len(norm))
        h = _rolling_hashes(pad, k)
    # 53-bit fingerprints: the vectorized sliding-min runs in float64
    # (pandas rolling, C impl), which is exact only up to 2^53 — truncate
    # the hash FIRST so no value is ever rounded
    h53 = (h >> np.uint64(11)).astype(np.float64)
    if len(h53) <= w:
        sel = np.array([h53.min()])
    else:
        sel = np.unique(pd.Series(h53).rolling(w).min().to_numpy()[w - 1 :])
    return np.unique(sel.astype(np.int64))


def winnow_fingerprints(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 25,
    w: int = 16,
) -> "ray.data.Dataset":
    """Exploded (doc_id, fp) rows — fixed-width int pairs, text never leaves
    the fingerprinting stage."""

    def fp_batch(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        texts = t[text_col].to_pylist()
        id_out, fp_out = [], []
        for i, txt in enumerate(texts):
            fps = winnow_doc(txt, k, w)
            if len(fps):
                id_out.append(np.full(len(fps), ids[i], dtype=np.int64))
                fp_out.append(fps)
        if not fp_out:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "fp": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                id_col: pa.array(np.concatenate(id_out)),
                "fp": pa.array(np.concatenate(fp_out)),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        fp_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def shared_fingerprint_pairs(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 25,
    w: int = 16,
    min_shared: int = 2,
    max_bucket: int = 256,
) -> "ray.data.Dataset":
    """Document pairs sharing ≥ ``min_shared`` winnowing fingerprints —
    partial-copy candidates (a shared span of ≥ w+k−1 normalized chars
    guarantees ≥ 1 shared fingerprint). Pair counting runs per fingerprint
    bucket (bounded by ``max_bucket``, like the LSH verify) and merges with
    ONE vectorized hash aggregate."""
    from ray.data.aggregate import Sum

    fps = winnow_fingerprints(ds, id_col, text_col, k, w)

    def bucket_pairs(g: pa.Table) -> pa.Table:
        m = g.num_rows
        a_out, b_out = [], []
        if 2 <= m <= max_bucket:
            ids = np.sort(g[id_col].to_numpy(zero_copy_only=False))
            for x in range(m):
                for y in range(x + 1, m):
                    if ids[x] != ids[y]:
                        a_out.append(ids[x])
                        b_out.append(ids[y])
        return pa.table(
            {
                "id_a": pa.array(a_out, pa.int64()),
                "id_b": pa.array(b_out, pa.int64()),
                "shared": pa.array(np.ones(len(a_out), dtype=np.int64)),
            }
        )

    pairs = fps.groupby("fp").map_groups(bucket_pairs, batch_format="pyarrow")
    merged = pairs.groupby(["id_a", "id_b"]).aggregate(
        Sum("shared", alias_name="shared", ignore_nulls=True)
    )

    def keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.greater_equal(t["shared"], min_shared))

    return merged.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
