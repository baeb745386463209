"""Duplicate n-gram span statistics — corpus-level repeated-text signal.

Per document: how many of its token k-gram OCCURRENCES also occur elsewhere
in the corpus (or again in the same document) — the "duplicate n-gram
fraction" quality signal from substring-dedup work on LLM training data
(Lee et al. 2022, "Deduplicating Training Data Makes Language Models
Better"); C4/RefinedWeb-style pipelines drop or down-weight documents with
high duplicate fractions.

Not in the reference (its dedup stops at SELECT DISTINCT,
``execution/helpers.rs:5-25``); built from the same Ray Data primitives as
the rest of the engine and scale-safe by construction:

1. per-block combine: (gram_hash, doc_id) → occurrence count
   (``pa.TableGroupBy``, vectorized) — only fixed-width int pairs leave the
   block, never text;
2. ``groupby(gram_hash, doc_id).Sum`` — global per-doc gram counts;
3. ``groupby(gram_hash).Sum`` — global total occurrences per gram (small:
   one row per distinct gram);
4. hash-join 2⟕3 on the gram hash, flag grams with total ≥ 2, then ONE
   ``groupby(doc_id)`` sums duplicate vs total occurrences.

Output: (doc_id, dup_grams, total_grams) — integers, so the DuckDB oracle
(string shingles via list lambdas) matches hash-exactly.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from sqlgrep_ray.stages.enrich import join_partitions

# (gram, doc, count) partial rows at or below this merge on the driver
# (three int64 columns -> ~192 MB at the ceiling); above it the
# distributed groupby/join dataflow runs. Same AUTO pattern as the
# aggregate engine, vocab, and connected components.
TEXTDUP_SMALL_MAX = 8_000_000


def _gram_hashes(text: str, k: int) -> np.ndarray:
    """64-bit hashes of each token k-gram occurrence (with multiplicity).
    Texts shorter than ``k`` tokens contribute ONE gram: the whole token
    sequence (mirrors ``dedup._token_shingles``)."""
    from sqlgrep_ray.stages.textnorm import arrow_split

    toks = arrow_split(text or "")
    if not toks:
        return np.array([], dtype=np.int64)
    if len(toks) < k:
        spans = [" ".join(toks)]
    else:
        spans = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    out = np.empty(len(spans), dtype=np.int64)
    for i, s in enumerate(spans):
        out[i] = int.from_bytes(
            hashlib.blake2b(s.encode(), digest_size=8).digest(),
            "little",
            signed=True,  # signed: Ray groupby keys stay Arrow-native
        )
    return out


def duplicate_ngram_stats(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    num_partitions: "int | None" = None,
) -> "ray.data.Dataset":
    """(doc_id, dup_grams, total_grams): of the document's ``total_grams``
    k-gram occurrences, ``dup_grams`` belong to grams seen ≥ 2 times in the
    whole corpus. ``dup_grams / total_grams`` is the duplicate-span
    fraction; filter or down-weight above a threshold."""
    from ray.data.aggregate import Sum

    def explode(t: pa.Table) -> pa.Table:
        from sqlgrep_ray.stages.decontam import _doc_grams

        ids = t[id_col].to_numpy(zero_copy_only=False)
        col = t[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        filled = pc.fill_null(col, "")
        # shared vectorized gram kernel + blake2b once per UNIQUE gram
        # (dictionary-encode) — exact-equivalent to per-row _gram_hashes
        grams, rows, _ntok = _doc_grams(filled, k)
        if not len(grams):
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "gram": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        enc = pc.dictionary_encode(grams)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        uh = np.fromiter(
            (
                int.from_bytes(
                    hashlib.blake2b(u.encode(), digest_size=8).digest(),
                    "little",
                )
                for u in enc.dictionary.to_pylist()
            ),
            dtype=np.uint64,
            count=len(enc.dictionary),
        ).view(np.int64)  # same bits as signed=True in _gram_hashes
        tbl = pa.table(
            {
                id_col: pa.array(ids[rows]),
                "gram": pa.array(uh[codes]),
            }
        )
        # per-block combine: one row per (gram, doc) with its occurrence count
        return (
            pa.TableGroupBy(tbl, ["gram", id_col])
            .aggregate([([], "count_all")])
            .rename_columns(["gram", id_col, "cnt"])
        )

    pairs = ds.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # size-aware AUTO (the aggregate/vocab/cc pattern): the whole dataflow
    # below is three narrow-int hash aggregates + one join — at small
    # partial counts that is 4 all-to-alls of pure fixed overhead for
    # milliseconds of actual work, so merge on the driver instead
    if pairs.count() <= TEXTDUP_SMALL_MAX:
        tbls = list(pairs.iter_batches(batch_format="pyarrow"))
        if not tbls:
            return ray.data.from_arrow(
                pa.table(
                    {
                        id_col: pa.array([], pa.int64()),
                        "dup_grams": pa.array([], pa.int64()),
                        "total_grams": pa.array([], pa.int64()),
                    }
                )
            )
        t = pa.concat_tables(tbls)
        per_doc_t = (
            pa.TableGroupBy(t, ["gram", id_col])
            .aggregate([("cnt", "sum")])
            .rename_columns(["gram", id_col, "cnt"])
        )
        totals_t = (
            pa.TableGroupBy(per_doc_t.select(["gram", "cnt"]), ["gram"])
            .aggregate([("cnt", "sum")])
            .rename_columns(["gram", "total"])
        )
        pos = pc.index_in(per_doc_t["gram"], value_set=totals_t["gram"])
        total = totals_t["total"].take(pos)
        dup = pc.if_else(
            pc.greater_equal(total, 2),
            per_doc_t["cnt"],
            pa.scalar(0, pa.int64()),
        )
        per_doc_t = per_doc_t.append_column("dup", dup)
        out_t = (
            pa.TableGroupBy(per_doc_t.select([id_col, "dup", "cnt"]), [id_col])
            .aggregate([("dup", "sum"), ("cnt", "sum")])
            .rename_columns([id_col, "dup_grams", "total_grams"])
        )
        return ray.data.from_arrow(out_t)

    # global per-(gram, doc) counts — ONE vectorized hash shuffle; pin for
    # the two consumers below (narrow: three int64 columns)
    per_doc = (
        pairs.groupby(["gram", id_col])
        .aggregate(Sum("cnt", alias_name="cnt", ignore_nulls=True))
        .materialize()
    )
    # global per-gram totals (one row per distinct gram)
    totals = per_doc.groupby("gram").aggregate(
        Sum("cnt", alias_name="total", ignore_nulls=True)
    )
    joined = per_doc.join(
        totals,
        join_type="inner",
        on=("gram",),
        num_partitions=join_partitions(num_partitions),
    )

    def flag(t: pa.Table) -> pa.Table:
        dup = pc.if_else(
            pc.greater_equal(t["total"], 2), t["cnt"], pa.scalar(0, pa.int64())
        )
        return pa.table({id_col: t[id_col], "cnt": t["cnt"], "dup": dup})

    flagged = joined.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)
    out = flagged.groupby(id_col).aggregate(
        Sum("dup", alias_name="dup_grams", ignore_nulls=True),
        Sum("cnt", alias_name="total_grams", ignore_nulls=True),
    )
    return out
