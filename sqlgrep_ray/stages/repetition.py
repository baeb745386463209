"""Within-document repetition signals (Gopher-style quality rules).

Rae et al., "Scaling Language Models: Methods, Analysis & Insights from
Training Gopher" (2021) filter documents by within-doc repetition: the
fraction of duplicate word n-grams and the share of the most frequent
token. This stage computes the EXACT integer ingredients per document —
token count, distinct-token count, the most-frequent-token count, 2-gram
count and distinct-2-gram count — so the ratios are derivable and the
output is hash-exact against an ANSI-SQL oracle (no float drift).

Dataflow: one ``map_batches`` pass, no shuffle — each document's stats
depend only on its own text, so the stage streams at any corpus size.
Tokenization is the engine-wide deterministic whitespace split
(``textnorm.split_whitespace``, empty pieces dropped — str.split parity),
matching the DuckDB oracle's ``regexp_split_to_array(trim(text), '\\s+')``
on corpora without leading/trailing/double whitespace (the testdata
convention, same contract as ``token_counts``).

Everything is vectorized: one split kernel + one dictionary-encode per
batch, then numpy bincount / lexsort run-detection over (row, code) keys —
no Python loop over rows or tokens.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from sqlgrep_ray.stages.textnorm import split_whitespace


def _repetition_batch(
    t: pa.Table, id_col: str, text_col: str, append: bool = False
) -> pa.Table:
    col = t[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    filled = pc.fill_null(col, "")
    n = len(filled)

    splits = split_whitespace(filled)
    flat = splits.flatten()
    offsets = splits.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat = flat.filter(pa.array(nonempty))
    cum = np.concatenate([[0], np.cumsum(nonempty, dtype=np.int64)])
    offs = cum[offsets]
    ntok = offs[1:] - offs[:-1]

    n_distinct = np.zeros(n, dtype=np.int64)
    max_count = np.zeros(n, dtype=np.int64)
    n_2grams = np.maximum(ntok - 1, 0)
    n_distinct_2 = np.zeros(n, dtype=np.int64)

    if len(flat):
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        rows = np.repeat(np.arange(n, dtype=np.int64), ntok)

        # unigrams: one sorted pass over (row, code) keys. The dictionary is
        # block-local so rows * K + code stays well under int64.
        K = np.int64(len(enc.dictionary) + 1)
        keys = rows * K + codes
        uk, counts = np.unique(keys, return_counts=True)
        urows = (uk // K).astype(np.int64)
        n_distinct = np.bincount(urows, minlength=n).astype(np.int64)
        starts = np.flatnonzero(np.r_[True, urows[1:] != urows[:-1]])
        max_count[urows[starts]] = np.maximum.reduceat(counts, starts)

        # 2-grams: consecutive codes within a row; distinct via lexsort run
        # detection (avoids K**2-scale keys)
        same = rows[1:] == rows[:-1]
        if same.any():
            g1 = codes[:-1][same]
            g2 = codes[1:][same]
            grows = rows[:-1][same]
            order = np.lexsort((g2, g1, grows))
            sr, s1, s2 = grows[order], g1[order], g2[order]
            new = np.r_[
                True,
                (sr[1:] != sr[:-1]) | (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1]),
            ]
            n_distinct_2 = np.bincount(sr[new], minlength=n).astype(np.int64)

    cols = {
        "n_tokens": pa.array(ntok, pa.int64()),
        "n_distinct_tokens": pa.array(n_distinct, pa.int64()),
        "max_token_count": pa.array(max_count, pa.int64()),
        "n_2grams": pa.array(n_2grams, pa.int64()),
        "n_distinct_2grams": pa.array(n_distinct_2, pa.int64()),
    }
    if append:
        for name, arr in cols.items():
            t = t.append_column(name, arr)
        return t
    return pa.table({id_col: t[id_col], **cols})


def repetition_stats(
    ds: "ray.data.Dataset", id_col: str = "doc_id", text_col: str = "text"
) -> "ray.data.Dataset":
    """Per-document repetition signals as exact int64 counts.

    Output columns: ``(id_col, n_tokens, n_distinct_tokens,
    max_token_count, n_2grams, n_distinct_2grams)``. Derive the Gopher
    ratios downstream (duplicate-unigram fraction =
    ``1 - n_distinct_tokens/n_tokens``, top-token share =
    ``max_token_count/n_tokens``, duplicate-2-gram fraction =
    ``1 - n_distinct_2grams/n_2grams``) and filter with a WHERE stage.
    """

    def fn(t: pa.Table) -> pa.Table:
        return _repetition_batch(t, id_col, text_col)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def with_repetition(
    ds: "ray.data.Dataset", id_col: str = "doc_id", text_col: str = "text"
) -> "ray.data.Dataset":
    """Append the repetition-signal columns to the input rows (mid-pipeline
    form: the original columns survive for downstream filters/sinks)."""

    def fn(t: pa.Table) -> pa.Table:
        return _repetition_batch(t, id_col, text_col, append=True)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
