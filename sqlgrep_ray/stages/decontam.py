"""Test-set decontamination — flag corpus docs sharing n-grams with a benchmark.

The standard LLM-training hygiene step (GPT-3 appendix C / PaLM-style
13-gram overlap checks): any training document that shares a token k-gram
with an evaluation benchmark is flagged (and usually dropped) so the eval
stays uncontaminated. Not in the reference (its overlap machinery stops at
``SELECT DISTINCT``, ``execution/helpers.rs:5-25``); built Ray-Data-first:

* the benchmark side is SMALL by contract (eval suites are MBs, not TBs):
  its distinct gram set is built once on the driver and broadcast via
  ``ray.put`` — every map task reads the same object-store copy, nothing is
  re-shipped per batch;
* the corpus side streams: one ``map_batches`` computes each document's
  gram stream fully vectorized (flattened token array + k shifted slices
  joined by one ``binary_join_element_wise`` call — no per-row Python) and
  counts membership hits with ``pc.is_in`` + segment sums. Only counters
  come out; text never leaves the stage.

Gram semantics mirror ``stages/textdup._gram_hashes``: tokens are
whitespace-split (python ``str.split()`` — empty pieces dropped), documents
shorter than ``k`` tokens contribute ONE gram (the whole token sequence),
and matching is on lowercased text. Outputs are integers/bools, so the
DuckDB list-lambda oracle matches hash-exactly.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from sqlgrep_ray.stages.textnorm import split_whitespace


def _norm_tokens(text: str) -> list[str]:
    from sqlgrep_ray.stages.textnorm import arrow_lower, arrow_split

    # utf8proc lowercase+split (textnorm.py) — matches the corpus-side
    # batch kernel on all inputs, not just ASCII
    return arrow_split(arrow_lower(text or ""))


def benchmark_ngrams(texts: Iterable[str], k: int) -> pa.Array:
    """Distinct lowercased token k-grams of the benchmark texts, as a sorted
    Arrow string array (the ``pc.is_in`` value set). Driver-side by design:
    the benchmark is the small side."""
    grams: set[str] = set()
    for text in texts:
        toks = _norm_tokens(text)
        if not toks:
            continue
        if len(toks) < k:
            grams.add(" ".join(toks))
        else:
            grams.update(
                " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
            )
    return pa.array(sorted(grams), pa.string())


def _doc_grams(
    filled: pa.Array, k: int
) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Vectorized gram stream for a (null-free, lowercased) text column.

    Returns ``(grams, gram_row_ids, toks_per_row)``: one entry per gram
    OCCURRENCE, tagged with the row it came from. Documents with
    ``0 < n_tokens < k`` contribute their whole token sequence as one gram.
    """
    n = len(filled)
    splits = split_whitespace(filled)
    if isinstance(splits, pa.ChunkedArray):
        splits = splits.combine_chunks()
    flat = splits.flatten()
    offsets = splits.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    # compact away empty pieces (str.split parity), rebuild offsets
    flat = flat.filter(pa.array(nonempty))
    cum = np.concatenate([[0], np.cumsum(nonempty, dtype=np.int64)])
    offs = cum[offsets]  # per-row [start, end) into the compact token array
    ntok = offs[1:] - offs[:-1]
    t = len(flat)

    gram_parts: list[pa.Array] = []
    row_parts: list[np.ndarray] = []
    if t >= k:
        # valid window starts: positions whose k-th token is still in-row
        row_of = np.repeat(np.arange(n, dtype=np.int64), ntok)
        starts = np.arange(t - k + 1)
        valid = row_of[starts] == row_of[starts + k - 1]
        vstarts = starts[valid]
        if len(vstarts):
            vset = pa.array(vstarts)
            cols = [flat.take(pc.add(vset, j)) for j in range(k)]
            grams = pc.binary_join_element_wise(*cols, pa.scalar(" "))
            gram_parts.append(grams)
            row_parts.append(row_of[vstarts])
    # short docs: one gram = the whole (normalized) token sequence
    short = np.flatnonzero((ntok > 0) & (ntok < k))
    if len(short):
        joined = pc.binary_join(splits, pa.scalar(" "))
        # splits still holds empty pieces; re-join from the compact tokens
        # via list slices is costlier — normalize by collapsing runs instead
        joined = pc.replace_substring_regex(joined, r"\s+", " ")
        joined = pc.utf8_trim_whitespace(joined)
        gram_parts.append(joined.take(pa.array(short)))
        row_parts.append(short.astype(np.int64))
    if not gram_parts:
        return pa.array([], pa.string()), np.array([], dtype=np.int64), ntok
    grams = pa.concat_arrays(
        [g.combine_chunks() if isinstance(g, pa.ChunkedArray) else g for g in gram_parts]
    )
    return grams, np.concatenate(row_parts), ntok


def decontaminate(
    ds: "ray.data.Dataset",
    benchmark: "pa.Array | Iterable[str]",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> "ray.data.Dataset":
    """(id, total_grams, n_hits, contaminated) per document with ≥ 1 token:
    of its ``total_grams`` k-gram occurrences, ``n_hits`` appear in the
    benchmark gram set; ``contaminated`` = any hit. Drop or audit flagged
    docs before training."""
    if not isinstance(benchmark, pa.Array):
        benchmark = benchmark_ngrams(benchmark, k)
    bench_ref = ray.put(benchmark)

    def score(t: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        col = t[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        filled = pc.utf8_lower(pc.fill_null(col, ""))
        grams, rows, ntok = _doc_grams(filled, k)
        n = t.num_rows
        total = np.where(ntok > 0, np.maximum(ntok - k + 1, 1), 0)
        hits = np.zeros(n, dtype=np.int64)
        if len(grams):
            isin = pc.is_in(grams, value_set=bench).to_numpy(zero_copy_only=False)
            np.add.at(hits, rows[isin], 1)
        keep = total > 0
        return pa.table(
            {
                id_col: t[id_col].filter(pa.array(keep)),
                "total_grams": pa.array(total[keep]),
                "n_hits": pa.array(hits[keep]),
                "contaminated": pa.array(hits[keep] > 0),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    )
