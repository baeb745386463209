"""Sequence packing — group documents into fixed token-budget bins.

The step that turns a curated corpus into training sequences: concatenate
documents until the context window (``budget`` tokens) is full, start the
next bin. No reference analogue. Ray-Data shape: packing is PER BLOCK
(embarrassingly parallel, no shuffle) — each block's rows are packed
independently by a deterministic next-fit scan, and bin ids are globally
unique because a bin is named by the id of its first row. The canonical
pipeline sorts/partitions upstream (e.g. by shard and document index) so
block contents — and therefore the packing — are deterministic across
runs; the operator itself never reorders rows.

The scan runs over the int64 token-count array only (never the text), so
the per-row Python loop costs microseconds per thousand rows — the hot
data stays columnar.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def _next_fit(ids: np.ndarray, toks: np.ndarray, budget: int) -> np.ndarray:
    """bin id per row: next-fit over rows in order; a row larger than the
    whole budget becomes its own (overflowing) bin."""
    bins = np.empty(len(ids), dtype=np.int64)
    cur_bin = -1
    cur_tok = 0
    for i in range(len(ids)):
        t = int(toks[i])
        if cur_bin == -1 or cur_tok + t > budget:
            cur_bin = int(ids[i])
            cur_tok = 0
        bins[i] = cur_bin
        cur_tok += t
    return bins


def pack_sequences(
    ds: "ray.data.Dataset",
    budget: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> "ray.data.Dataset":
    """Append ``bin_id``: rows sharing a bin_id concatenate into one
    training sequence of ≤ ``budget`` tokens (an oversized single row
    overflows alone — flag upstream with a length filter if unwanted).
    ``bin_id`` = the ``id_col`` of the bin's first row."""

    def pack(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        toks = t[tokens_col].to_numpy(zero_copy_only=False)
        return t.append_column("bin_id", pa.array(_next_fit(ids, toks, budget)))

    return ds.map_batches(pack, batch_format="pyarrow", zero_copy_batch=True)
