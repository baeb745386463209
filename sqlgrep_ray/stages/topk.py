"""Grouped top-k — combiner-first, like the aggregate engine.

The reference has no top-k / ORDER BY at all (SURVEY §2.7); at scale,
"top-k rows per group by some score" is a curation staple (best documents
per language, longest conversations per day). Shape mirrors
``AggregatePlan.small_result``:

1. per-block combine: each block keeps only its own top-k per group
   (vectorized lexsort + per-group rank mask) — the shuffle then moves at
   most ``k × groups_per_block`` rows per block, never the corpus;
2. one-block merge: the surviving candidates coalesce and the same
   rank-mask picks the global top-k per group.

Deterministic: ties broken by ascending ``tie_col`` (required — an id
column), so results are oracle-comparable (SQL ``row_number() OVER (…
ORDER BY score DESC, id)``).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _local_topk(
    t: pa.Table, keys: Sequence[str], score_col: str, tie_col: str, k: int
) -> pa.Table:
    if t.num_rows == 0:
        return t
    sort_keys = [(c, "ascending") for c in keys] + [
        (score_col, "descending"),
        (tie_col, "ascending"),
    ]
    t = t.take(pc.sort_indices(t, sort_keys))
    # rank within each group of the sorted table
    key_arrays = [t[c].to_numpy(zero_copy_only=False) for c in keys]
    n = t.num_rows
    new_grp = np.zeros(n, dtype=bool)
    new_grp[0] = True
    for arr in key_arrays:
        new_grp[1:] |= arr[1:] != arr[:-1]
    grp_id = np.cumsum(new_grp) - 1
    # rank = position − first position of the row's group
    first_pos = np.zeros(grp_id[-1] + 1, dtype=np.int64)
    starts = np.flatnonzero(new_grp)
    first_pos[:] = starts
    rank = np.arange(n) - first_pos[grp_id]
    return t.filter(pa.array(rank < k))


def grouped_topk(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    score_col: str,
    tie_col: str,
    k: int,
) -> "ray.data.Dataset":
    """Top-``k`` rows per ``keys`` group by ``score_col`` desc (ties:
    ``tie_col`` asc). Combiner-first; assumes k × |groups| fits one worker
    for the final merge (the sqlgrep-style low-cardinality contract — use a
    distributed groupby().map_groups for huge group counts)."""
    keys = list(keys)

    def block(t: pa.Table) -> pa.Table:
        return _local_topk(t, keys, score_col, tie_col, k)

    cands = ds.map_batches(block, batch_format="pyarrow", zero_copy_batch=True)
    return cands.repartition(1).map_batches(
        block, batch_format="pyarrow"
    )
