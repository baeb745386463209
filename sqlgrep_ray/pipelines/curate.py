"""Corpus curation pipeline — the training-data composition showcase.

Chains the engine's curation operators into the shape a real 100 TB text
pipeline runs, every stage streaming:

    read → text_stats (lang-ID, quality, fingerprint)
         → filter (language allowlist + quality floor + length window)
         → exact dedup on the content fingerprint (keep min doc_id)
         → [near-dup pair removal via MinHash-LSH]
         → write partitioned parquet (resumable layout)

Everything composes from existing stages; this module only wires them.
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from sqlgrep_ray.stages.dedup import exact_dedup, minhash_lsh_dedup
from sqlgrep_ray.stages.textstats import text_stats


def curate(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    languages: Sequence[str] = ("en",),
    min_quality: float = 0.3,
    min_tokens: int = 5,
    drop_near_dups: bool = False,
    near_dup_threshold: float = 0.9,
) -> "ray.data.Dataset":
    """Filter + dedup a document corpus; returns surviving (id, text, stats).

    Exact dedup keys on the whitespace/case-normalized content fingerprint;
    the winner is the smallest id (deterministic). With ``drop_near_dups``,
    MinHash-LSH pairs above ``near_dup_threshold`` additionally remove the
    larger id of each pair (union-find-free policy: deterministic, may keep
    one member of a larger near-dup cluster per pair edge).
    """
    langs = pa.array(list(languages))
    stats = text_stats(ds, text_col=text_col)

    def keep(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.is_in(t["lang_pred"], value_set=langs),
            pc.and_(
                pc.greater_equal(t["quality_score"], min_quality),
                pc.greater_equal(t["n_tokens_ws"], min_tokens),
            ),
        )
        return t.filter(mask)

    filtered = stats.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    filtered = filtered.materialize()  # two consumers below

    # exact dedup on content fingerprint → surviving ids
    winners = exact_dedup(filtered, key="fingerprint", id_col=id_col)

    losers: Optional[set] = None
    if drop_near_dups:
        pairs = minhash_lsh_dedup(
            filtered, id_col=id_col, text_col=text_col, threshold=near_dup_threshold
        ).to_pandas()
        losers = set(pairs["id_b"])  # drop the larger id of each pair

    keep_ids = winners.to_pandas()[id_col]
    if losers:
        keep_ids = keep_ids[~keep_ids.isin(list(losers))]
    import numpy as np

    import ray

    ids_ref = ray.put(pa.array(np.sort(keep_ids.to_numpy())))

    def final_filter(t: pa.Table, ids_ref=None) -> pa.Table:
        ids = ray.get(ids_ref) if isinstance(ids_ref, ray.ObjectRef) else ids_ref
        return t.filter(pc.is_in(t[id_col], value_set=ids))

    return filtered.map_batches(
        final_filter,
        fn_kwargs=dict(ids_ref=ids_ref),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
