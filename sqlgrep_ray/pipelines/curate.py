"""Corpus curation pipeline — the training-data composition showcase.

Chains the engine's curation operators into the shape a real 100 TB text
pipeline runs, every stage streaming:

    read → text_stats (lang-ID, quality, fingerprint)
         → filter (language allowlist + quality floor + length window)
         → exact dedup on the content fingerprint (keep min doc_id)
         → [near-dup pair removal via MinHash-LSH]
         → write partitioned parquet (resumable layout)

Everything composes from existing stages; this module only wires them.

Keep-set application is size-aware: the exact-dedup survivor set (and the
near-dup loser set) are COUNTED first — small sets broadcast as an id array
(``ray.put`` once, vectorized ``is_in`` filter, no shuffle); sets above
``BROADCAST_IDS_MAX`` switch to a distributed semi-/anti-join on ``id_col``,
so the keep-set never has to exist as one in-memory list at 10^9 docs (the
round-1 unconditional ``to_pandas()`` keep-set was a driver OOM; the
unconditional join was a 4-second actor-pool tax on small corpora).
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from sqlgrep_ray.stages.dedup import exact_dedup, minhash_lsh_dedup
from sqlgrep_ray.stages.enrich import join_partitions
from sqlgrep_ray.stages.textstats import text_stats

# id sets up to this size are broadcast (int64 → ≤16 MB in the object store,
# one copy per node) instead of hash-shuffle joined
BROADCAST_IDS_MAX = 2_000_000


def _collect_ids(ds: "ray.data.Dataset", id_col: str) -> pa.Array:
    tbls = list(ds.select_columns([id_col]).iter_batches(batch_format="pyarrow"))
    if not tbls:
        return pa.array([], pa.int64())
    return pa.concat_tables(tbls)[id_col].combine_chunks()


def _semi_filter(
    left: "ray.data.Dataset", ids: pa.Array, id_col: str, keep: bool
) -> "ray.data.Dataset":
    """Broadcast id-set membership filter (keep=True ⇒ semi, False ⇒ anti)."""
    import ray

    ids_ref = ray.put(ids)

    def f(t: pa.Table, ids_ref=None) -> pa.Table:
        vs = ray.get(ids_ref) if isinstance(ids_ref, ray.ObjectRef) else ids_ref
        mask = pc.is_in(t[id_col], value_set=vs)
        if not keep:
            mask = pc.invert(mask)
        return t.filter(mask)

    return left.map_batches(
        f, fn_kwargs=dict(ids_ref=ids_ref), batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _membership_join(
    left: "ray.data.Dataset",
    right_ids: "ray.data.Dataset",
    id_col: str,
    num_partitions: int,
    keep_matched: bool = False,
    key_type: "pa.DataType | None" = None,
) -> "ray.data.Dataset":
    """left rows whose ``id_col`` does (``keep_matched=True``, semi-join)
    or does not (anti-join) appear in ``right_ids`` — left-outer join
    against the deduped id set + null-marker filter (both sides
    hash-partition on the id; no driver state).

    ``key_type``: pass the id's Arrow type when ``right_ids`` derives
    from a prior shuffle/join output — those emit schema-less EMPTY
    blocks that pyarrow's partition join rejects ("no match for key
    field on right side"); knowing the type lets every block be
    normalized to the exact (id, __nd) schema first."""
    from ray.data.aggregate import Max

    def mark(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or (key_type is not None and id_col not in t.column_names):
            if key_type is None:
                raise ValueError(
                    f"schema-less block in membership join on {id_col!r}; "
                    "pass key_type when the id side derives from a shuffle"
                )
            ids = pa.array([], key_type)
        else:
            ids = t[id_col]
            if key_type is not None:
                ids = pc.cast(ids, key_type)
        return pa.table(
            {id_col: ids, "__nd": pa.array([1] * len(ids), pa.int8())}
        )

    marked = right_ids.map_batches(
        mark, batch_format="pyarrow", zero_copy_batch=True
    )
    # dedup the right side: duplicate keys in a join's build side would
    # fan out left rows
    marked = marked.groupby(id_col).aggregate(
        Max("__nd", alias_name="__nd", ignore_nulls=True)
    )
    if key_type is not None:
        # the groupby shuffle can also emit schema-less empty blocks
        target = pa.schema([(id_col, key_type), ("__nd", pa.int8())])

        def normalize(t: pa.Table) -> pa.Table:
            if t.num_columns == 0:
                return target.empty_table()
            return t.select([id_col, "__nd"]).cast(target)

        marked = marked.map_batches(
            normalize, batch_format="pyarrow", zero_copy_batch=True
        )
    joined = left.join(
        marked, join_type="left_outer", on=(id_col,), num_partitions=num_partitions
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return t
        mask = pc.is_null(t["__nd"])
        if keep_matched:
            mask = pc.invert(mask)
        return t.filter(mask).drop_columns(["__nd"])

    return joined.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )


def _anti_join(
    left: "ray.data.Dataset",
    right_ids: "ray.data.Dataset",
    id_col: str,
    num_partitions: int,
) -> "ray.data.Dataset":
    """left rows whose ``id_col`` does NOT appear in ``right_ids``."""
    return _membership_join(left, right_ids, id_col, num_partitions)


def curate(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    languages: Optional[Sequence[str]] = ("en",),
    min_quality: float = 0.3,
    min_tokens: int = 5,
    drop_near_dups: bool = False,
    near_dup_threshold: float = 0.9,
    cluster_exact: bool = False,
    num_partitions: "int | None" = None,
) -> "ray.data.Dataset":
    """Filter + dedup a document corpus; returns surviving (id, text, stats).

    Exact dedup keys on the whitespace/case-normalized content fingerprint;
    the winner is the smallest id (deterministic). With ``drop_near_dups``,
    MinHash-LSH pairs above ``near_dup_threshold`` additionally remove the
    larger id of each pair (union-find-free policy: deterministic, may keep
    one member of a larger near-dup cluster per pair edge — e.g. the chain
    a—c—b with a < c < b keeps both a and c). ``cluster_exact=True``
    upgrades that to true connected components (``stages/cc.py``): exactly
    ONE survivor per near-dup cluster, at the cost of O(diameter)
    label-propagation rounds over the pair graph.

    ``languages=None`` skips the language filter (stats are still computed);
    with ``min_quality=0.0`` the surviving set is then SQL-expressible
    (token floor + normalized-content dedup), which the contract oracle
    exploits.
    """
    num_partitions = join_partitions(num_partitions)
    stats = text_stats(ds, text_col=text_col)
    langs = pa.array(list(languages)) if languages is not None else None

    def keep(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.greater_equal(t["quality_score"], min_quality),
            pc.greater_equal(t["n_tokens_ws"], min_tokens),
        )
        if langs is not None:
            mask = pc.and_(pc.is_in(t["lang_pred"], value_set=langs), mask)
        return t.filter(mask)

    filtered = stats.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    # consumed 2-3×(winners, optional pairs, final joins) — pin once; blocks
    # spill to the object store rather than re-running text_stats per consumer
    filtered = filtered.materialize()

    # exact dedup on content fingerprint → surviving ids; the winner set is
    # counted first (it is the output of an aggregation — already small per
    # key) and applied as a broadcast semi-filter when it fits, else as a
    # distributed semi-join (inner join on the id — one row per survivor, no
    # fan-out)
    winners = exact_dedup(filtered, key="fingerprint", id_col=id_col).materialize()
    if winners.count() <= BROADCAST_IDS_MAX:
        kept = _semi_filter(filtered, _collect_ids(winners, id_col), id_col, keep=True)
    else:
        kept = filtered.join(
            winners.select_columns([id_col]),
            join_type="inner",
            on=(id_col,),
            num_partitions=num_partitions,
        )

    if drop_near_dups:
        pairs = minhash_lsh_dedup(
            filtered, id_col=id_col, text_col=text_col, threshold=near_dup_threshold
        )
        if cluster_exact:
            from sqlgrep_ray.stages.cc import connected_components

            comp = connected_components(pairs)
            losers = comp.map_batches(
                lambda t: pa.table(
                    {id_col: t.filter(pc.not_equal(t["node"], t["component"]))["node"]}
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ).materialize()
        else:
            losers = pairs.map_batches(
                lambda t: pa.table({id_col: t["id_b"]}),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ).materialize()
        if losers.count() <= BROADCAST_IDS_MAX:
            loser_ids = pc.unique(_collect_ids(losers, id_col))
            kept = _semi_filter(kept, loser_ids, id_col, keep=False)
        else:
            kept = _anti_join(kept, losers, id_col, num_partitions)

    return kept
