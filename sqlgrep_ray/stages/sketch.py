"""Mergeable sketches: HyperLogLog distinct counts, Misra-Gries heavy
hitters, KLL quantiles.

HyperLogLog approximate COUNT(DISTINCT) — mergeable fixed-size sketch.

The scale path for distinct counting: the exact paths
(``aggregate.py`` holistic set, ``skew.salted_count_distinct``) shuffle
every distinct value at least once; a HyperLogLog register array is
2^p bytes REGARDLESS of cardinality, so at 100 TB the whole reduction
moves kilobytes. Standard estimator (Flajolet et al. 2007) with the
small-range linear-counting correction; expected relative error ≈
1.04/√(2^p) (~0.8% at the default p=14).

Ray-Data shape — combiner-first, no driver state:

1. per-block combine: vectorized 64-bit hash (fixed-key siphash via
   ``pandas.util.hash_pandas_object`` — deterministic across worker
   processes) → register index = top ``p`` bits, rank = leading-zero count
   of the rest + 1 → per-block register array by ``np.maximum.at``;
2. merge: element-wise register max, two-level (each merge batch folds ≤
   ``merge_batch`` partial rows, then one final fold) so no single task
   ever holds more than ``merge_batch`` × 2^p bytes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from sqlgrep_ray.stages.textnorm import split_whitespace

_ALPHA = {4: 0.673, 5: 0.697, 6: 0.709}


def _alpha(m: int) -> float:
    return _ALPHA.get(int(np.log2(m)), 0.7213 / (1 + 1.079 / m))


def _hash64(arr: pa.Array) -> np.ndarray:
    s = pd.Series(arr.to_pandas())
    return pd.util.hash_pandas_object(s, index=False).to_numpy()  # uint64


def _block_registers(values: pa.Array, p: int) -> np.ndarray:
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    h = _hash64(values)
    if len(h) == 0:
        return regs
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h & np.uint64((1 << (64 - p)) - 1)
    # bit_length via frexp exponent — exact while 64-p ≤ 52 (p ≥ 12)
    _, exp = np.frexp(w.astype(np.float64))
    rank = np.where(w == 0, 64 - p + 1, 64 - p - exp + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def _estimate(regs: np.ndarray, p: int) -> int:
    m = 1 << p
    est = _alpha(m) * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)  # linear counting, small range
    return int(round(est))


def approx_count_distinct(
    ds: "ray.data.Dataset",
    col: str,
    p: int = 14,
    merge_batch: int = 256,
) -> int:
    """Approximate number of distinct non-null values of ``col``."""
    if not 12 <= p <= 18:
        raise ValueError("p must be in [12, 18] (frexp rank path)")

    def block(t: pa.Table) -> pa.Table:
        c = t[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        c = c.drop_null()
        return pa.table({"regs": pa.array([_block_registers(c, p).tobytes()])})

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            # empty block (e.g. repartition of an empty dataset): all-zero
            # registers are the HLL identity element
            return pa.table(
                {"regs": pa.array([np.zeros(1 << p, dtype=np.uint8).tobytes()])}
            )
        stacked = np.stack(
            [np.frombuffer(b, dtype=np.uint8) for b in t["regs"].to_pylist()]
        )
        return pa.table({"regs": pa.array([stacked.max(axis=0).tobytes()])})

    partials = (
        ds.select_columns([col])
        .map_batches(block, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(merge, batch_format="pyarrow", batch_size=merge_batch)
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow")
    )
    rows = partials.take_all()
    if not rows:  # zero input blocks: nothing ever ran
        return 0
    final = rows[0]["regs"]
    return _estimate(np.frombuffer(final, dtype=np.uint8), p)


def hll_error_bound(p: int) -> float:
    """Expected relative standard error of the estimate at precision p."""
    return 1.04 / np.sqrt(1 << p)


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters — mergeable frequent-items summary
# ---------------------------------------------------------------------------


def _mg_compress(t: pa.Table, k: int) -> pa.Table:
    """Keep ≤ k counters; subtract the (k+1)-th largest count from the
    survivors (the Misra-Gries decrement — mergeable summaries, Agarwal
    et al. 2012). Counts become LOWER bounds, undercounting each item by
    at most N/(k+1) in total across all compressions."""
    if t.num_rows <= k:
        return t
    counts = t["count"].to_numpy(zero_copy_only=False)
    order = np.argsort(-counts, kind="stable")
    thresh = counts[order[k]]
    keep_idx = order[:k]
    new_counts = counts[keep_idx] - thresh
    pos = new_counts > 0
    return pa.table(
        {
            "item": t["item"].take(pa.array(keep_idx[pos])),
            "count": pa.array(new_counts[pos]),
        }
    )


def heavy_hitters(
    ds: "ray.data.Dataset",
    col: str,
    k: int = 256,
    merge_rows: int = 65536,
) -> "ray.data.Dataset":
    """Approximate top frequent values of ``col``: every item with true
    frequency > N/(k+1) is guaranteed present; reported counts are lower
    bounds within N/(k+1) of truth. The summary is ≤ k rows per block and
    the merge is two-level — nothing proportional to the distinct-value
    count ever shuffles (the exact path, ``vocab.token_frequencies``,
    moves the whole vocabulary)."""

    def block(t: pa.Table) -> pa.Table:
        c = t[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        vc = pc.value_counts(c.drop_null())
        local = pa.table({"item": vc.field("values"), "count": vc.field("counts")})
        return _mg_compress(local, k)

    def merge(t: pa.Table) -> pa.Table:
        summed = pa.TableGroupBy(t, "item").aggregate([("count", "sum")])
        summed = summed.rename_columns(["item", "count"])
        return _mg_compress(summed, k)

    out = (
        ds.select_columns([col])
        .map_batches(block, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(merge, batch_format="pyarrow", batch_size=merge_rows)
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow")
    )
    return out.sort(["count", "item"], descending=[True, False])


def grouped_approx_distinct(
    ds: "ray.data.Dataset",
    key: str,
    col: str,
    p: int = 12,
    out_col: str = "approx_distinct",
) -> "ray.data.Dataset":
    """Per-group approximate COUNT(DISTINCT col): one HLL register array
    per key, merged by register max. The scale path for per-key
    cardinality: the exact paths ship every distinct (key, value) pair
    through a shuffle; here each block contributes ≤ groups-per-block rows
    of 2^p bytes and the exchange carries keys × 2^p bytes total,
    independent of the value cardinality. Block pass is fully vectorized:
    keys dictionary-encoded once, registers for ALL groups updated with a
    single ``np.maximum.at`` on a flat (group × register) array. Error ≈
    1.04/√2^p (~1.6% at p=12) per group; small groups benefit from the
    linear-counting correction (exact-ish at low cardinality)."""
    if not 12 <= p <= 18:
        raise ValueError("p must be in [12, 18] (frexp rank path)")
    m = 1 << p

    def block(t: pa.Table) -> pa.Table:
        t = t.select([key, col])
        mask = pc.and_kleene(
            pc.is_valid(t[key]), pc.is_valid(t[col])
        )
        t = t.filter(pc.fill_null(mask, False))
        if t.num_rows == 0:
            return pa.table(
                {key: pa.array([], t.schema.field(key).type),
                 "regs": pa.array([], pa.binary())}
            )
        karr = t[key]
        if isinstance(karr, pa.ChunkedArray):
            karr = karr.combine_chunks()
        dic = karr.dictionary_encode()
        gidx = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = dic.dictionary
        h = _hash64(t[col].combine_chunks() if isinstance(t[col], pa.ChunkedArray) else t[col])
        ridx = (h >> np.uint64(64 - p)).astype(np.int64)
        w = h & np.uint64((1 << (64 - p)) - 1)
        _, exp = np.frexp(w.astype(np.float64))
        rank = np.where(w == 0, 64 - p + 1, 64 - p - exp + 1).astype(np.uint8)
        regs = np.zeros(len(uniq) * m, dtype=np.uint8)
        np.maximum.at(regs, gidx * m + ridx, rank)
        return pa.table(
            {
                key: uniq,
                "regs": pa.array(
                    [regs[g * m:(g + 1) * m].tobytes() for g in range(len(uniq))],
                    pa.binary(),
                ),
            }
        )

    def add_bucket(t: pa.Table) -> pa.Table:
        # block-stable key hash via the shared helper (raw
        # hash_pandas_object was only safe here because block() drops
        # null keys; _bucket_ids canonicalizes regardless)
        from sqlgrep_ray.stages.window import _bucket_ids

        return t.append_column("__b", _bucket_ids(t, key, 64))

    def merge_bucket(g: pa.Table) -> pa.Table:
        # ONE vectorized pass per bucket, not per key: sort by key, stack
        # all register rows into an (n, m) matrix, per-key max via
        # maximum.reduceat on the key-run starts, then a vectorized
        # estimator over all keys at once
        g = g.drop_columns(["__b"])
        n = g.num_rows
        if n == 0:
            return pa.table(
                {
                    key: g[key][:0].combine_chunks(),
                    out_col: pa.array([], pa.int64()),
                }
            )
        order = pc.sort_indices(g, [(key, "ascending")])
        g = g.take(order)
        karr = g[key].combine_chunks()
        same = pc.fill_null(
            pc.equal(karr.slice(1), karr.slice(0, n - 1)), False
        ) if n > 1 else pa.array([], pa.bool_())
        key_change = np.r_[
            True, ~same.to_numpy(zero_copy_only=False).astype(bool)
        ]
        starts = np.flatnonzero(key_change)
        mat = np.frombuffer(
            b"".join(g["regs"].to_pylist()), dtype=np.uint8
        ).reshape(n, m)
        per_key = np.maximum.reduceat(mat, starts, axis=0)
        # vectorized HLL estimator with linear-counting correction
        est = (
            _alpha(m) * m * m
            / np.sum(np.exp2(-per_key.astype(np.float64)), axis=1)
        )
        zeros = np.count_nonzero(per_key == 0, axis=1)
        lin = m * np.log(m / np.maximum(zeros, 1))
        est = np.where((est <= 2.5 * m) & (zeros > 0), lin, est)
        return pa.table(
            {
                key: karr.take(pa.array(starts)),
                out_col: pa.array(np.rint(est).astype(np.int64)),
            }
        )

    return (
        ds.map_batches(block, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(merge_bucket, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# KLL quantile sketch — mergeable approximate percentiles
# ---------------------------------------------------------------------------


def _kll_cap(k: int, level: int, top: int) -> int:
    """Compactor capacity: k at the top level, decaying by 2/3 per level
    below (Karnin-Lang-Liberty 2016). Floor of 8 keeps tiny levels sane."""
    return max(8, int(np.ceil(k * (2.0 / 3.0) ** (top - level))))


def _kll_compact(values: np.ndarray, levels: np.ndarray, k: int):
    """Compaction cascade: any over-capacity level is sorted and every
    other item is promoted one level up (weight doubles); the remainder is
    dropped. An odd-length buffer retains its largest item at the level so
    total weight is always preserved exactly. Parity of the kept lane is
    derived deterministically from (buffer length, level) — reproducible
    for a fixed merge order; approximation guarantees are empirical-grade
    (tested), not adversarial-grade (the classic analysis randomizes the
    parity coin)."""
    while True:
        top = int(levels.max()) if len(levels) else 0
        done = True
        for lvl in range(top + 1):
            sel = levels == lvl
            n_l = int(np.count_nonzero(sel))
            if n_l <= _kll_cap(k, lvl, top):
                continue
            done = False
            buf = np.sort(values[sel])
            keep_values = [values[~sel]]
            keep_levels = [levels[~sel]]
            if n_l % 2 == 1:
                keep_values.append(buf[-1:])
                keep_levels.append(np.array([lvl], dtype=np.int8))
                buf = buf[:-1]
            parity = (len(buf) ^ lvl) & 1
            promoted = buf[parity::2]
            keep_values.append(promoted)
            keep_levels.append(np.full(len(promoted), lvl + 1, dtype=np.int8))
            values = np.concatenate(keep_values)
            levels = np.concatenate(keep_levels).astype(np.int8)
            break  # re-derive top before compacting further
        if done:
            return values, levels


def approx_quantiles(
    ds: "ray.data.Dataset",
    col: str,
    qs=(0.5, 0.9, 0.99),
    k: int = 2048,
    merge_rows: int = 65536,
) -> list[float]:
    """Approximate quantiles of ``col`` via a mergeable KLL sketch.

    The scale path for percentiles: the exact path
    (``stages/quantile.distributed_percentile``) needs a sample pass plus a
    bracket-collect pass over the data; a KLL sketch is one streaming pass
    and O(k) state — at 100 TB the whole reduction moves a few thousand
    (value, level) pairs per block. Rank error is O(1/k) of N in practice
    (pytest pins < 2/k on uniform and zipf data).

    Below ``k`` total values no compaction ever fires, so the sketch is
    EXACT and reproduces the engine's truncation-index percentile
    (0-based ``floor(q*N)``, the reference's PERCENTILE contract) — the
    driver oracle runs in that regime; accuracy beyond it is pinned by
    pytest. Weight bookkeeping is exact (sum of 2^level == N always).

    Returns one float per entry of ``qs``; NaN-free input assumed, NULLs
    dropped, empty input → empty list.
    """

    def block(t: pa.Table) -> pa.Table:
        c = t[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        v = c.drop_null().cast(pa.float64()).to_numpy(zero_copy_only=False)
        lv = np.zeros(len(v), dtype=np.int8)
        v, lv = _kll_compact(v, lv, k)
        return pa.table({"value": pa.array(v), "level": pa.array(lv)})

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "value": pa.array([], pa.float64()),
                    "level": pa.array([], pa.int8()),
                }
            )
        v = t["value"].to_numpy(zero_copy_only=False)
        lv = t["level"].to_numpy(zero_copy_only=False).astype(np.int8)
        v, lv = _kll_compact(v, lv, k)
        return pa.table({"value": pa.array(v), "level": pa.array(lv)})

    final = (
        ds.select_columns([col])
        .map_batches(block, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(merge, batch_format="pyarrow", batch_size=merge_rows)
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow")
        .take_all()
    )
    if not final:
        return []
    values = np.array([r["value"] for r in final])
    weights = np.exp2([r["level"] for r in final]).astype(np.int64)
    if len(values) == 0:
        return []
    order = np.argsort(values, kind="stable")
    values, weights = values[order], weights[order]
    cumw = np.cumsum(weights)
    n = int(cumw[-1])
    out = []
    for q in qs:
        t_pos = min(int(np.floor(q * n)), n - 1)
        idx = min(int(np.searchsorted(cumw, t_pos, side="right")), len(values) - 1)
        out.append(float(values[idx]))
    return out


def heavy_tokens(
    ds: "ray.data.Dataset",
    k: int = 256,
    text_col: str = "text",
    lower: bool = True,
    merge_rows: int = 65536,
) -> "ray.data.Dataset":
    """Heavy hitters over the whitespace-tokenized text column (the
    sketch-path complement of ``vocab.top_tokens``)."""

    def toks(t: pa.Table) -> pa.Table:
        c = t[text_col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        filled = pc.fill_null(c, "")
        if lower:
            filled = pc.utf8_lower(filled)
        flat = pc.list_flatten(split_whitespace(filled))
        flat = flat.filter(pc.not_equal(flat, ""))
        return pa.table({"token": flat})

    tokens = ds.select_columns([text_col]).map_batches(
        toks, batch_format="pyarrow", zero_copy_batch=True
    )
    return heavy_hitters(tokens, "token", k=k, merge_rows=merge_rows)
