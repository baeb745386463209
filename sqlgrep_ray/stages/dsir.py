"""DSIR-style importance weighting — domain-targeted data selection.

Data Selection via Importance Resampling (Xie et al. 2023): weight each
corpus document by the log-likelihood ratio between a TARGET-domain n-gram
LM and a BACKGROUND (raw-corpus) LM, then keep the high-weight tail —
"pick web text that looks like the domain you care about". Composes the
``stages/lmscore.py`` primitives: both models are byte-trigram LMs trained
by this engine; one stateless ``map_batches`` scores each doc against the
two broadcast models in a single pass (trigram codes are extracted once).

Output: (id, n_trigrams, log_ratio_per_char) — positive means
"target-like". Selection = a simple threshold filter, or feed the weights
into ``sample.hash_sample``-style deterministic acceptance downstream.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from sqlgrep_ray.stages.lmscore import _V, _norm, _tri_codes


def _log2p(codes: np.ndarray, model_arrays, denom: float) -> np.ndarray:
    rc, rcnt = model_arrays
    if not len(rc):
        return np.full(len(codes), np.log2(1.0 / denom))
    idx = np.searchsorted(rc, codes)
    idx_c = np.minimum(idx, len(rc) - 1)
    found = rc[idx_c] == codes
    cnt = np.where(found, rcnt[idx_c], 0)
    return np.log2((cnt + 1.0) / denom)


def importance_weights(
    ds: "ray.data.Dataset",
    target_model: "tuple[np.ndarray, np.ndarray, int]",
    background_model: "tuple[np.ndarray, np.ndarray, int]",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """(id, n_trigrams, log_ratio_per_char) per document with ≥ 3
    normalized bytes: mean log2 P_target(tri) − log2 P_background(tri)."""
    t_ref = ray.put((target_model[0], target_model[1]))
    b_ref = ray.put((background_model[0], background_model[1]))
    t_denom = float(target_model[2] + _V)
    b_denom = float(background_model[2] + _V)

    def score(t: pa.Table) -> pa.Table:
        tm, bm = ray.get(t_ref), ray.get(b_ref)
        col = t[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        codes, rows = _tri_codes(_norm(pc.fill_null(col, "")))
        n = t.num_rows
        ntri = np.zeros(n, dtype=np.int64)
        acc = np.zeros(n, dtype=np.float64)
        if len(codes):
            ratio = _log2p(codes, tm, t_denom) - _log2p(codes, bm, b_denom)
            np.add.at(ntri, rows, 1)
            np.add.at(acc, rows, ratio)
        keep = ntri > 0
        out = np.zeros(n, dtype=np.float64)
        out[keep] = acc[keep] / ntri[keep]
        return pa.table(
            {
                id_col: t[id_col].filter(pa.array(keep)),
                "n_trigrams": pa.array(ntri[keep]),
                "log_ratio_per_char": pa.array(out[keep]),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    )


def select_target_like(
    ds: "ray.data.Dataset",
    target_model,
    background_model,
    min_log_ratio: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Documents whose importance weight clears ``min_log_ratio`` — the
    thresholded form of DSIR selection (ids only; semi-join the corpus to
    recover payloads, exactly like the curate keep-set)."""
    w = importance_weights(
        ds, target_model, background_model, id_col=id_col, text_col=text_col
    )
    return w.map_batches(
        lambda t: t.filter(pc.greater(t["log_ratio_per_char"], min_log_ratio)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
