"""Embedding quantization — int8 storage for vector columns.

A 100-TB embedding store is 4× smaller in int8 with negligible retrieval
loss (the standard ANN-serving trade); this stage pair converts a
``list<float>`` column to (int8 codes + per-vector float scale) and back.
Symmetric per-vector absmax quantization: ``q = round(v / scale)``,
``scale = max|v| / 127`` — one numpy pass per batch, no shuffle, no state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def _mat(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return np.stack(col.to_numpy(zero_copy_only=False)).astype(np.float64)


def quantize_embeddings(
    ds: "ray.data.Dataset",
    vec_col: str = "embedding",
    codes_col: str = "q8",
    scale_col: str = "q8_scale",
    keep_vec: bool = False,
) -> "ray.data.Dataset":
    """Replace ``vec_col`` with int8 codes (binary, d bytes) + a float
    scale. ``keep_vec=True`` keeps the original column beside them."""

    def q(t: pa.Table) -> pa.Table:
        x = _mat(t[vec_col])
        scale = np.maximum(np.abs(x).max(axis=1), 1e-30) / 127.0
        codes = np.clip(np.round(x / scale[:, None]), -127, 127).astype(np.int8)
        if not keep_vec:
            t = t.drop_columns([vec_col])
        t = t.append_column(
            codes_col, pa.array([c.tobytes() for c in codes], pa.binary())
        )
        return t.append_column(scale_col, pa.array(scale, pa.float32()))

    return ds.map_batches(q, batch_format="pyarrow", zero_copy_batch=True)


def dequantize_embeddings(
    ds: "ray.data.Dataset",
    codes_col: str = "q8",
    scale_col: str = "q8_scale",
    vec_col: str = "embedding",
    dtype: str = "float32",
) -> "ray.data.Dataset":
    """Reconstruct ``vec_col`` (≤ scale/2 absolute error per element)."""

    def dq(t: pa.Table) -> pa.Table:
        codes = t[codes_col]
        if isinstance(codes, pa.ChunkedArray):
            codes = codes.combine_chunks()
        scales = t[scale_col].to_numpy(zero_copy_only=False).astype(np.float64)
        vecs = [
            (np.frombuffer(b, dtype=np.int8).astype(np.float64) * s).astype(dtype)
            for b, s in zip(codes.to_pylist(), scales)
        ]
        t = t.drop_columns([codes_col, scale_col])
        return t.append_column(vec_col, pa.array(vecs))

    return ds.map_batches(dq, batch_format="pyarrow", zero_copy_batch=True)
