"""Sources and sinks: parquet/text readers, routed parquet fan-out writers,
and the deterministic synthetic transcripts generator."""

from typing import Any, Optional

import pyarrow as pa
import ray.data


def strip_schema_metadata(t: pa.Table) -> pa.Table:
    """Drop schema-level metadata (zero-copy). pandas-written parquet
    carries a b'pandas' dict that breaks Ray's schema hashing and floods the
    logs with 'Failed to hash the schemas (for deduplication)' warnings."""
    if t.schema.metadata:
        return t.replace_schema_metadata(None)
    return t


def read_parquet_clean(paths: Any, **kwargs) -> "ray.data.Dataset":
    """``ray.data.read_parquet`` + schema-metadata strip (fuses with the
    read; keeps real warnings visible downstream)."""
    return ray.data.read_parquet(paths, **kwargs).map_batches(
        strip_schema_metadata, batch_format="pyarrow", zero_copy_batch=True
    )
