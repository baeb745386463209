"""Batch-transform stages: each module exposes callables/classes meant to be
passed to ``Dataset.map_batches(..., batch_format="pyarrow")``."""
