"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json). Implementations live in
``sqlgrep_ray.pipelines.contract``.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

# the transcript oracles read the deterministic generated parquet from /tmp;
# materialize it up-front so the oracle side never races the generator
# (idempotent: a _DONE marker short-circuits).
from sqlgrep_ray.sources.synth import ensure_transcripts as _ensure

_ensure(0.01)
_ensure(0.001)


def entry() -> Any:
    """Flagship pipeline (parse → enrich → route → aggregate) on sf0.001."""
    from sqlgrep_ray.pipelines.contract import q_flagship_sink_counts

    return q_flagship_sink_counts("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2 (plus
    the training-data additions). Each callable takes ``sf_dir``."""
    from sqlgrep_ray.pipelines.contract import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (same result columns/names).
    Keys absent here (dsir_weights, curate_full, kmeans_clusters,
    lang_quality, multimodal_features) are probabilistic / heuristic /
    float-valued — rows-only checks."""
    from sqlgrep_ray.pipelines.contract import ORACLES

    return dict(ORACLES)
