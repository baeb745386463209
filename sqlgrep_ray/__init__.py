"""sqlgrep_ray — a Ray-Data-native parse → enrich → route → aggregate engine.

A from-scratch rebuild of the query / data-processing capabilities of
svenslaggare/sqlgrep (reference at /root/reference, v0.8.2) expressed as
idiomatic Ray Data pipelines: regex/JSON table definitions compile to
vectorized ``map_batches`` extraction stages over zero-copy Arrow batches,
WHERE/projection become compiled pyarrow.compute expressions, GROUP BY
aggregates become combiner-first ``groupby`` shuffles, and the single join
shape (small side fully in memory, see reference ``src/join.rs:15-79``)
becomes a broadcast hash join inside an actor-pool stage.

Nothing in this package calls ``ray.init`` / ``ray.shutdown`` — sessions are
owned by test fixtures, bench.py, and CLI entry points only.
"""

from sqlgrep_ray.schema import (  # noqa: F401
    VType,
    INT,
    FLOAT,
    BOOL,
    STRING,
    TIMESTAMP,
    INTERVAL,
    array_of,
    RegexRef,
    RegexCapture,
    MultiRegex,
    JsonPath,
    ColumnDef,
    PatternDef,
    TableDef,
)

from sqlgrep_ray.api import (  # noqa: F401
    FollowFileIterator,
    ReadLinesIterator,
    Tables,
)
from sqlgrep_ray.explain import explain_sql  # noqa: F401
from sqlgrep_ray.sqlfront import parse, parse_query, parse_table_defs  # noqa: F401

__version__ = "0.1.0"
