"""Canonical text normalization primitives — ONE definition for both paths.

Every text operator in this engine has a vectorized batch kernel and a
per-row reference implementation (used by tests and small paths). Python's
``str.lower()`` applies FULL Unicode case mapping ('İ' → 'i' + combining
dot, length changes) while Arrow's ``utf8_lower`` applies utf8proc's
simple non-expanding mapping; ``str.split()`` also treats a few legacy
control characters (FS/GS/RS/US) as whitespace where utf8proc does not.
To keep batch and per-row results bit-identical on ALL inputs (pinned by
hypothesis property tests), the per-row helpers below route through the
same Arrow kernels. The engine's normalization semantics are therefore
"utf8proc lowercase + utf8proc whitespace split"; the DuckDB oracles agree
on ASCII, which is all the cross-engine contract promises.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def arrow_lower(text: str) -> str:
    """utf8proc simple lowercase of one string (batch-kernel parity)."""
    return pc.utf8_lower(pa.array([text], pa.string()))[0].as_py()


def arrow_split(text: str) -> "list[str]":
    """utf8proc whitespace tokens, empty pieces dropped (batch parity)."""
    pieces = pc.utf8_split_whitespace(pa.array([text], pa.string()))[0].as_py()
    return [p for p in pieces if p]
