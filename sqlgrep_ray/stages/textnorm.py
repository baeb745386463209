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

# The canonical whitespace class: Unicode White_Space plus the legacy
# separators U+001C-001F (matching utf8proc's isspace). Expressed as an RE2
# class because pyarrow 16.1's `utf8_split_whitespace` kernel is
# NONDETERMINISTIC on multi-row arrays containing multi-byte UTF-8
# (observed: the same 6-row input intermittently yields a piece containing
# a literal space — reproduced 2026-08-17, see tests/test_property.py) —
# `split_pattern_regex` is stable and byte-equivalent on every input we
# property-test.
WHITESPACE_RE = r"[\t-\r\x1c-\x1f \x85\p{Zs}\p{Zl}\p{Zp}]+"


def split_whitespace(arr: "pa.Array | pa.ChunkedArray"):
    """Deterministic whitespace split of a string array (utf8proc
    semantics; the safe replacement for ``pc.utf8_split_whitespace``).
    Returns a list<string> array; empty edge pieces remain (filter like
    ``str.split()`` callers always did)."""
    out = pc.split_pattern_regex(arr, pattern=WHITESPACE_RE)
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    return out


def arrow_lower(text: str) -> str:
    """utf8proc simple lowercase of one string (batch-kernel parity)."""
    return pc.utf8_lower(pa.array([text], pa.string()))[0].as_py()


def arrow_split(text: str) -> "list[str]":
    """Whitespace tokens of one string, empty pieces dropped (batch
    parity)."""
    pieces = split_whitespace(pa.array([text], pa.string()))[0].as_py()
    return [p for p in pieces if p]
