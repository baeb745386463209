"""Vectorized regex / split / JSON extraction — the parse stage.

This is the Ray-Data rebuild of the reference's per-line extraction loop
(``src/data_model.rs:75-99`` ``TableDefinition::extract`` +
``ParsingInput::new`` ``:172-199`` + ``extract_using_regex`` ``:329-365``):
one :class:`~sqlgrep_ray.schema.TableDef` compiles to a single callable
suitable for ``Dataset.map_batches(fn, batch_format="pyarrow",
zero_copy_batch=True)``. Each named pattern runs ONCE per batch over the text
column (``pyarrow.compute.extract_regex`` — RE2 — when the pattern is
compatible, a compiled-``re`` Python fallback otherwise); columns are then
materialized per their parsing rule with Arrow kernels, and the batch is
filtered by the reference's row-admission rules:

* ``NOT NULL`` column NULL ⇒ drop row (``data_model.rs:88-93``);
* otherwise keep the row iff ≥1 declared column is non-NULL
  (``Row::any_result``, ``data_model.rs:23-25``).

Divergence (documented): RE2/``pc.extract_regex`` reports a non-participating
optional group as ``''``, Rust's regex crate as ``None``; we normalise
empty-string captures to NULL, so a group that legitimately matches the empty
string is also NULL (the reference's own testdata never distinguishes these).

Regex compilation happens once per worker process via a module-level cache —
the Ray analogue of compiling at CREATE TABLE (``data_model.rs:44-50``).
"""

from __future__ import annotations

import json
import re

try:  # ~4-8x faster JSON parse when available; stdlib fallback otherwise
    import orjson as _fastjson

    def _json_loads(s: str):
        return _fastjson.loads(s)

except ImportError:  # pragma: no cover
    def _json_loads(s: str):
        return json.loads(s)
from typing import Any, Callable, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from sqlgrep_ray.schema import (
    BOOL,
    ColumnDef,
    JsonPath,
    MultiRegex,
    PatternDef,
    RegexCapture,
    RegexRef,
    TableDef,
    VType,
)

# ---------------------------------------------------------------------------
# Regex helpers
# ---------------------------------------------------------------------------

_MONTHS = {
    "jan": 1, "feb": 2, "mar": 3, "apr": 4, "may": 5, "jun": 6,
    "jul": 7, "aug": 8, "sep": 9, "oct": 10, "nov": 11, "dec": 12,
}


def name_unnamed_groups(pattern: str) -> tuple[str, int]:
    """Rewrite unnamed capturing groups ``(...)`` to ``(?P<gN>...)``.

    Returns (rewritten pattern, number of capturing groups). Needed because
    ``pc.extract_regex`` requires named groups. Handles escapes, char classes,
    and ``(?:`` / ``(?=`` / ``(?!`` / ``(?P<...>`` non-capturing forms.
    """
    out: list[str] = []
    i = 0
    n = 0
    in_class = False
    L = len(pattern)
    while i < L:
        ch = pattern[i]
        if ch == "\\" and i + 1 < L:
            out.append(pattern[i : i + 2])
            i += 2
            continue
        if in_class:
            if ch == "]":
                in_class = False
            out.append(ch)
            i += 1
            continue
        if ch == "[":
            in_class = True
            out.append(ch)
            i += 1
            continue
        if ch == "(":
            if pattern.startswith("(?", i):
                # (?P<name>...) is capturing; (?:, (?=, (?!, (?<=, (?<! are not
                if pattern.startswith("(?P<", i) or pattern.startswith("(?<", i):
                    n += 1
                out.append(ch)
                i += 1
                continue
            n += 1
            out.append(f"(?P<g{n}>")
            i += 1
            continue
        out.append(ch)
        i += 1
    return "".join(out), n


class _CompiledPattern:
    """A pattern compiled for batch execution; RE2 via pyarrow when possible."""

    def __init__(self, pdef: PatternDef):
        self.pdef = pdef
        self.mode = pdef.mode
        self.py = re.compile(pdef.regex)
        self.named_pattern: Optional[str] = None
        self.n_groups = self.py.groups
        if pdef.mode == "captures":
            named, n = name_unnamed_groups(pdef.regex)
            # Probe RE2 compatibility once.
            try:
                pc.extract_regex(pa.array([""], pa.string()), pattern=named)
                self.named_pattern = named
                self.n_groups = n
            except pa.ArrowException:
                self.named_pattern = None

    def extract(self, text: pa.Array) -> tuple[dict[int, pa.Array], pa.Array]:
        """Run the pattern over a string array.

        Returns ``({group_index: string array}, match_mask)``. Group 0 is the
        whole line for split mode / the whole match for captures mode
        (reference ``data_model.rs:181-185`` prepends the line at index 0 for
        splits; ``capture_result.get(0)`` is the full match). Capture groups /
        split fields are 1-based. ``match_mask[i]`` is True iff the pattern
        produced a result for line i — for split mode that is EVERY non-null
        line (``ParsingInput::new`` inserts split results unconditionally,
        ``data_model.rs:181-185``); for captures it is the lines the regex
        matched. Non-matching lines give NULL in every group.
        """
        if self.mode == "split":
            return self._extract_split(text)
        if self.named_pattern is not None:
            structs = pc.extract_regex(text, pattern=self.named_pattern)
            mask = pc.is_valid(structs)
            out: dict[int, pa.Array] = {}
            for g in range(1, self.n_groups + 1):
                arr = pc.struct_field(structs, f"g{g}")
                # normalise non-participating-group '' → NULL (see module doc)
                arr = pc.if_else(pc.equal(arr, ""), pa.nulls(len(arr), pa.string()), arr)
                out[g] = arr
            return out, mask
        return self._extract_python(text)

    def _extract_python(self, text: pa.Array) -> tuple[dict[int, pa.Array], pa.Array]:
        pat = self.py
        cols: list[list[Optional[str]]] = [[] for _ in range(pat.groups + 1)]
        mask: list[bool] = []
        for s in text.to_pylist():
            m = pat.search(s) if s is not None else None
            mask.append(m is not None)
            if m is None:
                for c in cols:
                    c.append(None)
            else:
                for g, c in enumerate(cols):
                    c.append(m.group(g))
        return (
            {g: pa.array(cols[g], pa.string()) for g in range(pat.groups + 1)},
            pa.array(mask),
        )

    def _extract_split(self, text: pa.Array) -> tuple[dict[int, pa.Array], pa.Array]:
        lists = pc.split_pattern_regex(text, pattern=self.pdef.regex)
        out: dict[int, pa.Array] = {0: text.cast(pa.string())}
        for i in getattr(self, "_needed_split_indices", ()):
            if i == 0:
                continue
            out[i] = _list_get(lists, i - 1)
        return out, pc.is_valid(text)


def _list_get(lists: pa.Array, idx: int) -> pa.Array:
    """Element ``idx`` (0-based) of each list, NULL when out of range."""
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    offsets = lists.offsets.to_numpy(zero_copy_only=False)
    lengths = offsets[1:] - offsets[:-1]
    valid = lengths > idx
    take_idx = np.where(valid, offsets[:-1] + idx, 0).astype(np.int64)
    taken = lists.values.take(pa.array(take_idx))
    return pc.if_else(pa.array(valid), taken, pa.nulls(len(lists), lists.values.type))


_PATTERN_CACHE: dict[tuple[str, str, str], _CompiledPattern] = {}


def _compiled(pdef: PatternDef) -> _CompiledPattern:
    key = (pdef.name, pdef.regex, pdef.mode)
    cp = _PATTERN_CACHE.get(key)
    if cp is None:
        cp = _CompiledPattern(pdef)
        _PATTERN_CACHE[key] = cp
    return cp


# ---------------------------------------------------------------------------
# String → typed-value coercion (reference ValueType::parse, model.rs:367-394)
# ---------------------------------------------------------------------------


def coerce_strings(arr: pa.Array, vtype: VType) -> pa.Array:
    """Parse a string array into ``vtype``; unparseable values become NULL."""
    k = vtype.kind
    if k == "string":
        return arr.cast(pa.string())
    if k == "int":
        return _safe_cast(arr, pa.int64(), _parse_int)
    if k == "float":
        return _safe_cast(arr, pa.float64(), _parse_float)
    if k == "bool":
        vals = [
            None if s is None else (True if s == "true" else False if s == "false" else None)
            for s in arr.to_pylist()
        ]
        return pa.array(vals, pa.bool_())
    if k == "timestamp":
        try:
            return pc.strptime(arr, format="%Y-%m-%d %H:%M:%S", unit="us")
        except pa.ArrowException:
            out = []
            for s in arr.to_pylist():
                if s is None:
                    out.append(None)
                    continue
                try:
                    import datetime as _dt

                    out.append(_dt.datetime.strptime(s, "%Y-%m-%d %H:%M:%S"))
                except ValueError:
                    out.append(None)
            return pa.array(out, pa.timestamp("us"))
    if k == "interval":
        out = []
        for s in arr.to_pylist():
            out.append(_parse_interval_us(s))
        return pa.array(out, pa.duration("us"))
    if k == "array":
        raise ValueError("cannot coerce a plain string into an array type")
    raise ValueError(f"unknown vtype {vtype}")


def _parse_int(s: str) -> Optional[int]:
    try:
        v = int(s, 10)
    except ValueError:
        return None
    return v if -(2**63) <= v < 2**63 else None


def _parse_float(s: str) -> Optional[float]:
    try:
        return float(s)
    except ValueError:
        return None


def _parse_interval_us(s: Optional[str]) -> Optional[int]:
    """``H:M:S`` → microseconds (reference model.rs:386-392)."""
    if s is None:
        return None
    parts = s.split(":")
    if len(parts) != 3:
        return None
    try:
        h, m, sec = (int(p, 10) for p in parts)
    except ValueError:
        return None
    return ((h * 60 + m) * 60 + sec) * 1_000_000


def _safe_cast(arr: pa.Array, target: pa.DataType, fallback: Callable[[str], Any]) -> pa.Array:
    try:
        return arr.cast(target)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        return pa.array(
            [None if s is None else fallback(s) for s in arr.to_pylist()], target
        )


# ---------------------------------------------------------------------------
# Multi-group builders (array / timestamp) — data_model.rs:236-308
# ---------------------------------------------------------------------------


def _build_multi_array(groups: list[pa.Array], elem_type: VType) -> pa.Array:
    """N group arrays → fixed-width list column; all-NULL row ⇒ NULL row."""
    elems = [coerce_strings(g, elem_type) for g in groups]
    n = len(elems[0])
    k = len(elems)
    flat = pa.concat_arrays([e.combine_chunks() if isinstance(e, pa.ChunkedArray) else e for e in elems])
    # interleave: row i gets [elems[0][i], ..., elems[k-1][i]]
    idx = (np.arange(n * k).reshape(n, k) % k) * n + np.arange(n * k).reshape(n, k) // k
    flat = flat.take(pa.array(idx.reshape(-1)))
    offsets = pa.array(np.arange(0, (n + 1) * k, k, dtype=np.int32))
    lst = pa.ListArray.from_arrays(offsets, flat)
    any_valid = np.zeros(n, dtype=bool)
    for e in elems:
        any_valid |= pc.is_valid(e).to_numpy(zero_copy_only=False)
    return pc.if_else(pa.array(any_valid), lst, pa.nulls(n, lst.type))


def _build_multi_timestamp(
    groups: list[pa.Array], microseconds: bool
) -> pa.Array:
    """Up to 7 part-arrays (y, mon, d, h, m, s, frac) → timestamp[us].

    Month may be a 3-letter English name (``data_model.rs:279-300``);
    the fractional part is milliseconds unless ``microseconds``
    (``data_model.rs:269-276``). Any unparseable/missing required part ⇒ NULL.
    """
    import pandas as pd

    n = len(groups[0])
    parts = []
    for j, g in enumerate(groups):
        if j == 1:  # month: name or number
            vals = []
            for s in g.to_pylist():
                if s is None:
                    vals.append(None)
                elif s.isdigit():
                    vals.append(int(s))
                else:
                    vals.append(_MONTHS.get(s[:3].lower()))
            parts.append(vals)
        else:
            parts.append(
                [None if s is None else _parse_int(s) for s in g.to_pylist()]
            )
    while len(parts) < 7:
        parts.append([0] * n)
    frac_mult = 1 if microseconds else 1000
    out: list[Optional[int]] = []
    for i in range(n):
        y, mo, d, h, mi, s, fr = (p[i] for p in parts)
        if None in (y, mo, d):
            out.append(None)
            continue
        h = h or 0
        mi = mi or 0
        s = s or 0
        fr = fr or 0
        try:
            ts = pd.Timestamp(year=y, month=mo, day=d, hour=h, minute=mi, second=s)
        except ValueError:
            out.append(None)
            continue
        out.append(ts.value // 1000 + fr * frac_mult)
    return pa.array(out, pa.timestamp("us"))


# ---------------------------------------------------------------------------
# JSON path extraction — data_model.rs:189-193, 368-420; coercion model.rs:413-432
# ---------------------------------------------------------------------------


def _json_walk(obj: Any, path: Sequence[Any]) -> Any:
    for step in path:
        if obj is None:
            return None
        if isinstance(step, int):
            if isinstance(obj, list) and 0 <= step < len(obj):
                obj = obj[step]
            else:
                return None
        else:
            if isinstance(obj, dict):
                obj = obj.get(step)
            else:
                return None
    return obj


def _json_coerce(v: Any, vtype: VType, convert: bool) -> Any:
    """JSON value → engine value by target type; mismatch ⇒ None.

    With ``convert``, a JSON *string* is re-parsed as the target type
    (``data_model.rs:314-320``).
    """
    if v is None:
        return None
    k = vtype.kind
    if convert and isinstance(v, str) and k != "string":
        if k == "int":
            return _parse_int(v)
        if k == "float":
            return _parse_float(v)
        if k == "bool":
            return True if v == "true" else False if v == "false" else None
        return None
    if k == "int":
        return v if isinstance(v, int) and not isinstance(v, bool) else None
    if k == "float":
        if isinstance(v, bool):
            return None
        if isinstance(v, (int, float)):
            return float(v)
        return None
    if k == "bool":
        return v if isinstance(v, bool) else None
    if k == "string":
        return v if isinstance(v, str) else None
    if k == "array":
        if not isinstance(v, list):
            return None
        return [_json_coerce(e, vtype.elem, convert) for e in v]
    return None


# ---------------------------------------------------------------------------
# The compiled extractor
# ---------------------------------------------------------------------------


class ParseTable:
    """``map_batches`` callable: raw-text batches → typed extracted batches.

    Use as a plain function object (stateless task) — regexes live in the
    per-process ``_PATTERN_CACHE`` — or as an actor-pool class when combined
    with expensive sibling state.

    Parameters
    ----------
    tdef : TableDef
    text_col : name of the raw-line column in the input batch.
    keep_cols : pass-through columns copied to the output (e.g. conv_id,
        turn_idx for the transcript pipeline).
    add_input_col : expose the raw line as pseudo-column ``input``
        (reference ``execution_engine.rs:342-353``).
    """

    def __init__(
        self,
        tdef: TableDef,
        text_col: str = "text",
        keep_cols: Sequence[str] = (),
        add_input_col: bool = False,
    ):
        self.tdef = tdef
        self.text_col = text_col
        self.keep_cols = list(keep_cols)
        self.add_input_col = add_input_col
        # which split indices each split pattern needs / which captures
        # patterns need group 0 (whole match ⇒ python-regex path)
        self._split_needs: dict[str, set[int]] = {}
        self._needs_group0: set[str] = set()
        for c in tdef.columns:
            refs = (
                (c.parsing.ref,)
                if isinstance(c.parsing, RegexCapture)
                else c.parsing.refs
                if isinstance(c.parsing, MultiRegex)
                else ()
            )
            for r in refs:
                p = tdef.pattern_map[r.pattern]
                if p.mode == "split":
                    self._split_needs.setdefault(p.name, set()).add(r.group)
                elif r.group == 0:
                    self._needs_group0.add(p.name)
        self._has_json = any(isinstance(c.parsing, JsonPath) for c in tdef.columns)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out, keep = self.extract_with_mask(batch)
        return out.filter(pa.array(keep))

    def extract_with_mask(self, batch: pa.Table) -> tuple[pa.Table, np.ndarray]:
        """Unfiltered extraction + the row-admission mask (used by the
        transcript router to enforce first-match priority across tables)."""
        text = batch[self.text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n = len(text)

        # 1) run each pattern once
        group_vals: dict[str, dict[int, pa.Array]] = {}
        match_masks: dict[str, pa.Array] = {}
        for pdef in self.tdef.patterns:
            cp = _compiled(pdef)
            if pdef.mode == "split":
                cp._needed_split_indices = sorted(self._split_needs.get(pdef.name, ()))
            if pdef.name in self._needs_group0 and cp.named_pattern is not None:
                group_vals[pdef.name], match_masks[pdef.name] = cp._extract_python(text)
            else:
                group_vals[pdef.name], match_masks[pdef.name] = cp.extract(text)

        # 2) parse JSON once per line iff any json column (data_model.rs:189-193)
        json_objs: Optional[list[Any]] = None
        if self._has_json:
            json_objs = []
            for s in text.to_pylist():
                # cheap candidate check: only objects/arrays can yield a path
                # value (bare JSON scalars never satisfy a .field/[i] access),
                # so skip json.loads — and its costly exception — otherwise
                if s is None or not s or s.lstrip()[0:1] not in ("{", "["):
                    json_objs.append(None)
                    continue
                try:
                    json_objs.append(_json_loads(s))
                except (ValueError, TypeError):
                    json_objs.append(None)

        # 3) materialize columns
        cols: dict[str, pa.Array] = {}
        for c in self.tdef.columns:
            cols[c.name] = self._materialize(c, group_vals, match_masks, json_objs, n)

        # 4) row-admission masks
        drop = np.zeros(n, dtype=bool)  # NOT NULL violations
        any_result = np.zeros(n, dtype=bool)
        for c in self.tdef.columns:
            valid = pc.is_valid(cols[c.name]).to_numpy(zero_copy_only=False)
            any_result |= valid
            if c.not_null:
                drop |= ~valid
        keep = any_result & ~drop

        out_cols: dict[str, Any] = {}
        for k in self.keep_cols:
            out_cols[k] = batch[k]
        if self.add_input_col:
            out_cols["input"] = text
        out_cols.update(cols)
        return pa.table(out_cols), keep

    # -- column materialization ------------------------------------------------

    def _materialize(
        self,
        c: ColumnDef,
        group_vals: dict[str, dict[int, pa.Array]],
        match_masks: dict[str, pa.Array],
        json_objs: Optional[list[Any]],
        n: int,
    ) -> pa.Array:
        if isinstance(c.parsing, RegexCapture):
            ref = c.parsing.ref
            raw = group_vals[ref.pattern].get(ref.group)
            if raw is None:
                raw = pa.nulls(n, pa.string())
            matched = match_masks[ref.pattern]
            if c.vtype == BOOL:
                # BOOLEAN = existence of the group WHEN the pattern produced a
                # result for the line; unmatched line ⇒ NULL → default
                # (data_model.rs:339-363: non-match falls through to default).
                arr: pa.Array = pc.if_else(
                    matched, pc.is_valid(raw), pa.nulls(n, pa.bool_())
                )
                raw_missing = pc.invert(pc.fill_null(matched, False))
            else:
                if c.trim:
                    raw = pc.utf8_trim_whitespace(raw)
                raw_missing = pc.is_null(raw)
                arr = coerce_strings(raw, c.vtype)
            if c.default is not None:
                # DEFAULT replaces a MISSING group / unmatched line, not a
                # failed parse (Value::from_option at data_model.rs:344 yields
                # Null, not default, on parse failure).
                arr = pc.if_else(
                    raw_missing, pa.scalar(c.default, c.vtype.to_arrow()), arr
                )
            if arr.type != c.vtype.to_arrow():
                arr = arr.cast(c.vtype.to_arrow())
            return arr
        if isinstance(c.parsing, MultiRegex):
            groups = []
            for ref in c.parsing.refs:
                g = group_vals[ref.pattern].get(ref.group)
                groups.append(g if g is not None else pa.nulls(n, pa.string()))
            if c.vtype.kind == "timestamp":
                arr = _build_multi_timestamp(groups, c.microseconds)
            elif c.vtype.kind == "array":
                arr = _build_multi_array(groups, c.vtype.elem)
            else:
                raise ValueError(
                    f"MultiRegex column {c.name!r} must be timestamp or array"
                )
        elif isinstance(c.parsing, JsonPath):
            assert json_objs is not None
            vals = [
                _json_coerce(_json_walk(o, c.parsing.path), c.vtype, c.convert)
                for o in json_objs
            ]
            arr = pa.array(vals, c.vtype.to_arrow())
            if c.trim and c.vtype.kind == "string":
                arr = pc.utf8_trim_whitespace(arr)
        else:
            raise ValueError(f"unknown parsing {c.parsing!r}")

        if c.default is not None:
            arr = pc.fill_null(arr, pa.scalar(c.default, c.vtype.to_arrow()))
        if arr.type != c.vtype.to_arrow():
            arr = arr.cast(c.vtype.to_arrow())
        return arr
