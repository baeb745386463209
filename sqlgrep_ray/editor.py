"""Table editor — live-preview regex extraction against sample input.

The reference's ``--edit-table`` TUI (``src/table_editor.rs:19-60``, cursive,
Unix-only) loads a table definition plus an input file, caps the sample at
the first 1000 lines, and re-renders the extracted columns as the pattern is
edited; saving writes the definition file back.

Rebuild in two layers:

* :func:`preview` — the pure core: (TableDef, sample lines) → extraction
  preview (match/total counts + the extracted rows as a pyarrow table).
  Runs ``ParseTable`` directly on an in-memory batch — no Ray session, same
  parse semantics as the engine.
* :func:`run_editor` — a stdlib-``curses`` front-end over the core: shows
  the pattern(s) + columns + a preview pane, lets you edit a pattern line,
  re-previews on Enter, writes the definition file back on save. On a
  non-TTY (tests, pipes) it degrades to printing one preview snapshot.

Keys (TUI): Up/Down select pattern · e edit selected pattern ·
Enter apply · s save definitions · q quit.
"""

from __future__ import annotations

import os
import sys
from typing import Optional, Sequence

import pyarrow as pa

from sqlgrep_ray.schema import PatternDef, TableDef
from sqlgrep_ray.sqlfront import parse
from sqlgrep_ray.stages.parse import ParseTable

SAMPLE_LINES = 1000  # reference line cap (table_editor.rs:19-60)


def load_sample(input_file: str, limit: int = SAMPLE_LINES) -> list[str]:
    out: list[str] = []
    with open(input_file) as fh:
        for line in fh:
            out.append(line.rstrip("\n"))
            if len(out) >= limit:
                break
    return out


def preview(tdef: TableDef, lines: Sequence[str]) -> dict:
    """Extraction preview: rows that match ANY pattern, per-column values.

    Returns ``{"total": n, "matched": m, "table": pa.Table, "error": str?}``
    — an invalid regex reports the error instead of raising, so the editor
    loop can keep running while the user types (reference behavior)."""
    try:
        pt = ParseTable(tdef, "text")
        out = pt(pa.table({"text": pa.array(list(lines), pa.string())}))
    except Exception as ex:  # bad regex / defs while editing
        return {
            "total": len(lines),
            "matched": 0,
            "table": pa.table({}),
            "error": str(ex),
        }
    return {
        "total": len(lines),
        "matched": out.num_rows,
        "table": out,
        "error": None,
    }


def _replace_pattern(tdef: TableDef, name: str, regex: str) -> TableDef:
    pats = [
        PatternDef(p.name, regex, p.mode) if p.name == name else p
        for p in tdef.patterns
    ]
    return TableDef(tdef.name, pats, list(tdef.columns))


def render_table_def(tdef: TableDef) -> str:
    """TableDef → CREATE TABLE text (used when saving edits back)."""
    lines = [f"CREATE TABLE {tdef.name}("]
    entries: list[str] = []
    for p in tdef.patterns:
        rx = p.regex.replace("\\", "\\\\").replace("'", "''")
        mode = "split " if p.mode == "split" else ""
        entries.append(f"    {p.name} = {mode}'{rx}'")
    sql_names = {"string": "TEXT", "int": "INT", "float": "REAL",
                 "bool": "BOOLEAN", "timestamp": "TIMESTAMP"}

    def tname(vt) -> str:
        if vt.kind == "array":
            return tname(vt.elem) + "[]"
        return sql_names.get(vt.kind, vt.kind.upper())

    from sqlgrep_ray.schema import JsonPath, MultiRegex, RegexCapture, RegexRef

    for c in tdef.columns:
        parsing = c.parsing
        if isinstance(parsing, RegexCapture):
            ref = parsing.ref
            lhs = f"{ref.pattern}[{ref.group}]"
        elif isinstance(parsing, JsonPath):
            lhs = "{ " + "".join(
                f"[{p}]" if isinstance(p, int) else f".{p}" for p in parsing.path
            ) + " }"
        elif isinstance(parsing, MultiRegex):
            lhs = ", ".join(f"{r.pattern}[{r.group}]" for r in parsing.refs)
        else:  # pragma: no cover - unknown parsing kind
            lhs = "?"
        mods = []
        if c.not_null:
            mods.append("NOT NULL")
        if c.trim:
            mods.append("TRIM")
        if c.convert:
            mods.append("CONVERT")
        if c.microseconds:
            mods.append("MICROSECONDS")
        if c.default is not None:
            mods.append(f"DEFAULT {c.default!r}")
        suffix = (" " + " ".join(mods)) if mods else ""
        entries.append(f"    {lhs} => {c.name} {tname(c.vtype)}{suffix}")
    return "\n".join(lines + [",\n".join(entries), ");"]) + "\n"


def _format_preview(result: dict, width: int = 100, max_rows: int = 20) -> list[str]:
    lines = [f"matched {result['matched']} / {result['total']} sample lines"]
    if result["error"]:
        lines.append(f"ERROR: {result['error']}")
        return lines
    t: pa.Table = result["table"]
    if t.num_rows == 0 or not t.column_names:
        return lines
    cols = t.column_names
    head = " | ".join(cols)
    lines.append(head[:width])
    lines.append("-" * min(len(head), width))
    for row in t.slice(0, max_rows).to_pylist():
        lines.append(" | ".join(str(row[c]) for c in cols)[:width])
    return lines


def run_editor(
    data_definition_file: str,
    input_file: str,
    table_name: str,
    stdscr=None,
    max_rounds: Optional[int] = None,
) -> int:
    """Edit ``table_name``'s patterns with live extraction preview.

    Non-TTY fallback: print one preview snapshot and exit (keeps the flag
    usable in pipelines/tests; the reference hard-requires Unix + TTY).
    """
    with open(data_definition_file) as fh:
        defs_text = fh.read()
    tdefs = {t.name: t for t in parse(defs_text) if isinstance(t, TableDef)}
    if table_name not in tdefs:
        print(f"unknown table {table_name!r}", file=sys.stderr)
        return 2
    tdef = tdefs[table_name]
    sample = load_sample(input_file)

    if stdscr is None and not sys.stdout.isatty():
        for ln in _format_preview(preview(tdef, sample)):
            print(ln)
        return 0

    import curses

    def app(scr) -> int:
        nonlocal tdef
        curses.curs_set(0)
        sel = 0
        status = "e edit · Enter apply · s save · q quit"
        rounds = 0
        while True:
            scr.erase()
            h, w = scr.getmaxyx()
            scr.addnstr(0, 0, f"table {tdef.name} — {status}", w - 1)
            for i, p in enumerate(tdef.patterns):
                marker = ">" if i == sel else " "
                scr.addnstr(2 + i, 0, f"{marker} {p.name} = {p.regex}", w - 1)
            row0 = 3 + len(tdef.patterns)
            for j, ln in enumerate(_format_preview(preview(tdef, sample))):
                if row0 + j >= h - 1:
                    break
                scr.addnstr(row0 + j, 0, ln, w - 1)
            scr.refresh()
            rounds += 1
            if max_rounds is not None and rounds >= max_rounds:
                return 0
            ch = scr.getch()
            if ch in (ord("q"), 27):
                return 0
            if ch == curses.KEY_UP:
                sel = max(0, sel - 1)
            elif ch == curses.KEY_DOWN:
                sel = min(len(tdef.patterns) - 1, sel + 1)
            elif ch == ord("e"):
                curses.echo()
                curses.curs_set(1)
                scr.addnstr(h - 1, 0, "pattern> ", w - 1)
                scr.refresh()
                new_rx = scr.getstr(h - 1, 9, w - 11).decode()
                curses.noecho()
                curses.curs_set(0)
                if new_rx:
                    tdef = _replace_pattern(tdef, tdef.patterns[sel].name, new_rx)
                    status = "edited (unsaved)"
            elif ch == ord("s"):
                tdefs[table_name] = tdef
                out = "\n".join(render_table_def(t) for t in tdefs.values())
                with open(data_definition_file, "w") as fh:
                    fh.write(out)
                status = f"saved to {os.path.basename(data_definition_file)}"

    if stdscr is not None:  # injected screen (tests)
        return app(stdscr)
    return curses.wrapper(app)
