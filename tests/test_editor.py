"""Table editor (editor.py) — the reference --edit-table TUI
(table_editor.rs:19-60) rebuilt on the pure preview core + stdlib curses."""

import subprocess
import sys

import pytest

from sqlgrep_ray.editor import (
    _format_preview,
    load_sample,
    preview,
    render_table_def,
    run_editor,
)
from sqlgrep_ray.sqlfront import parse

DEFS = r"""
CREATE TABLE conns(
    line = 'user=(\\w+) n=([0-9]+)',
    line[1] => user TEXT,
    line[2] => n INT
);
"""

LINES = ["user=alice n=1", "noise line", "user=bob n=2"]


def _tdef():
    return [t for t in parse(DEFS)][0]


def test_preview_counts_and_columns():
    r = preview(_tdef(), LINES)
    assert r["total"] == 3 and r["matched"] == 2 and r["error"] is None
    rows = r["table"].to_pylist()
    assert {"user": "alice", "n": 1} in rows and {"user": "bob", "n": 2} in rows
    out = _format_preview(r)
    assert out[0] == "matched 2 / 3 sample lines"
    assert "user | n" in out[1]


def test_preview_bad_regex_reports_error():
    from sqlgrep_ray.schema import PatternDef, TableDef

    t = _tdef()
    bad = TableDef(t.name, [PatternDef("line", "([unclosed")], list(t.columns))
    r = preview(bad, LINES)
    assert r["matched"] == 0 and r["error"]


def test_render_table_def_round_trips():
    t = _tdef()
    text = render_table_def(t)
    t2 = [x for x in parse(text)][0]
    assert t2.name == t.name
    assert [(p.name, p.regex, p.mode) for p in t2.patterns] == [
        (p.name, p.regex, p.mode) for p in t.patterns
    ]
    assert [(c.name, c.vtype.kind) for c in t2.columns] == [
        (c.name, c.vtype.kind) for c in t.columns
    ]
    # the re-parsed def extracts identically
    assert preview(t2, LINES)["matched"] == 2


def test_editor_cli_non_tty_preview(tmp_path):
    defs = tmp_path / "defs.sql"
    defs.write_text(DEFS)
    data = tmp_path / "data.log"
    data.write_text("\n".join(LINES) + "\n")
    out = subprocess.run(
        [sys.executable, "-m", "sqlgrep_ray.cli", "-d", str(defs), str(data),
         "--edit-table", "conns"],
        capture_output=True, text=True, timeout=120, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-1500:]
    assert "matched 2 / 3 sample lines" in out.stdout
    # unknown table → error exit
    out = subprocess.run(
        [sys.executable, "-m", "sqlgrep_ray.cli", "-d", str(defs), str(data),
         "--edit-table", "nope"],
        capture_output=True, text=True, timeout=120, cwd="/root/repo",
    )
    assert out.returncode == 2


class FakeScreen:
    """Scripted curses screen: feeds a key sequence, records drawn text."""

    def __init__(self, keys, entered=b""):
        self.keys = list(keys)
        self.entered = entered
        self.drawn: list[str] = []

    def erase(self):
        self.drawn.append("--frame--")

    def getmaxyx(self):
        return (40, 120)

    def addnstr(self, y, x, s, n):
        self.drawn.append(s)

    def refresh(self):
        pass

    def getch(self):
        return self.keys.pop(0)

    def getstr(self, y, x, n):
        return self.entered


def test_editor_tui_edit_and_save(tmp_path, monkeypatch):
    """Drive the curses app loop with a scripted screen: edit the pattern,
    see the preview change, save, quit — the saved defs re-parse and the
    edited pattern is live."""
    import curses

    for fn in ("curs_set", "echo", "noecho"):
        monkeypatch.setattr(curses, fn, lambda *a, **k: None, raising=False)

    defs = tmp_path / "defs.sql"
    defs.write_text(DEFS)
    data = tmp_path / "data.log"
    data.write_text("\n".join(LINES) + "\n")

    # keys: e (edit -> getstr returns a broader regex), s (save), q (quit)
    scr = FakeScreen([ord("e"), ord("s"), ord("q")],
                     entered=rb"user=(\w+) n=(\d)")
    rc = run_editor(str(defs), str(data), "conns", stdscr=scr)
    assert rc == 0
    saved = defs.read_text()
    assert r"user=(\w+) n=(\d)" in saved.replace("\\\\", "\\")
    t2 = [x for x in parse(saved)][0]
    assert preview(t2, LINES)["matched"] == 2
    assert any("matched 2 / 3" in s for s in scr.drawn)
