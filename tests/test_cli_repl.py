"""CLI/REPL parity additions (VERDICT r1 item 9-10): \\d describe, stdin as
data (``main.rs:171-173``), and the streaming callback API
(``python_wrapper.rs:151-209``)."""

import subprocess
import sys

import pytest

from sqlgrep_ray.api import Tables
from sqlgrep_ray.cli import describe_lines

DEFS = r"""
CREATE TABLE conns(
    line = 'user=(\\w+) n=([0-9]+)',
    line[1] => user TEXT,
    line[2] => n INT
);
"""


def test_describe_lines_lists_tables_and_columns():
    t = Tables()
    t.add_tables(DEFS)
    top = describe_lines(t)
    assert top[0] == "Tables:" and "  conns" in top
    d = describe_lines(t, "conns")
    assert d[0] == "Table conns:"
    assert any("user" in ln and "TEXT" in ln for ln in d)
    assert any(ln.strip().startswith("n") and "INT" in ln for ln in d)
    assert any("Patterns:" in ln for ln in d)
    with pytest.raises(Exception):
        describe_lines(t, "nope")


def test_cli_stdin_data_and_repl_describe(tmp_path):
    """One subprocess run each (the CLI owns its own Ray session):
    (a) --stdin pipes DATA lines; (b) the REPL answers \\d without data."""
    defs = tmp_path / "defs.sql"
    defs.write_text(DEFS)

    # (a) stdin as data + one-shot -c
    out = subprocess.run(
        [sys.executable, "-m", "sqlgrep_ray.cli", "-d", str(defs), "--stdin",
         "-c", "SELECT user, n FROM conns WHERE n > 1", "--format", "csv",
         "--num-cpus", "2"],
        input="user=alice n=1\nuser=bob n=2\nnoise\nuser=eve n=9\n",
        capture_output=True, text=True, timeout=240, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.strip()]
    assert lines[0] == "user;n"
    # TEXT values render quoted (reference Display parity, sinks.py)
    assert set(lines[1:]) == {"'bob';2", "'eve';9"}

    # (b) REPL: \d and \d conns over piped stdin (no data needed)
    out = subprocess.run(
        [sys.executable, "-m", "sqlgrep_ray.cli", "-d", str(defs),
         "--num-cpus", "2"],
        input="\\d\n\\d conns\nexit\n",
        capture_output=True, text=True, timeout=240, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Tables:" in out.stdout and "Table conns:" in out.stdout
    assert "user" in out.stdout

    # --stdin without -c is an error (stdin can't serve data AND queries)
    out = subprocess.run(
        [sys.executable, "-m", "sqlgrep_ray.cli", "-d", str(defs), "--stdin"],
        input="", capture_output=True, text=True, timeout=120, cwd="/root/repo",
    )
    assert out.returncode == 2


def test_execute_query_callback_early_stop(ray_session):
    t = Tables()
    t.add_tables(DEFS)
    lines = [f"user=u{i} n={i}" for i in range(500)]

    seen: list[int] = []

    def cb(rows):
        seen.append(len(rows))
        return False  # stop after the first batch

    delivered = t.execute_query_callback(
        "SELECT user, n FROM conns", cb, source=lines, batch_size=50
    )
    assert delivered == seen[0] == 50
    assert len(seen) == 1

    # without early stop the callback sees everything
    total = t.execute_query_callback(
        "SELECT user, n FROM conns", lambda rows: True, source=lines,
        batch_size=200,
    )
    assert total == 500


def test_cli_follow_aggregate_snapshot(tmp_path):
    """-f over a shard DIRECTORY: two shards exist at start (--head), the
    aggregate snapshot over both is printed; select-follow prints appended
    rows only. Uses --max-rounds so the loop terminates."""
    defs = tmp_path / "defs.sql"
    defs.write_text(DEFS)
    d = tmp_path / "logs"
    d.mkdir()
    (d / "a-0001.log").write_text("user=alice n=1\nuser=bob n=2\n")
    (d / "a-0002.log").write_text("user=eve n=9\nnoise\n")

    out = subprocess.run(
        [sys.executable, "-m", "sqlgrep_ray.cli", "-d", str(defs), str(d),
         "-f", "--head", "--max-rounds", "1", "--poll-interval", "0.1",
         "-c", "SELECT user, max(n) AS mx FROM conns GROUP BY user",
         "--format", "csv", "--num-cpus", "2"],
        capture_output=True, text=True, timeout=240, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.strip()]
    assert lines[0] == "user;mx"
    assert set(lines[1:]) == {"'alice';1", "'bob';2", "'eve';9"}


def test_cli_command_file(tmp_path):
    defs = tmp_path / "defs.sql"
    defs.write_text(DEFS)
    qf = tmp_path / "q.sql"
    qf.write_text("SELECT user, n FROM conns WHERE n > 1\n")
    out = subprocess.run(
        [sys.executable, "-m", "sqlgrep_ray.cli", "-d", str(defs), "--stdin",
         "--command-file", str(qf), "--format", "csv", "--num-cpus", "2"],
        input="user=a n=1\nuser=b n=5\n",
        capture_output=True, text=True, timeout=240, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.strip()]
    assert lines == ["user;n", "'b';5"]


def test_library_parity_surface(ray_session, tmp_path):
    """python_wrapper.rs parity: table_names/tables/get_table, compiled
    execution, execute_query_line, ReadLinesIterator, FollowFileIterator."""
    from sqlgrep_ray.api import FollowFileIterator, ReadLinesIterator

    t = Tables()
    t.add_tables(DEFS)
    assert t.table_names() == ["conns"]
    assert [td.name for td in t.tables()] == ["conns"]
    assert t.get_table("conns").name == "conns"

    compiled = t.compile_query("SELECT user, n FROM conns WHERE n >= 2")
    out1 = t.execute_compiled_query(compiled, source=["user=a n=1", "user=b n=2"])
    assert out1.take_all() == [{"user": "b", "n": 2}]
    # compile once, run again on a different source
    out2 = t.execute_compiled_query(compiled, source=["user=c n=7"])
    assert out2.take_all() == [{"user": "c", "n": 7}]

    seen = []
    n = t.execute_compiled_query_callback(
        compiled, lambda rows: seen.extend(rows),
        source=[f"user=u n={i}" for i in range(10)],
    )
    assert n == 8 and len(seen) == 8  # n>=2 keeps 8 of 10

    assert t.execute_query_line(
        "SELECT user, n FROM conns", "user=zed n=4"
    ) == [{"user": "zed", "n": 4}]

    f = tmp_path / "lines.log"
    f.write_text("one 1\ntwo 2\n")
    assert list(ReadLinesIterator(str(f))) == ["one 1", "two 2"]

    # FollowFileIterator: head=True reads existing lines; appended complete
    # lines arrive; a partial line is held until its newline shows up
    it = FollowFileIterator(str(f), head=True, poll_interval=0.01, max_polls=3)
    assert next(it) == "one 1"
    assert next(it) == "two 2"
    with open(f, "a") as fh:
        fh.write("three 3\npart")
        fh.flush()
    assert next(it) == "three 3"
    with open(f, "a") as fh:
        fh.write("ial 4\n")
        fh.flush()
    assert next(it) == "partial 4"
    import pytest as _pytest

    with _pytest.raises(StopIteration):
        next(it)


def test_samples_example_runs():
    """samples/example.py (the reference's sample walkthrough) runs clean."""
    import subprocess
    import sys

    p = subprocess.run(
        [sys.executable, "samples/example.py"],
        capture_output=True, text=True, timeout=240, cwd="/root/repo",
    )
    assert p.returncode == 0, p.stderr[-2000:]
    assert "callback saw" in p.stdout


def test_cli_with_union_subquery(tmp_path):
    """The round-4 SQL extensions flow through the CLI surface: a WITH
    CTE + UNION over stdin data and an IN (SELECT …) filter, one
    subprocess each way of Tables.execute_query's multi-statement
    routing."""
    defs = tmp_path / "defs.sql"
    defs.write_text(DEFS)
    data = "user=alice n=1\nuser=bob n=2\nuser=eve n=9\nuser=bob n=5\n"

    out = subprocess.run(
        [sys.executable, "-m", "sqlgrep_ray.cli", "-d", str(defs), "--stdin",
         "-c",
         "WITH big AS (SELECT user, COUNT(*) AS c FROM conns GROUP BY user) "
         "SELECT user, c FROM big WHERE c > 1 UNION ALL "
         "SELECT user, c FROM big WHERE c > 1 ORDER BY user",
         "--format", "csv", "--num-cpus", "2"],
        input=data, capture_output=True, text=True, timeout=240,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.strip()]
    assert lines == ["user;c", "'bob';2", "'bob';2"]

    out = subprocess.run(
        [sys.executable, "-m", "sqlgrep_ray.cli", "-d", str(defs), "--stdin",
         "-c",
         "SELECT user, n FROM conns WHERE user IN "
         "(SELECT user FROM conns WHERE n > 4) ORDER BY n",
         "--format", "csv", "--num-cpus", "2"],
        input=data, capture_output=True, text=True, timeout=240,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.strip()]
    assert lines == ["user;n", "'bob';2", "'bob';5", "'eve';9"]
