"""Staged curation job (jobs/run_curation.py): end-to-end run + stage-level
resume (global dedup can't checkpoint per input chunk; the stage is the
resumable unit and reruns clean their partial output)."""

import json
import os
import subprocess
import sys


def _run(out_dir: str) -> dict:
    p = subprocess.run(
        [sys.executable, "jobs/run_curation.py",
         "--input", "/root/testdata/sf0.001/documents.parquet",
         "--out", out_dir, "--languages", "all", "--min-quality", "0.0",
         "--num-cpus", "2"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert p.returncode == 0, p.stderr[-2000:]
    return json.loads(p.stdout.strip().splitlines()[-1])


def test_curation_job_and_stage_resume(tmp_path):
    out = str(tmp_path / "cur")
    m1 = _run(out)
    assert m1["rows_out"] > 0
    assert set(m1["stages_run"]) == {"stats", "winners", "pairs", "dupgrams", "final"}
    assert os.path.isdir(os.path.join(out, "final"))
    # language-partitioned resumable layout
    assert any(d.startswith("lang_pred=") for d in os.listdir(os.path.join(out, "final")))

    # kill/resume semantics: drop the LAST stage's marker → only it reruns,
    # and the output is identical (stage rerun cleans its partial files)
    os.remove(os.path.join(out, "_DONE.final"))
    m2 = _run(out)
    assert m2["stages_run"].keys() == {"final"}
    assert set(m2["stages_skipped_resume"]) == {"stats", "winners", "pairs", "dupgrams"}
    assert m2["rows_out"] == m1["rows_out"]


def test_curation_job_decontam_and_scrub(tmp_path):
    """--benchmark drops overlap docs; --scrub-pii rewrites the text col."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # benchmark = the exact text of a handful of corpus docs -> they (and
    # only near-verbatim overlaps) must disappear from the output
    src = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    bench = src.slice(0, 5).select(["text"])
    bench_path = str(tmp_path / "bench.parquet")
    pq.write_table(bench, bench_path)

    out = str(tmp_path / "cur2")
    p = subprocess.run(
        [sys.executable, "jobs/run_curation.py",
         "--input", "/root/testdata/sf0.001/documents.parquet",
         "--out", out, "--languages", "all", "--min-quality", "0.0",
         "--benchmark", bench_path, "--scrub-pii", "--num-cpus", "2"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert p.returncode == 0, p.stderr[-2000:]
    m = json.loads(p.stdout.strip().splitlines()[-1])
    assert "decontam" in m["stages_run"]

    import duckdb

    final = os.path.join(out, "final")
    ids = {
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM read_parquet('{final}/*/*.parquet')"
        ).fetchall()
    }
    bench_ids = set(src.slice(0, 5)["doc_id"].to_pylist())
    assert not (ids & bench_ids)  # contaminated docs dropped
    cols = duckdb.sql(
        f"SELECT * FROM read_parquet('{final}/*/*.parquet') LIMIT 1"
    ).columns
    assert "n_emails" in cols and "text" in cols  # scrub ran, text kept


def test_curation_job_pack_budget(tmp_path):
    """--pack-budget assigns training-sequence bins within the budget."""
    out = str(tmp_path / "cur3")
    p = subprocess.run(
        [sys.executable, "jobs/run_curation.py",
         "--input", "/root/testdata/sf0.001/documents.parquet",
         "--out", out, "--languages", "all", "--min-quality", "0.0",
         "--pack-budget", "2000", "--num-cpus", "2"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert p.returncode == 0, p.stderr[-2000:]
    import duckdb

    final = os.path.join(out, "final")
    rows = duckdb.sql(
        f"SELECT bin_id, sum(n_tokens_ws) AS tot, count(*) AS n "
        f"FROM read_parquet('{final}/*/*.parquet') GROUP BY bin_id"
    ).fetchall()
    assert rows
    for _bin, tot, n in rows:
        assert tot <= 2000 or n == 1  # oversize docs overflow alone


def test_curation_job_repetition_and_boilerplate(tmp_path):
    """--max-dup-token-frac drops repetitive docs; --scrub-boilerplate
    removes corpus-repeated segments from surviving text."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(9)
    words = [f"tok{i}" for i in range(400)]
    boiler = "standard legal disclaimer line shared by many documents"
    texts = []
    for i in range(40):
        body = " ".join(rng.choice(words, 30, replace=False))
        texts.append(f"{boiler}\n{body}")
    texts.append("spam " * 50)  # one highly repetitive doc
    src_path = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                "text": pa.array(texts, pa.string()),
            }
        ),
        src_path,
    )

    out = str(tmp_path / "cur3")
    p = subprocess.run(
        [sys.executable, "jobs/run_curation.py",
         "--input", src_path, "--out", out, "--languages", "all",
         "--min-quality", "0.0", "--min-tokens", "1",
         "--max-dup-token-frac", "0.5", "--scrub-boilerplate",
         "--num-cpus", "2"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert p.returncode == 0, p.stderr[-2000:]
    m = json.loads(p.stdout.strip().splitlines()[-1])
    assert m["rows_out"] == 40  # the spam doc (dup frac ~ 1) is gone

    import pandas as pd

    final = pd.read_parquet(os.path.join(out, "final"))
    assert not final["text"].str.contains("disclaimer").any()
    assert (final["n_removed"] >= 1).all()
    assert final["text"].str.len().gt(0).all()  # unique bodies survived


def test_curation_job_from_transcripts(tmp_path):
    """--from-transcripts reassembles conversations into documents first;
    the whole curation suite then runs at conversation granularity."""
    from sqlgrep_ray.sources.synth import ensure_transcripts

    tr_dir = ensure_transcripts(0.001)
    out = str(tmp_path / "cur_tr")
    p = subprocess.run(
        [sys.executable, "jobs/run_curation.py",
         "--input", tr_dir, "--out", out, "--from-transcripts",
         "--languages", "all", "--min-quality", "0.0", "--min-tokens", "1",
         "--num-cpus", "2"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert p.returncode == 0, p.stderr[-2000:]
    m = json.loads(p.stdout.strip().splitlines()[-1])
    assert "reassemble" in m["stages_run"]
    assert m["rows_out"] > 0

    import duckdb

    # one output row per surviving conversation, with lineage back to it
    n_convs = duckdb.sql(
        f"SELECT count(DISTINCT conv_id) FROM read_parquet('{tr_dir}/*.parquet')"
    ).fetchone()[0]
    final = os.path.join(out, "final")
    rows = duckdb.sql(
        f"SELECT count(*), count(DISTINCT conv_id), count(DISTINCT doc_id) "
        f"FROM read_parquet('{final}/*/*.parquet')"
    ).fetchone()
    assert rows[0] == rows[1] == rows[2]  # one doc per conversation
    assert 0 < rows[0] <= n_convs

    # resume: only the final stage reruns; reassemble is skipped
    os.remove(os.path.join(out, "_DONE.final"))
    p2 = subprocess.run(
        [sys.executable, "jobs/run_curation.py",
         "--input", tr_dir, "--out", out, "--from-transcripts",
         "--languages", "all", "--min-quality", "0.0", "--min-tokens", "1",
         "--num-cpus", "2"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    m2 = json.loads(p2.stdout.strip().splitlines()[-1])
    assert "reassemble" in m2["stages_skipped_resume"]
    assert m2["rows_out"] == m["rows_out"]
