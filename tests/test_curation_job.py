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
