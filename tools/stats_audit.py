"""Per-operator wall-time X-ray of the headline pipelines (`ds.stats()`).

The perf feedback loop the engine was tuned with: run a pipeline,
materialize it, and summarize where the wall-clock went — per Ray Data
operator, with task counts and output rows — so a slow stage is visible
as a line item instead of a guess. Usage:

    python tools/stats_audit.py [--sf-dir /root/testdata/sf0.1] [names...]

Names default to a representative set; any ``queries()`` name works.
"""

from __future__ import annotations

import argparse
import re
import sys
import time

sys.path.insert(0, "/root/repo")

DEFAULT = ["flagship_sink_counts", "minhash_pairs", "curate_corpus", "top_tokens_docs"]

_OP_RE = re.compile(
    r"Operator (\d+) (\S+?): (?:(\d+) tasks executed, (\d+) blocks produced in ([0-9.]+)s"
    r"|executed in ([0-9.]+)s)"
)
_ROWS_RE = re.compile(r"\* Output num rows per block: .* (\d+) total")


def audit(name: str, fn, sf_dir: str) -> None:
    t0 = time.time()
    ds = fn(sf_dir)
    import pandas as pd
    import pyarrow as pa
    import ray.data

    if isinstance(ds, ray.data.Dataset):
        ds = ds.materialize()
        wall = time.time() - t0
        stats = ds.stats()
        print(f"\n== {name}: {wall:.2f}s total, {ds.count()} rows ==")
        ops = []
        for m in _OP_RE.finditer(stats):
            op = m.group(2)
            secs = float(m.group(5) or m.group(6) or 0.0)
            tasks = m.group(3) or "-"
            ops.append((secs, op, tasks))
        for secs, op, tasks in sorted(ops, reverse=True):
            flag = "  <-- dominant" if ops and secs == max(o[0] for o in ops) and secs > 0 else ""
            print(f"  {secs:7.2f}s  {tasks:>5} tasks  {op[:90]}{flag}")
    else:
        wall = time.time() - t0
        n = len(ds) if isinstance(ds, (pd.DataFrame,)) else ds.num_rows
        print(f"\n== {name}: {wall:.2f}s total, {n} rows (non-Dataset result) ==")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("names", nargs="*", default=None)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from sqlgrep_ray.pipelines.contract import QUERIES

    names = args.names or DEFAULT
    for name in names:
        if name not in QUERIES:
            print(f"unknown query {name!r}; choices: {sorted(QUERIES)}")
            continue
        audit(name, QUERIES[name], args.sf_dir)
    ray.shutdown()


if __name__ == "__main__":
    main()
