"""CLI — the Ray-Data analogue of the reference's ``sqlgrep`` binary.

    python -m sqlgrep_ray.cli -d defs.sql data.log -c "SELECT … FROM t"
    python -m sqlgrep_ray.cli -d defs.sql data.log          # REPL-ish stdin loop

Mirrors ``src/main.rs``: ``-d`` table-definition file(s), positional input
file(s) (text lines; ``.parquet`` works too), ``-c`` one-shot query,
``--format text|json|csv`` output (reference ``--output-format``),
``--show-run-stats`` wall time / line counts (``executor.rs:12-36``).

This is an entry-point script, so it OWNS the Ray session (the library never
calls ``ray.init``).
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="sqlgrep_ray")
    ap.add_argument("inputs", nargs="*", help="input file(s): text lines or parquet")
    ap.add_argument("-d", "--data-definition", action="append", default=[],
                    help="table definition file (CREATE TABLE …)")
    ap.add_argument("-c", "--command", help="query to execute")
    ap.add_argument("--format", choices=["text", "json", "csv"], default="text")
    ap.add_argument("--show-run-stats", action="store_true")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # reference select output follows input line order (executor.rs:79-104)
    ctx.execution_options.preserve_order = True

    from sqlgrep_ray.api import Tables
    from sqlgrep_ray.sinks import format_csv, format_json, format_text

    tables = Tables()
    for path in args.data_definition:
        with open(path) as fh:
            tables.add_tables(fh.read())

    def run_one(sql: str) -> int:
        t0 = time.time()
        source = args.inputs[0] if args.inputs else None
        if source and len(args.inputs) > 1:
            # multiple input files concatenated in order (executor.rs:38-137)
            import ray.data as rd

            parts = [tables._as_dataset(p, "text") for p in args.inputs]
            ds0 = parts[0]
            for p in parts[1:]:
                ds0 = ds0.union(p)
            result = tables.execute_query(sql, source=ds0)
        else:
            result = tables.execute_query(sql, source=source)
        fmt = {"text": format_text, "json": format_json, "csv": format_csv}[args.format]
        lines = fmt(result)
        for ln in lines:
            print(ln)
        if args.show_run_stats:
            print(f"Executed query in {time.time() - t0:.2f} seconds, "
                  f"{len(lines)} result rows.", file=sys.stderr)
        return 0

    try:
        if args.command:
            return run_one(args.command)
        # simple stdin query loop (reference REPL, main.rs:291-361, minus completion)
        for line in sys.stdin:
            line = line.strip()
            if not line or line.startswith("--"):
                continue
            if line.lower() in ("exit", "quit", "\\q"):
                break
            try:
                run_one(line)
            except Exception as ex:  # keep the loop alive like a REPL
                print(f"error: {ex}", file=sys.stderr)
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
