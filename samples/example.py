"""Library-API walkthrough — the analogue of the reference's
``samples/example.py`` (``python_wrapper.rs`` sample usage), on Ray Data.

Run from the repo root:  python samples/example.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

from sqlgrep_ray import ReadLinesIterator, Tables

DEFS = r"""
CREATE TABLE connections(
    line = 'connection from ([0-9.]+) \\((.+)?\\) at ([a-zA-Z]+) ([a-zA-Z]+) ([0-9]+) ([0-9]+):([0-9]+):([0-9]+) ([0-9]+)',

    line[1] => ip TEXT,
    line[2] => hostname TEXT,
    line[9] => year INT,
    line[4] => month TEXT,
    line[5] => day INT,
    line[6] => hour INT,
    line[7] => minute INT,
    line[8] => second INT
);
"""

SAMPLE_LINES = [
    "Jun 17 07:07:00 combo ftpd[11922]: connection from 82.68.222.194 (82-68-222-194.dsl.in-addr.zen.co.uk) at Fri Jun 17 07:07:00 2005",
    "Jun 17 07:07:02 combo ftpd[11924]: connection from 82.68.222.194 (82-68-222-194.dsl.in-addr.zen.co.uk) at Fri Jun 17 07:07:02 2005",
    "Jul 03 02:11:29 combo ftpd[4784]: connection from 218.62.18.218 () at Sun Jul  3 02:11:29 2005",
    "noise line that matches nothing",
]


def main() -> None:
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    tables = Tables()
    tables.add_tables(DEFS)

    # describe the catalog (the reference prints table.columns())
    for name in tables.table_names():
        td = tables.get_table(name)
        print(name)
        for c in td.columns:
            print(f"\t{c.name}: {c.vtype.kind}")
    print("=" * 100)

    # select over in-memory lines
    for row in tables.execute_query_rows(
        "SELECT ip, hostname FROM connections WHERE hostname IS NOT NULL",
        source=SAMPLE_LINES,
    ):
        print(row)
    print("=" * 100)

    # aggregate; source can also be a file via ReadLinesIterator, a path,
    # or any ray.data.Dataset
    lines_file = os.path.join("/tmp", "example_lines.log")
    with open(lines_file, "w") as fh:
        fh.write("\n".join(SAMPLE_LINES) + "\n")
    for row in tables.execute_query_rows(
        "SELECT ip, COUNT() AS count FROM connections GROUP BY ip",
        source=ReadLinesIterator(lines_file),
    ):
        print(row)
    print("=" * 100)

    # compile once, run per input (reference compile_query)
    compiled = tables.compile_query(
        "SELECT hostname, COUNT() AS n FROM connections GROUP BY hostname"
    )
    print(tables.execute_compiled_query(compiled, SAMPLE_LINES).take_all())

    # streaming callback (reference execute_query_callback): stop after the
    # first batch by returning False
    seen = []

    def cb(batch_rows):
        seen.extend(batch_rows)
        return False

    tables.execute_query_callback(
        "SELECT ip FROM connections", cb, source=SAMPLE_LINES
    )
    print(f"callback saw {len(seen)} rows, then stopped")

    # ENGINE EXTENSION: window functions over a partition
    # (LAG/LEAD, FIRST_VALUE, ROW_NUMBER, RANK/DENSE_RANK, NTILE,
    # running SUM/AVG/COUNT)
    print("=" * 100)
    for row in tables.execute_query_rows(
        "SELECT hostname, ROW_NUMBER() OVER "
        "(PARTITION BY hostname ORDER BY ip) AS nth FROM connections",
        source=SAMPLE_LINES,
    ):
        print(row)
    ray.shutdown()


if __name__ == "__main__":
    main()
