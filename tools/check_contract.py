"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 and compares against
``oracle_sql()`` via DuckDB: row count, sorted-column schema, and an
order-insensitive value hash (rows sorted by their string repr, columns
sorted by name). Rows-only entries just report counts.

Usage: python tools/check_contract.py [--sf-dir /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import hashlib
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        df = res.to_pandas()
        if df.empty and len(df.columns) == 0:
            # Ray to_pandas drops columns for empty datasets; rebuild from
            # the (known) schema so empty results keep their shape
            sch = res.schema(fetch_if_missing=True)
            df = pd.DataFrame(columns=sch.names if sch is not None else [])
        return df
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: repr(sorted(v)) if isinstance(v, (list, tuple)) else (repr(list(v)) if hasattr(v, "__len__") and not isinstance(v, str) else repr(v)))
    rows = sorted(df.itertuples(index=False, name=None))
    h = hashlib.sha1(repr(rows).encode()).hexdigest()[:16]
    return len(df), list(df.columns), h


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    names = args.names or list(qs)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )

    n_pass = n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            mine = to_df(qs[name](args.sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: ray error {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows-only {name}: {len(mine)} rows  ({dt:.1f}s)")
            n_pass += 1
            continue
        try:
            theirs = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            print(f"FAIL {name}: oracle error {ex}")
            n_fail += 1
            continue
        mn, mc, mh = canon(mine)
        on, oc, oh = canon(theirs)
        ok = (mn, mc, mh) == (on, oc, oh)
        if ok:
            print(f"PASS {name}: {mn} rows  ({dt:.1f}s)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: rows {mn} vs {on}; cols {mc} vs {oc}; hash {mh} vs {oh}")
            if mc == oc and mn == on:
                m = mine[sorted(mine.columns)].astype(str)
                o = theirs[sorted(theirs.columns)].astype(str)
                ms = set(map(tuple, m.itertuples(index=False, name=None)))
                os_ = set(map(tuple, o.itertuples(index=False, name=None)))
                print("   only-mine:", list(ms - os_)[:3])
                print("   only-oracle:", list(os_ - ms)[:3])
    print(f"\n{n_pass} pass, {n_fail} fail")
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
