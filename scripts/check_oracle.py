"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry at a given sf_dir, run its ``oracle_sql()`` in
DuckDB over the same parquet tables, and compare row count + sorted
column names + an order-insensitive value hash.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(result):
    import pandas as pd
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    # ray Dataset
    return result.to_pandas()


def value_hash(df) -> str:
    """Order-insensitive: sort columns by name, then rows by all
    columns, hash the CSV bytes."""
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    df = df.reset_index(drop=True)
    body = df.to_csv(index=False, float_format="%.10g").encode()
    return hashlib.md5(body).hexdigest()


def main():
    import duckdb
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry_mod

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            res = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        secs = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(res)} rows, cols={sorted(res.columns)} "
                  f"({secs:.2f}s) [rows-only]")
            continue
        want = con.sql(oracles[name]).df()
        ok_rows = len(res) == len(want)
        ok_cols = sorted(res.columns) == sorted(want.columns)
        ok_hash = ok_rows and ok_cols and value_hash(res) == value_hash(want)
        status = "OK   " if (ok_rows and ok_cols and ok_hash) else "FAIL "
        if status.startswith("FAIL"):
            failures += 1
        print(f"{status} {name}: rows {len(res)}/{len(want)} "
              f"cols_match={ok_cols} hash_match={ok_hash} ({secs:.2f}s)")
        if not ok_cols:
            print(f"      ray cols:    {sorted(res.columns)}")
            print(f"      oracle cols: {sorted(want.columns)}")
        elif not ok_hash and ok_rows:
            merged = res[sorted(res.columns)].sort_values(
                by=sorted(res.columns)).reset_index(drop=True)
            wanted = want[sorted(want.columns)].sort_values(
                by=sorted(want.columns)).reset_index(drop=True)
            diff = (merged != wanted) & ~(merged.isna() & wanted.isna())
            bad = diff.any(axis=1)
            print("      first diffs (ray vs oracle):")
            print(merged[bad].head(3))
            print(wanted[bad].head(3))
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
