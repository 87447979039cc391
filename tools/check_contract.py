"""Local replay of the driver's correctness gate: run every queries()
entry at sf0.01 and compare to oracle_sql() via DuckDB (row count, schema,
order-insensitive value hash). Usage:

    python tools/check_contract.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_df(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    df = norm_df(df.copy())
    parts = []
    for c in df.columns:
        col = df[c]
        if col.dtype.kind == "f":
            parts.append(np.round(col.to_numpy(np.float64), 6).tobytes())
        else:
            parts.append("\x00".join(map(str, col.tolist())).encode())
    return hashlib.sha1(b"|".join(parts)).hexdigest()[:16]


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(got)} rows  ({dt:.2f}s)  [no oracle]")
            n_rows_only += 1
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle raised {e}")
            n_fail += 1
            continue
        ok_rows = len(got) == len(exp)
        ok_schema = sorted(map(str.lower, got.columns)) == sorted(map(str.lower, exp.columns))
        ok_hash = value_hash(got) == value_hash(exp)
        if ok_rows and ok_schema and ok_hash:
            print(f"PASS  {name}: {len(got)} rows  ({dt:.2f}s)")
            n_pass += 1
        else:
            print(f"FAIL  {name}: rows {len(got)}/{len(exp)} schema_ok={ok_schema} "
                  f"hash_ok={ok_hash}")
            if not ok_schema:
                print(f"      got cols {list(got.columns)} exp cols {list(exp.columns)}")
            if ok_schema and not ok_hash:
                g, e = norm_df(got), norm_df(exp)
                diff = g.compare(e) if g.shape == e.shape else None
                print(f"      first rows got:\n{g.head(3)}\n      exp:\n{e.head(3)}")
                if diff is not None and len(diff):
                    print(f"      diff head:\n{diff.head(5)}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
