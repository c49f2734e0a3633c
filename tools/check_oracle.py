"""Local replica of the driver's correctness gate: run each queries()
entry via Ray AND its oracle_sql() via DuckDB at sf0.01, compare
row-count + schema + order-insensitive values. Usage:

    python tools/check_oracle.py [query ...]
"""

import sys
import time

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
SF_DIR = "/root/testdata/sf0.01"


def to_pandas(res):
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object or str(df[c].dtype).startswith("Int"):
            df[c] = df[c].astype(object).where(df[c].notna(), "<NULL>").astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    qs = e.queries()
    sqls = e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    names = sys.argv[1:] or list(qs)
    failures = []
    for name in names:
        t0 = time.time()
        try:
            ray_df = to_pandas(qs[name](SF_DIR))
        except Exception as ex:
            print(f"[FAIL-RAY ] {name}: {type(ex).__name__}: {ex}")
            failures.append(name)
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"[ROWS-ONLY] {name}: {len(ray_df)} rows, {dt:.1f}s, cols={list(ray_df.columns)}")
            continue
        try:
            ora_df = con.execute(sqls[name]).fetchdf()
        except Exception as ex:
            print(f"[FAIL-SQL ] {name}: {type(ex).__name__}: {ex}")
            failures.append(name)
            continue
        a, b = norm(ray_df), norm(ora_df)
        status = []
        if len(a) != len(b):
            status.append(f"rowcount {len(a)} vs {len(b)}")
        if list(a.columns) != list(b.columns):
            status.append(f"cols {list(a.columns)} vs {list(b.columns)}")
        else:
            ta = [str(t) for t in a.dtypes]
            tb = [str(t) for t in b.dtypes]
            if ta != tb:
                status.append(f"dtypes {ta} vs {tb}")
            if len(a) == len(b) and not a.equals(b):
                neq = (a.values != b.values).any(axis=1)
                k = int(neq.sum())
                status.append(f"{k} differing rows; first:\n{a[neq].head(3)}\nvs\n{b[neq].head(3)}")
        if status:
            print(f"[MISMATCH ] {name}: " + " | ".join(status))
            failures.append(name)
        else:
            print(f"[OK       ] {name}: {len(a)} rows, {dt:.1f}s")
    ray.shutdown()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all green")


if __name__ == "__main__":
    main()
