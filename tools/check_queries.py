"""Driver-conformance harness: run every queries() entry and its oracle_sql()
side-by-side on an sf dir, compare row-count + columns + order-insensitive
values (exact after the shared 6-dp rounding).

Usage: python tools/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> bool:
    if len(ray_df) != len(sql_df):
        print(f"  FAIL {name}: rows ray={len(ray_df)} sql={len(sql_df)}")
        return False
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        print(f"  FAIL {name}: cols ray={sorted(ray_df.columns)} "
              f"sql={sorted(sql_df.columns)}")
        return False
    a, b = canon(ray_df), canon(sql_df)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f":
            af, bf = av.astype(float), bv.astype(float)
            # Byte-level equality, like the driver's value hash: -0.0 != +0.0.
            eq = ((np.isnan(af) & np.isnan(bf)) |
                  ((af == bf) & (np.signbit(af) == np.signbit(bf))))
        else:
            eq = av == bv
        if not np.all(eq):
            bad = np.nonzero(~eq)[0][:5]
            print(f"  FAIL {name}: column {c} mismatch at rows {bad}")
            for i in bad:
                print(f"    ray={a.iloc[i].to_dict()}")
                print(f"    sql={b.iloc[i].to_dict()}")
            return False
    print(f"  OK   {name}: {len(ray_df)} rows")
    return True


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True)

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = e.queries()
    sqls = e.oracle_sql()
    failures = []
    import time
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"  ERROR {name}: ray side raised {type(ex).__name__}: {ex}")
            import traceback; traceback.print_exc()
            failures.append(name)
            continue
        dt = time.monotonic() - t0
        if name in sqls:
            try:
                sql_df = con.execute(sqls[name]).df()
            except Exception as ex:
                print(f"  ERROR {name}: SQL raised {ex}")
                failures.append(name)
                continue
            if not compare(name, ray_df, sql_df):
                failures.append(name)
            else:
                print(f"       ({dt:.1f}s)")
        else:
            print(f"  rows-only {name}: {len(ray_df)} rows ({dt:.1f}s)")
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all queries pass")


if __name__ == "__main__":
    main()
