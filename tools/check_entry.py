"""Driver-style correctness check: run each __spark_entry__ query on
Spark AND its oracle_sql on DuckDB at the given sf dir; compare row
count, schema (column names), and an order-insensitive value hash.

Usage: python tools/check_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if v != v:
            return "nan"
        # keep a trailing ".0" so a float64 57.0 does NOT hash equal to an
        # int64 57 — the external gate compares dtypes-sensitive strings, and
        # a laxer normalizer here masked two oracle typing bugs in round 1
        s = f"{v:.6g}"
        if "." not in s and "e" not in s and "inf" not in s:
            s += ".0"
        return s
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted("\x1f".join(norm_cell(v) for v in row) for row in df.itertuples(index=False))
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = E.queries(), E.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            n_fail += 1
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(sdf)} rows ({t_spark:.1f}s)")
            n_pass += 1
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            n_fail += 1
            continue
        ok_rows = len(sdf) == len(odf)
        ok_cols = sorted(sdf.columns) == sorted(odf.columns)
        ok_hash = ok_rows and ok_cols and value_hash(sdf) == value_hash(odf)
        if ok_rows and ok_cols and ok_hash:
            print(f"PASS {name}: {len(sdf)} rows ({t_spark:.1f}s)")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows {len(sdf)}/{len(odf)} cols_ok={ok_cols} hash_ok={ok_hash}")
            if ok_cols and ok_rows:
                m = sdf[sorted(sdf.columns)].copy()
                o = odf[sorted(odf.columns)].copy()
                key = sorted(sdf.columns)[0]
                m = m.sort_values(list(m.columns)).reset_index(drop=True)
                o = o.sort_values(list(o.columns)).reset_index(drop=True)
                diff = (m.astype(str) != o.astype(str)).any(axis=1)
                print("  first diffs (spark vs oracle):")
                print(pd.concat([m[diff].head(3), o[diff].head(3)], keys=["spark", "duck"]))
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
