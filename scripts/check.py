#!/usr/bin/env python3
"""Local replica of the driver's correctness compare.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query dir under outDir, loads the Spark parquet result and the
DuckDB oracle result (oracle_sql.json), sorts columns by name, sorts rows,
and hash-compares values. Mirrors the driver's t2 gate closely enough to
iterate locally.
"""
import glob
import hashlib
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def h(df: pd.DataFrame) -> str:
    # No float_format: the driver hashes default-rendered values, so an
    # int64 Spark column vs a float64 oracle column (e.g. DuckDB promoting
    # SUM(BIGINT) to HUGEINT -> float64 in pandas) must FAIL here too
    # (1521743 vs 1521743.0). Keep local red == driver red.
    return hashlib.sha256(df.to_csv(index=False).encode()).hexdigest()


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        spark_df = canon(pd.concat(
            [pd.read_parquet(f) for f in sorted(glob.glob(f"{qdir}/*.parquet"))],
            ignore_index=True))
        if name not in oracles:
            print(f"  ~ {name}: rows-only check, {len(spark_df)} rows"
                  + (" [EMPTY!]" if not len(spark_df) else ""))
            continue
        try:
            duck_df = canon(con.execute(oracles[name]).df())
        except Exception as e:
            print(f"  ✗ {name}: ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        ok_schema = list(spark_df.columns) == list(duck_df.columns)
        ok_rows = len(spark_df) == len(duck_df)
        ok_hash = ok_schema and ok_rows and h(spark_df) == h(duck_df)
        if ok_hash:
            print(f"  ✓ {name} ({len(spark_df)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"  ✗ {name}: schema={ok_schema} rows={ok_rows}"
                  f" ({len(spark_df)} vs {len(duck_df)})")
            if ok_schema and list(spark_df.dtypes) != list(duck_df.dtypes):
                dt = [(c, str(a), str(b)) for c, a, b in
                      zip(spark_df.columns, spark_df.dtypes, duck_df.dtypes)
                      if str(a) != str(b)]
                print(f"    dtype mismatch (spark vs duck): {dt}")
            if ok_schema and ok_rows:
                neq = (spark_df.astype(str) != duck_df.astype(str)).any(axis=1)
                print("    spark:", spark_df[neq].head(3).to_dict("records"))
                print("    duck :", duck_df[neq].head(3).to_dict("records"))
            else:
                print("    spark cols:", list(spark_df.columns))
                print("    duck  cols:", list(duck_df.columns))
    print(f"PASS {n_pass} FAIL {n_fail}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
