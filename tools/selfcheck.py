#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs after `graft.Verify <sfDir> <outDir>`: for each query, loads the
Spark-written parquet and the DuckDB-oracle result, sorts columns by
name and rows by all columns, and compares values. Uses driver-side-only
libs (duckdb/pandas) — this script is tooling, not shipped engine code.
"""
import json, sys, math
import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize ints vs floats-of-ints and bytes for stable compare
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: v.decode() if isinstance(v, bytes) else v)
    df = df.astype(object).where(pd.notnull(df), None)
    return df.sort_values(by=list(df.columns), key=lambda s: s.map(repr)).reset_index(drop=True)


def _is_float(v):
    return isinstance(v, (float, np.floating))


def _is_int(v):
    return isinstance(v, (int, np.integer)) and not isinstance(v, (bool, np.bool_))


def values_equal(a, b):
    """Dtype-strict compare, mirroring the driver's value hasher.

    The driver hashes the stringified values, so int 15 vs float 15.0
    MUST fail here too (DuckDB HUGEINT aggregates come back float64 in
    pandas — the round-7 q12/q22/window_frame_stats trap). An
    int-class vs float-class mismatch is therefore a failure even when
    numerically equal."""
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    a_bool = isinstance(a, (bool, np.bool_))
    b_bool = isinstance(b, (bool, np.bool_))
    if a_bool != b_bool:
        return False
    if (_is_int(a) and _is_float(b)) or (_is_float(a) and _is_int(b)):
        return False
    if _is_float(a) and _is_float(b):
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    try:
        return bool(a == b)
    except (TypeError, ValueError):
        return a == b


def main(sf_dir: str, out_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})"); n_fail += 1; continue
        try:
            duck_df = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}"); n_fail += 1; continue
        if sorted(spark_df.columns) != sorted(duck_df.columns):
            print(f"FAIL {name}: columns {list(spark_df.columns)} vs {list(duck_df.columns)}")
            n_fail += 1; continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}"); n_fail += 1; continue
        bad = None
        for i in range(len(spark_df)):
            for c in spark_df.columns:
                if not values_equal(spark_df.at[i, c], duck_df.at[i, c]):
                    bad = (i, c, spark_df.at[i, c], duck_df.at[i, c]); break
            if bad: break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} duck={bad[3]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
