#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare (driver-side tooling;
NOT part of the Spark library). Usage:

    python3 tools/local_verify.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers each <sfDir>/*.parquet as a
DuckDB view named after the table, runs the oracle SQL, and compares against
the Spark parquet dump at <verifyOutDir>/<name>/ — columns sorted by name,
rows sorted by all columns, floats rounded to 6dp before hashing.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        # normalize ints (int32 vs int64) for comparison
        if df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[us]")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            continue
        got = pd.read_parquet(spark_path)
        if name not in oracles:
            status = f"rows-only ({len(got)} rows)" if len(got) > 0 else "rows-only EMPTY (suspicious)"
            print(f"  [SKIP] {name}: {status}")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"  [FAIL] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"  [FAIL] {name}: columns {list(g.columns)} != {list(w.columns)}")
            n_fail += 1
        elif len(g) != len(w):
            print(f"  [FAIL] {name}: rows {len(g)} != {len(w)}")
            n_fail += 1
        elif not g.equals(w):
            diff = (g != w) & ~(g.isna() & w.isna())
            bad = diff.any(axis=1)
            print(f"  [FAIL] {name}: {bad.sum()} mismatched rows of {len(g)}")
            print("    spark:", g[bad].head(3).to_dict("records"))
            print("    duck :", w[bad].head(3).to_dict("records"))
            n_fail += 1
        else:
            print(f"  [PASS] {name}: {len(g)} rows")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
