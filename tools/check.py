#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads the parquet dumps written by `graft.Verify` plus oracle_sql.json,
runs each oracle against DuckDB over the same testdata parquet tables,
and compares: column names (sorted), dtypes (loose), row count, and
values (rows sorted, NaN-safe). Usage:

    python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize types for compare
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    if len(df) > 0:
        df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df


def compare(name, spark_df, duck_df):
    a, b = normalize(spark_df), normalize(duck_df)
    if list(a.columns) != list(b.columns):
        return f"COLS spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS spark={len(a)} duck={len(b)}"
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if np.issubdtype(np.asarray(av).dtype, np.floating) or np.issubdtype(np.asarray(bv).dtype, np.floating):
            af = pd.to_numeric(a[c], errors="coerce").values.astype(float)
            bf = pd.to_numeric(b[c], errors="coerce").values.astype(float)
            exact = np.array_equal(af, bf, equal_nan=True)
            close = np.allclose(np.nan_to_num(af), np.nan_to_num(bf), rtol=1e-12, atol=1e-12)
            if not exact:
                if close:
                    return f"FLOAT-INEXACT col={c} (would fail a hash compare!)"
                i = int(np.argmax(~np.isclose(np.nan_to_num(af), np.nan_to_num(bf))))
                return f"VALUES col={c} row{i}: spark={af[i]!r} duck={bf[i]!r}"
        else:
            eq = (a[c].astype(str).fillna("\0") == b[c].astype(str).fillna("\0"))
            if not eq.all():
                i = int(np.argmax(~eq.values))
                return f"VALUES col={c} row{i}: spark={a[c].iloc[i]!r} duck={b[c].iloc[i]!r}"
    # dtype report (informational)
    return None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        spark_df = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracle:
            print(f"  ~ {name}: rows-only ({len(spark_df)} rows)"
                  + (" EMPTY!" if len(spark_df) == 0 else ""))
            continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"  ✗ {name}: ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        err = compare(name, spark_df, duck_df)
        if err:
            print(f"  ✗ {name}: {err}")
            n_fail += 1
        else:
            # report schema diffs loosely (driver may be stricter)
            sd = {c: str(t) for c, t in spark_df.dtypes.items()}
            dd = {c: str(t) for c, t in duck_df.dtypes.items()}
            note = ""
            misma = {c: (sd.get(c), dd.get(c)) for c in sd if sd.get(c) != dd.get(c)}
            if misma:
                note = f"  [dtype diff: {misma}]"
            print(f"  ✓ {name} ({len(spark_df)} rows){note}")
            n_pass += 1
    print(f"PASS {n_pass} FAIL {n_fail}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
