#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Runs each oracle_sql.json query in DuckDB over the sf_dir parquet tables
and compares against the Spark-written parquet in <verify_out_dir>/<name>.
Columns sorted by name; rows compared in order; floats compared exactly
(strictest possible interpretation of the driver's hash compare).
Dev tooling only — not part of the library.
"""
import glob
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def load_result(out_dir, name):
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    if not files:
        return None
    con = duckdb.connect()
    return con.sql(
        "SELECT * FROM read_parquet([" + ",".join(f"'{f}'" for f in files) + "])"
    ).df()


def canon(df):
    df = df[sorted(df.columns)]
    return df


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        got = load_result(out_dir, name)
        if got is None:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        got, exp = canon(got), canon(exp)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            n_fail += 1
            continue
        ok = True
        for c in got.columns:
            a, b = got[c], exp[c]
            if str(a.dtype).startswith("datetime") or str(b.dtype).startswith("datetime"):
                a = pd.to_datetime(a).astype("datetime64[us]")
                b = pd.to_datetime(b).astype("datetime64[us]")
            eq = (a.values == b.values) | (pd.isna(a).values & pd.isna(b).values)
            if not eq.all():
                i = int((~eq).argmax())
                print(f"FAIL {name}: col {c} row {i}: spark={a.iloc[i]!r} duck={b.iloc[i]!r}"
                      f" (dtype {a.dtype} vs {b.dtype})")
                ok = False
                break
        if ok:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
