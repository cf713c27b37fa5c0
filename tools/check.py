#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Runs each oracle_sql.json query in DuckDB over the sf_dir parquet tables
and compares against the Spark-written parquet in <verify_out_dir>/<name>.
Columns sorted by name; rows compared in order; floats compared exactly,
and dtypes compared STRICTLY: the driver hashes typed values, so an
oracle returning HUGEINT (DuckDB's SUM over integers) against Spark's
int64 is a failure here even when the numbers agree — r4 proved pandas'
coercing `==` masks exactly that class of driver hash mismatch.
Dev tooling only — not part of the library.
"""
import glob
import json
import sys
import time

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
    # per-query DuckDB wall time: a free cross-engine perf anchor —
    # flags queries where Spark at local[32] is grossly slower than
    # single-threaded DuckDB on identical data (VERDICT r12 #7)
    oracle_sec = {}
    for name in sorted(oracle):
        sql = oracle[name]
        got = load_result(out_dir, name)
        if got is None:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            t0 = time.perf_counter()
            exp = con.sql(sql).df()
            oracle_sec[name] = round(time.perf_counter() - t0, 3)
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
            # Driver-hash calibration (r4 evidence): integer WIDTH
            # mismatches (int32 vs int64) hash-match at the driver, but
            # KIND mismatches (int64 vs HUGEINT->float/object, float vs
            # decimal) do not. Normalize widths, stay strict on kind.
            if str(a.dtype).startswith(("int", "uint")) and str(b.dtype).startswith(("int", "uint")):
                a = a.astype("int64")
                b = b.astype("int64")
            if str(a.dtype) != str(b.dtype):
                print(f"FAIL {name}: col {c} dtype {a.dtype} vs {b.dtype}"
                      " (driver hashes typed values; cast the oracle)")
                ok = False
                break
            if str(a.dtype) == "object" and len(a) and len(b):
                ta = {type(v) for v in a if v is not None and not (isinstance(v, float) and pd.isna(v))}
                tb = {type(v) for v in b if v is not None and not (isinstance(v, float) and pd.isna(v))}
                if ta != tb:
                    print(f"FAIL {name}: col {c} object element types {ta} vs {tb}")
                    ok = False
                    break
            eq = (a.values == b.values) | (pd.isna(a).values & pd.isna(b).values)
            if not eq.all():
                i = int((~eq).argmax())
                print(f"FAIL {name}: col {c} row {i}: spark={a.iloc[i]!r} duck={b.iloc[i]!r}"
                      f" (dtype {a.dtype} vs {b.dtype})")
                ok = False
                break
        if ok:
            print(f"PASS {name} ({len(got)} rows, oracle {oracle_sec[name]}s)")
            n_pass += 1
        else:
            n_fail += 1
    with open(f"{out_dir}/oracle_times.json", "w") as f:
        json.dump(oracle_sec, f, indent=0, sort_keys=True)
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
