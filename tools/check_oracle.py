#!/usr/bin/env python3
"""Local pre-check emulating the driver's DuckDB differential oracle.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over the same
tables, sorts columns by name + rows by all columns, and compares values
exactly. Driver-side tooling only — NOT part of the Scala library.
"""
import sys, json, glob
import duckdb, pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = 0
    results = {}
    for name in sorted(oracle):
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            results[name] = "MISSING spark output"
            continue
        s = pd.concat([pd.read_parquet(p) for p in files], ignore_index=True)
        try:
            o = con.sql(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE SQL ERROR: {e}"
            continue
        s = s[sorted(s.columns)]
        o_cols_sorted = sorted(o.columns)
        if sorted(s.columns) != o_cols_sorted:
            results[name] = f"SCHEMA mismatch: spark={sorted(s.columns)} duck={o_cols_sorted}"
            continue
        o = o[o_cols_sorted]
        if len(s) != len(o):
            results[name] = f"ROWS mismatch: spark={len(s)} duck={len(o)}"
            continue
        s = s.sort_values(by=list(s.columns), ignore_index=True)
        o = o.sort_values(by=list(o.columns), ignore_index=True)
        # Driver-parity dtype KIND check: the driver hashes value
        # renderings, so an int64 Spark column vs a float64 oracle column
        # (e.g. a DuckDB HUGEINT from SUM(BIGINT) fetched as float64)
        # hash-mismatches in the driver (3 vs 3.0) even though
        # assert_frame_equal(check_dtype=False) calls them equal. This
        # exact gap hid the pack_sequences/shuffle_interleave driver-red
        # for two rounds. Width differences (int32 vs int64) render
        # identically and stay allowed.
        kind_bad = [c for c in s.columns if s[c].dtype.kind != o[c].dtype.kind]
        if kind_bad:
            results[name] = ("DTYPE-KIND mismatch (driver would hash-fail): " +
                ", ".join(f"{c}: spark={s[c].dtype} duck={o[c].dtype}" for c in kind_bad))
            continue
        try:
            pd.testing.assert_frame_equal(s, o, check_dtype=False, check_exact=True)
            results[name] = "OK"
            n_ok += 1
        except AssertionError as e:
            results[name] = "VALUE mismatch: " + str(e).replace("\n", " | ")[:400]
    for k, v in results.items():
        print(f"{'PASS' if v == 'OK' else 'FAIL'} {k}: {v}")
    print(f"\n{n_ok}/{len(oracle)} queries match")
    sys.exit(0 if n_ok == len(oracle) else 1)

if __name__ == "__main__":
    main()
