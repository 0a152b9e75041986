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

def connect(sfdir):
    con = duckdb.connect()
    # The heavy recursive-CTE oracles (hits_2iter class) exceed DuckDB's
    # default in-memory budget at sf1 when Spark/sbt JVMs hold most of the
    # box — give DuckDB a spill directory so they complete instead of
    # raising Out of Memory. The limit is env-tunable with a HIGH default:
    # round 7 measured hits_2iter at sf1 spilling past 77 GB of /tmp under
    # a 24 GB limit (disk-full, gate red) while completing in-memory-mostly
    # under 100 GB — for these oracles RAM is strictly cheaper than spill,
    # so only cap below the default when the box is genuinely shared.
    con.sql("SET temp_directory='/tmp/duckdb_spill'")
    import os
    con.sql(f"SET memory_limit='{os.environ.get('ORACLE_MEM', '100GB')}'")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    return con

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    # Optional 3rd arg: comma-separated query-name filter (mirrors
    # graft.Verify's filter arg) for fast single-query iteration.
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_ok = 0
    results = {}
    for name in sorted(oracle):
        # Fresh connection PER QUERY: the heavy recursive-CTE oracles
        # (graph/CC family) OOM'd a shared connection at sf1 once
        # (hits_2iter, round 6) — view creation is milliseconds, so
        # isolation is effectively free and the full sf1 gate passes in
        # one invocation with no manual rerun.
        con = connect(sfdir)
        try:
            results[name] = check_one(con, oracle, outdir, name)
        finally:
            con.close()
        if results[name] == "OK":
            n_ok += 1
        # Incremental + flushed so a truncated/killed run still shows
        # which queries failed (the summary alone names no culprits).
        print(f"{'PASS' if results[name] == 'OK' else 'FAIL'} {name}: {results[name]}",
              flush=True)
    print(f"\n{n_ok}/{len(oracle)} queries match")
    sys.exit(0 if n_ok == len(oracle) else 1)

def check_one(con, oracle, outdir, name):
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            return "MISSING spark output"
        s = pd.concat([pd.read_parquet(p) for p in files], ignore_index=True)
        try:
            o = con.sql(oracle[name]).df()
        except Exception as e:
            return f"ORACLE SQL ERROR: {e}"
        s = s[sorted(s.columns)]
        o_cols_sorted = sorted(o.columns)
        if sorted(s.columns) != o_cols_sorted:
            return f"SCHEMA mismatch: spark={sorted(s.columns)} duck={o_cols_sorted}"
        o = o[o_cols_sorted]
        if len(s) != len(o):
            return f"ROWS mismatch: spark={len(s)} duck={len(o)}"
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
            return ("DTYPE-KIND mismatch (driver would hash-fail): " +
                ", ".join(f"{c}: spark={s[c].dtype} duck={o[c].dtype}" for c in kind_bad))
        try:
            pd.testing.assert_frame_equal(s, o, check_dtype=False, check_exact=True)
            return "OK"
        except AssertionError as e:
            return "VALUE mismatch: " + str(e).replace("\n", " | ")[:400]

if __name__ == "__main__":
    main()
