#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB against the sf tables, compare (column-name-sorted, row-sorted,
exact values) to the Spark parquet dumps from graft.Verify.

Usage: python3 tools/check_oracle.py [sfDir] [verifyOutDir]
NOT part of the shipped library (driver-side python only).
"""
import duckdb, json, sys

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        exp = con.sql(sql).df()
        got = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
        exp = exp.reindex(sorted(exp.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(exp.columns) != list(got.columns):
            fails.append(name)
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            continue
        exp_s = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
        got_s = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        ok = exp_s.equals(got_s)
        print(("OK  " if ok else "FAIL"), name, f"({len(got)} rows)")
        if not ok:
            fails.append(name)
            print("  dtypes exp:", dict(exp_s.dtypes.astype(str)))
            print("  dtypes got:", dict(got_s.dtypes.astype(str)))
            diff = exp_s.compare(got_s) if exp_s.shape == got_s.shape else None
            print("  rows exp/got:", len(exp_s), len(got_s))
            if diff is not None and len(diff):
                print(diff.head(10))
            else:
                print("  exp head:\n", exp_s.head(3))
                print("  got head:\n", got_s.head(3))
    except Exception as e:
        fails.append(name)
        print("ERR ", name, repr(e))

print("\n== RESULT:", "ALL PASS" if not fails else f"FAILS: {fails}")
sys.exit(1 if fails else 0)
