#!/usr/bin/env python3
"""Sync README.md's query/spec counts from the round artifacts.

VERDICT r14 #6: the README's "N queries" / "M ScalaTest specs" lines
drift every round because they were hand-edited. This tool reads the
counts from the artifacts instead:

  - query count: len(queries) in the round sweep record (newest
    BENCH_SWEEP_r*.json, falling back to BENCH_LOCAL.json) — the set
    the driver actually ran;
  - spec count: "Total number of tests run: N" parsed from a captured
    `sbt test` log (pass its path as --test-log), or --specs N.

Run it in the final-records commit step; it rewrites the two README
lines in place and prints what changed. Exits 1 if a requested count
could not be determined (so the commit step fails loudly instead of
shipping a stale narrative).

Usage: python3 tools/sync_readme_counts.py [--test-log sbt_test.log | --specs N]
Driver-side python only — not part of the shipped library.
"""
import glob, json, re, sys

def newest_sweep():
    recs = sorted(glob.glob("BENCH_SWEEP_r*.json"),
                  key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
    return recs[-1] if recs else "BENCH_LOCAL.json"

def main():
    args = sys.argv[1:]
    specs = None
    if "--specs" in args:
        specs = int(args[args.index("--specs") + 1])
    elif "--test-log" in args:
        log = open(args[args.index("--test-log") + 1]).read()
        m = re.findall(r"Total number of tests run: (\d+)", log)
        if not m:
            print("FAIL: no 'Total number of tests run' in the test log")
            sys.exit(1)
        specs = int(m[-1])

    rec_path = newest_sweep()
    rec = json.load(open(rec_path))
    n_queries = len(rec.get("queries", {})) + len(rec.get("failed", {}))
    if n_queries == 0:
        print(f"FAIL: {rec_path} carries no queries map")
        sys.exit(1)

    readme = open("README.md").read()
    orig = readme
    readme = re.sub(r"\(\d+ queries, oracle-checked\)",
                    f"({n_queries} queries, oracle-checked)", readme)
    if specs is not None:
        readme = re.sub(r"\d+ ScalaTest specs", f"{specs} ScalaTest specs", readme)
    if readme != orig:
        open("README.md", "w").write(readme)
        print(f"README synced: {n_queries} queries (from {rec_path})"
              + (f", {specs} specs" if specs is not None else ""))
    else:
        print(f"README already current: {n_queries} queries"
              + (f", {specs} specs" if specs is not None else ""))

if __name__ == "__main__":
    main()
