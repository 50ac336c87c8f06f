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
import glob, json, os, re, sys

def fail(msg):
    print(f"FAIL: {msg}")
    sys.exit(1)

def newest_sweep():
    def round_no(p):
        m = re.search(r"r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1
    recs = sorted((p for p in glob.glob("BENCH_SWEEP_r*.json")
                   if round_no(p) >= 0), key=round_no)
    if recs:
        return recs[-1]
    if os.path.exists("BENCH_LOCAL.json"):
        return "BENCH_LOCAL.json"
    fail("no BENCH_SWEEP_r*.json and no BENCH_LOCAL.json — run a sweep first")

def main():
    args = sys.argv[1:]
    specs = None
    if "--specs" in args:
        try:
            specs = int(args[args.index("--specs") + 1])
        except (IndexError, ValueError):
            fail("--specs needs an integer argument")
    elif "--test-log" in args:
        try:
            path = args[args.index("--test-log") + 1]
            log = open(path).read()
        except IndexError:
            fail("--test-log needs a path argument")
        except OSError as e:
            fail(f"cannot read test log: {e}")
        m = re.findall(r"Total number of tests run: (\d+)", log)
        if not m:
            fail(f"no 'Total number of tests run' line in {path}")
        specs = int(m[-1])

    rec_path = newest_sweep()
    try:
        rec = json.load(open(rec_path))
    except (OSError, json.JSONDecodeError) as e:
        fail(f"cannot parse {rec_path}: {e}")
    n_queries = len(rec.get("queries", {})) + len(rec.get("failed", {}))
    if n_queries == 0:
        fail(f"{rec_path} carries no queries map")

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
