#!/usr/bin/env python3
"""Fold a sweep's per-query mins into the curated quiet map.

BASELINE.md's curation rule: BENCH_QUIET.json may take per-query MINS
from any same-code sweep whose refs canary lands <= ~12 s (per-query
mins are robust to transient contention in a way the sweep total is
not — contention can only make a min LARGER). This tool applies that
rule mechanically and records provenance.

Usage: python3 tools/merge_quiet.py [BENCH_LOCAL.json] [BENCH_QUIET.json]
Driver-side python only — not part of the shipped library.
"""
import json, sys

local_p = sys.argv[1] if len(sys.argv) > 1 else "BENCH_LOCAL.json"
quiet_p = sys.argv[2] if len(sys.argv) > 2 else "BENCH_QUIET.json"

local = json.load(open(local_p))
quiet = json.load(open(quiet_p))
tail = json.load(open("BENCH_TAIL.json"))
canary = tail.get("noise_refs_sec")
if canary is None or canary > 12.0:
    print(f"REFUSE: refs canary {canary} > 12 s — not quiet enough to curate from")
    sys.exit(1)

updated = []
for name, sec in local.get("queries", {}).items():
    old = quiet["queries"].get(name)
    if old is None or sec < old:
        quiet["queries"][name] = sec
        updated.append((name, old, sec))

prov = quiet.setdefault("curation", [])
if updated:
    prov.append({"from_canary_sec": canary, "n_updated": len(updated)})
    json.dump(quiet, open(quiet_p, "w"))
for name, old, new in sorted(updated, key=lambda t: -(t[1] or 0)):
    print(f"{name}: {old if old is not None else 'absent'} -> {new:.3f}")
print(f"{len(updated)} quiet mins updated (canary {canary} s)")
