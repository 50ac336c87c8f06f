#!/usr/bin/env python3
"""Fold a sweep's per-query mins into the curated quiet map.

BASELINE.md's curation rule: BENCH_QUIET.json may take per-query MINS
from any same-code sweep whose refs canary lands <= ~12 s (per-query
mins are robust to transient contention in a way the sweep total is
not — contention can only make a min LARGER). This tool applies that
rule mechanically and records provenance.

Usage: python3 tools/merge_quiet.py [BENCH_LOCAL.json] [BENCH_QUIET.json]
         [--raise-stale]

--raise-stale (VERDICT r12 #5): also RAISE stale-LOW quiet entries —
a quiet value under half this sweep's min mis-prices the 3x isolation
trigger and burns isolation slots on phantom regressions (the r12
drift: t56 quiet 0.33 vs clean re-run 0.68 after the native-kernel
work changed the plan). Only meaningful on a verified-quiet sweep:
the canary gate applies as usual, and raises are recorded separately
in provenance. Without the flag the tool is min-only (raising from a
contended sweep would poison the map; mins cannot).

Procedure note (learned r13): a raise whose source is a SWEEP value —
the query had no isolation entry, so its "clean" value is really a
sweep-context number — can bake in sweep pressure. Always follow a
raise pass with an isolated SPARK_GRAFT_BENCH_ONLY re-run of the
raised names and a plain min-merge of that record: it pulls every
over-raise back to the true idle-box value.

Driver-side python only — not part of the shipped library.
"""
import json, sys

args = [a for a in sys.argv[1:] if not a.startswith("--")]
raise_stale = "--raise-stale" in sys.argv[1:]
local_p = args[0] if len(args) > 0 else "BENCH_LOCAL.json"
quiet_p = args[1] if len(args) > 1 else "BENCH_QUIET.json"

local = json.load(open(local_p))
quiet = json.load(open(quiet_p))
tail = json.load(open("BENCH_TAIL.json"))
canary = tail.get("noise_refs_sec")
if canary is None or canary > 12.0:
    print(f"REFUSE: refs canary {canary} > 12 s — not quiet enough to curate from")
    sys.exit(1)

iso = local.get("isolation", {})
# an unadjudicated isolation ran under a never-flat probe: its value is
# contention and must never RAISE the quiet map (min-merging stays safe
# — contention only makes numbers larger)
unadj = set(local.get("isolation_unadjudicated_quiet", {}))
updated = []
raised = []
for name, sec in local.get("queries", {}).items():
    # the clean re-run value: the isolated min when this sweep re-ran
    # the query alone (flat-probe-gated by the engine), else the sweep
    # min — raises must not bake sweep-context pressure into the map
    clean = min(sec, iso[name]) if iso.get(name, -1.0) >= 0 else sec
    old = quiet["queries"].get(name)
    if old is None or clean < old:
        quiet["queries"][name] = clean
        updated.append((name, old, clean))
    elif raise_stale and name not in unadj and old < clean / 2:
        quiet["queries"][name] = clean
        raised.append((name, old, clean))

prov = quiet.setdefault("curation", [])
if updated or raised:
    entry = {"from_canary_sec": canary, "n_updated": len(updated)}
    if raised:
        entry["n_raised_stale"] = len(raised)
        entry["raised"] = {n: [o, s] for n, o, s in raised}
    prov.append(entry)
    json.dump(quiet, open(quiet_p, "w"))
for name, old, new in sorted(updated, key=lambda t: -(t[1] or 0)):
    print(f"{name}: {old if old is not None else 'absent'} -> {new:.3f}")
for name, old, new in sorted(raised, key=lambda t: -(t[2] or 0)):
    print(f"RAISED {name}: {old:.3f} -> {new:.3f} (stale-low vs clean re-run)")
print(f"{len(updated)} quiet mins updated, {len(raised)} stale-low raised (canary {canary} s)")
