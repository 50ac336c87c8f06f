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
a quiet value under half the clean re-run mis-prices the 3x isolation
trigger and burns isolation slots on phantom regressions (the r12
drift: t56 quiet 0.33 vs clean re-run 0.68 after the native-kernel
work changed the plan). Raises are MECHANICALLY gated (learned r13 —
a first pass raised 16 entries from sweep-context numbers that an
isolated re-run then pulled back 1.3-2.7x): a raise only applies when
the record carries a flat-probe ISOLATION entry for that query (a
genuinely clean idle re-run); a stale-low candidate without one is
NOT raised — it is printed as a follow-up list to re-run alone via
SPARK_GRAFT_BENCH_ONLY, then merged from that record with
--raise-stale-trusted (which treats the record's own values as clean:
correct ONLY for a dedicated narrow idle-box run). The canary gate
applies as usual and raises are recorded in provenance. Without the
flag the tool is min-only (raising from a contended sweep would
poison the map; mins cannot).

Driver-side python only — not part of the shipped library.
"""
import json, sys

args = [a for a in sys.argv[1:] if not a.startswith("--")]
raise_trusted = "--raise-stale-trusted" in sys.argv[1:]
raise_stale = raise_trusted or "--raise-stale" in sys.argv[1:]
local_p = args[0] if len(args) > 0 else "BENCH_LOCAL.json"
quiet_p = args[1] if len(args) > 1 else "BENCH_QUIET.json"

local = json.load(open(local_p))
quiet = json.load(open(quiet_p))
tail = json.load(open("BENCH_TAIL.json"))
canary = tail.get("noise_refs_sec")
if canary is None or canary > 12.0:
    print(f"REFUSE: refs canary {canary} > 12 s — not quiet enough to curate from")
    sys.exit(1)

# --raise-stale-trusted is only sound for a dedicated narrow idle-box
# run (ADVICE r13): check that MECHANICALLY instead of trusting operator
# discipline — the record must cover only a small follow-up subset
# (evidence of SPARK_GRAFT_BENCH_ONLY) AND its start/mid/end probes must
# be flat; a full contended sweep fed through the trusted path would
# silently bake sweep-context pressure into the quiet map.
if raise_trusted:
    n_rec = len(local.get("queries", {}))
    n_quiet = max(1, len(quiet.get("queries", {})))
    narrow_cap = max(16, n_quiet // 4)
    probes = [p for p in local.get("probe_start_mid_end", []) if p is not None]
    flat = bool(probes) and max(probes) <= 2 * max(0.05, min(probes))
    if n_rec > narrow_cap or not flat:
        print(f"REFUSE --raise-stale-trusted: record covers {n_rec} queries "
              f"(narrow cap {narrow_cap}) and probes are "
              f"{'flat' if flat else 'NOT flat'} ({probes}) — trusted raises "
              "require a dedicated SPARK_GRAFT_BENCH_ONLY follow-up run with "
              "flat probes; use --raise-stale for the isolation-gated path")
        sys.exit(1)

iso = local.get("isolation", {})
# an unadjudicated isolation ran under a never-flat probe: its value is
# contention and must never RAISE the quiet map (min-merging stays safe
# — contention only makes numbers larger)
unadj = set(local.get("isolation_unadjudicated_quiet", {}))
updated = []
raised = []
skipped_raises = []
for name, sec in local.get("queries", {}).items():
    # the clean re-run value: the isolated min when this sweep re-ran
    # the query alone (flat-probe-gated by the engine), else the sweep
    # min — raises must not bake sweep-context pressure into the map
    has_iso = iso.get(name, -1.0) >= 0 and name not in unadj
    clean = min(sec, iso[name]) if has_iso else sec
    old = quiet["queries"].get(name)
    if old is None or clean < old:
        quiet["queries"][name] = clean
        updated.append((name, old, clean))
    elif raise_stale and old < clean / 2:
        # mechanical gate (r13): only a flat-probe isolation entry — or
        # a --raise-stale-trusted dedicated narrow run — counts as a
        # clean source for a RAISE; a bare sweep value may be
        # sweep-context pressure
        if has_iso or raise_trusted:
            quiet["queries"][name] = clean
            raised.append((name, old, clean))
        else:
            skipped_raises.append((name, old, clean))

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
if skipped_raises:
    names = ",".join(n for n, _, _ in skipped_raises)
    for name, old, new in sorted(skipped_raises, key=lambda t: -(t[2] or 0)):
        print(f"SKIPPED raise {name}: {old:.3f} vs sweep {new:.3f} — no clean source")
    print(f"follow up: SPARK_GRAFT_BENCH_ONLY={names} run alone, then "
          "merge that record with --raise-stale-trusted")
print(f"{len(updated)} quiet mins updated, {len(raised)} stale-low raised, "
      f"{len(skipped_raises)} raises skipped (canary {canary} s)")
