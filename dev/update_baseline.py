#!/usr/bin/env python3
"""Regenerate BASELINE.md's machine-readable block + table from a bench run.

Usage: python3 dev/update_baseline.py [target/bench_last.json] [note]
Reads the bench JSON (per-query minima + scaling table), rewrites the
```json block and the markdown table in BASELINE.md in place, leaving the
prose untouched.

Quiet-host gate (r14 verdict #7): a loaded host uniformly inflates
walls 1.1-4x (the r14 closing artifact recorded 1.15x that a quiet
re-run measured at 1.01x), and a baseline recorded from such a run
poisons every later comparison. Refuse to record when 1-minute load
average is >= 0.5 unless --force is passed.
"""
import json, os, re, sys

args = [a for a in sys.argv[1:]
        if a not in ("--force", "--merge-min", "--adjudicate")]
force = "--force" in sys.argv[1:]
# --adjudicate: re-record the floors of EXACTLY the queries in this
# (usually subset) run — replacing the standing entry UP or DOWN with
# the run's minimum — and leave every other standing entry untouched.
# This is the sanctioned path for clearing reproducible-on-idle drift
# flags (r17 verdict #6): the only-improves ratchet (--merge-min)
# otherwise accumulates permanent false flags when a floor recorded in
# an exceptionally warm window stops being reachable. Quiet-host gate
# still applies in full.
adjudicate = "--adjudicate" in sys.argv[1:]
# --merge-min: NEVER raise an existing per-query baseline — take
# min(standing, this run) per query and add first entries for queries
# the standing block lacks. The safe mode when a capture self-marks
# quiet but the walls look uniformly host-inflated anyway (the
# phantom-contention signature uptime cannot see from inside the VM):
# existing baselines only improve, new queries get a conservative-HIGH
# first entry that later quiet runs ratchet down.
merge_min = "--merge-min" in sys.argv[1:]
src = args[0] if len(args) > 0 else "target/bench_last.json"
note = args[1] if len(args) > 1 else "manual update"
d = json.load(open(src))
# Driver wrappers (BENCH_rN.json) carry {"rc": N, "parsed": {...}}. A
# non-zero rc means the bench was KILLED mid-run (r16: rc 124 timeout,
# parsed null) — whatever numbers survive are a partial run and must
# never become a baseline. Refuse loudly; unwrap a clean rc-0 wrapper.
if "rc" in d and "queries" not in d:
    if d.get("rc") != 0:
        sys.exit(f"refusing a driver wrapper with rc={d.get('rc')} — the "
                 "bench did not complete; re-run the bench and record from "
                 "its own artifact (target/bench_last.json)")
    if not isinstance(d.get("parsed"), dict):
        sys.exit("driver wrapper has rc=0 but parsed is not an object — "
                 "nothing to record")
    d = d["parsed"]
# An incrementally-flushed bench_last.json left by a KILLED run marks
# itself partial — its minima may be 1-sample and its query list a
# prefix. Good enough to diagnose a timeout, never to set a baseline.
if d.get("partial") and not force:
    sys.exit(f"refusing a partial bench artifact (stage "
             f"{d.get('stage')!r}, {d.get('n_done')} queries done) — the "
             "run was killed mid-suite; re-run to completion or pass "
             "--force")
# prefer the load the BENCH saw before it started (it records
# load1_start since r15); fall back to current load for older artifacts —
# but say so loudly, because the fallback checks the wrong instant (it
# can block a quiet-bench artifact examined during a build, or pass a
# hot-bench artifact examined later on a quiet host).
# distinguish the three artifact generations: key present with a
# number (r16 bench, the real gate), key present but null (r16 bench
# on a platform whose MXBean returns -1: load is UNKNOWN, not quiet —
# d.get() would conflate this with the legacy case and fall through to
# the wrong-instant fallback), key absent (pre-r15 artifact).
if "load1_start" in d:
    load1 = d["load1_start"]
    if load1 is None or load1 < 0:
        # unknown host load (the bench also stamps load_gate:"unknown")
        # — don't let it slip the gate (r15 ADVICE #1)
        if not force:
            sys.exit("refusing to record a baseline from a run with "
                     "unknown host load (load1_start null/negative, "
                     "load_gate unknown); measure load manually and pass "
                     "--force if the host was quiet")
        load1 = None  # forced past the gate; numeric checks don't apply
else:
    load1 = os.getloadavg()[0]
    print(f"WARNING: artifact lacks load1_start; gating on CURRENT load "
          f"{load1:.2f} (record time, not bench time) — prefer a fresh "
          "bench whose artifact carries load1_start", file=sys.stderr)
if load1 is not None and load1 >= 0.5 and not force:
    sys.exit(f"refusing to record a baseline from a run started at load "
             f"{load1:.2f} >= 0.5 (walls would be host-inflated); re-run "
             "on a quiet host or pass --force")
# Failed queries record the -1.0 sentinel (Bench.scala) — a baseline
# must never carry one: in plain mode it would poison later ratios, in
# merge mode min(prev, -1.0) would silently DESTROY a good standing
# entry (r16 ADVICE #2). Drop them loudly; prev entries survive.
failed = sorted(k for k, v in d["queries"].items() if v < 0)
if failed:
    print(f"WARNING: skipping {len(failed)} failed queries (-1.0 "
          f"sentinel): {', '.join(failed)}", file=sys.stderr)
base = {
    "source": f"{note}, min of {d.get('reps', 3)} reps, local[32], sf0.1",
    "sf01": {k: round(v, 3) for k, v in sorted(d["queries"].items())
             if v >= 0},
    "sf001": {k: round(v["sf001"], 3)
              for k, v in sorted(d.get("scaling", {}).items())
              if v["sf001"] >= 0},
}
if merge_min or adjudicate:
    md0 = open("BASELINE.md").read()
    m = re.search(r"```json\n(.*?)\n```", md0, flags=re.S)
    old = json.loads(m.group(1)) if m else {}
    for tier in ("sf01", "sf001"):
        prev = old.get(tier, {})
        merged = dict(prev)
        for k, v in base[tier].items():
            if adjudicate:
                if k in prev and v > prev[k]:
                    print(f"adjudicate: {tier}/{k} floor raised "
                          f"{prev[k]} -> {v}", file=sys.stderr)
                merged[k] = v
            else:
                merged[k] = min(prev[k], v) if k in prev else v
        base[tier] = dict(sorted(merged.items()))
    mode = "adjudicate" if adjudicate else "min-merge"
    base["source"] = f"{note} ({mode}), local[32], sf0.1"
rows = "\n".join(
    f"| {k} | {base['sf001'].get(k, '')} | {v} |" for k, v in base["sf01"].items())
md = open("BASELINE.md").read()
md = re.sub(r"```json\n.*?\n```",
            "```json\n" + json.dumps(base, separators=(",", ":")) + "\n```",
            md, count=1, flags=re.S)
md = re.sub(r"\| query \| sf0\.01 min \(s\) \| sf0\.1 min \(s\) \|\n\|---\|---\|---\|\n(\|.*\n)+",
            "| query | sf0.01 min (s) | sf0.1 min (s) |\n|---|---|---|\n" + rows + "\n",
            md, count=1)
open("BASELINE.md", "w").write(md)
total = sum(v for v in base["sf01"].values() if v >= 0)
print(f"BASELINE.md updated: {len(base['sf01'])} queries, total {total:.1f}s")
