#!/usr/bin/env python3
"""Regenerate BASELINE.md's machine-readable block + table from a bench run.

Usage: python3 dev/update_baseline.py [target/bench_last.json] [note]
Reads the bench JSON (per-query minima + scaling table), rewrites the
```json block and the markdown table in BASELINE.md in place, leaving the
prose untouched.
"""
import json, re, sys

src = sys.argv[1] if len(sys.argv) > 1 else "target/bench_last.json"
note = sys.argv[2] if len(sys.argv) > 2 else "manual update"
d = json.load(open(src))
base = {
    "source": f"{note}, min of {d.get('reps', 3)} reps, local[32], sf0.1",
    "sf01": {k: round(v, 3) for k, v in sorted(d["queries"].items())},
    "sf001": {k: round(v["sf001"], 3) for k, v in sorted(d.get("scaling", {}).items())},
}
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
