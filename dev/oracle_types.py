#!/usr/bin/env python3
"""Regenerates src/test/resources/oracle_types.txt — the recorded DuckDB
output type of every oracle SQL column, which OracleTypeGateSpec
cross-checks against the live Spark schemas in `sbt test`.

Usage: python3 dev/oracle_types.py <sfDir> <oracle_sql.json> [out]

Run after changing any SparkEntry.oracleSql entry (the spec md5-pins
each SQL string, so a changed oracle without a regenerated types file
fails the gate loudly instead of going stale):

  sbt "runMain graft.Verify /root/testdata/sf0.001 /tmp/x <name>"
  python3 dev/oracle_types.py /root/testdata/sf0.001 /tmp/x/oracle_sql.json

Why this exists: the r11/r12 standing red (`score_percentile_norm`) was
a DuckDB `sum(c) OVER` silently widening to HUGEINT, which the driver's
typed hash renders as float64 against Spark's BIGINT — values equal,
hash red, two rounds running. DESCRIBE is free; this pins it.
"""
import hashlib
import json
import sys
import glob
import os

import duckdb

sf_dir, oracle_json = sys.argv[1], sys.argv[2]
out = sys.argv[3] if len(sys.argv) > 3 else "src/test/resources/oracle_types.txt"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    t = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(oracle_json))
lines = []
for name, sql in sorted(oracle.items()):
    md5 = hashlib.md5(sql.encode("utf-8")).hexdigest()
    cols = con.execute(f"DESCRIBE {sql}").fetchall()
    # strip DECIMAL precision etc. down to the base type word
    typed = "\t".join(f"{c[0]}={c[1]}" for c in cols)
    lines.append(f"{name}\t{md5}\t{typed}")
    hug = [c[0] for c in cols if c[1] == "HUGEINT"]
    if hug:
        print(f"WARN  {name}: HUGEINT column(s) {hug} — the driver hash "
              "will see float64; CAST them in the oracle SQL")
with open(out, "w") as f:
    f.write("\n".join(lines) + "\n")
print(f"wrote {out} ({len(lines)} queries)")
