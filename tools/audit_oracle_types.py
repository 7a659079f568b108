#!/usr/bin/env python3
"""One-shot mechanical audit of oracle OUTPUT types: DESCRIBE every query
in an oracle_sql.json against DuckDB views over the test tables and assert
each output column type is in the Spark-exact, driver-safe whitelist.

Run when ADDING a gate, before any Spark code exists:
  sbt -batch "runMain graft.tools.DumpOracleSql /tmp/oracle_sql.json"
  python3 tools/audit_oracle_types.py /root/testdata/sf0.001 /tmp/oracle_sql.json

The class this closes (the r6 sole hash failure): DuckDB `sum(BIGINT)`
returns HUGEINT — pandas degrades int128 to float64, so the driver's typed
hash diverges from Spark's BIGINT even when every value matches, while the
str(v)-normalizing row compare in check_oracle.py sees nothing. The
whitelist (ONE copy, shared with check_oracle.py: tools/driver_types.py)
is the set every current oracle emits AND the driver provably hashes equal
to the Spark parquet dump. Anything else — HUGEINT, unsigned ints, other
decimal shapes, timestamps, arrays/structs — fails loudly here; either
cast it in the oracle SQL or extend driver_types.py WITH driver evidence.
"""
import glob
import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from driver_types import WHITELIST  # one copy shared with check_oracle.py

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
oracle_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/oracle_sql.json"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(oracle_path))
if not oracle:
    # an empty/stale dump would otherwise pass vacuously — the exact
    # vacuous-green class check_oracle.py's manifest guard closes
    print(f"FAIL: zero oracles in {oracle_path} (stale or empty dump?)")
    sys.exit(1)
bad, errs = [], []
for name in sorted(oracle):
    try:
        desc = con.execute(f"DESCRIBE {oracle[name]}").fetchall()
    except Exception as e:
        errs.append((name, str(e)))
        continue
    for row in desc:
        col, typ = row[0], row[1]
        if typ not in WHITELIST:
            bad.append((name, col, typ))

for name, col, typ in bad:
    print(f"FAIL {name}: column '{col}' is {typ} — not Spark-exact/driver-safe")
for name, msg in errs:
    print(f"FAIL {name}: DESCRIBE error: {msg}")
print(f"{len(oracle)} oracles audited, {len(bad)} offending columns, "
      f"{len(errs)} describe errors")
sys.exit(1 if (bad or errs) else 0)
