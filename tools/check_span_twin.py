#!/usr/bin/env python3
"""Assert the DuckDB span-oracle SQL (Tagger.tagSpansSqlDuck) reproduces
the Java-regex scalar tagger byte-for-byte on pattern-dense fixtures.
Run after:
  sbt -batch "runMain graft.tools.DumpSpanGoldens /tmp/span_goldens.json"
"""
import json, sys
import duckdb

path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/span_goldens.json"
g = json.load(open(path))

con = duckdb.connect()
con.execute("CREATE TABLE texts (tid INT, txt VARCHAR)")
for i, item in enumerate(g["items"]):
    con.execute("INSERT INTO texts VALUES (?, ?)", [i, item["text"]])

rows = con.execute(
    f"SELECT tid, label, mention, begin_pos, end_pos, confidence "
    f"FROM {g['span_sql']} sp").fetchall()
got = {}
for tid, label, mention, b, e, c in rows:
    got.setdefault(tid, []).append((label, mention, b, e, c))

fails = 0
for i, item in enumerate(g["items"]):
    exp = sorted((t[0], t[1], t[2], t[3], t[4]) for t in item["tags"])
    act = sorted(got.get(i, []))
    if exp != act:
        fails += 1
        print(f"SPAN FAIL tid={i} text={item['text']!r}\n  scala={exp}\n  duck ={act}")

n = len(g["items"])
print(f"{n - fails}/{n} span twin checks pass")
sys.exit(1 if fails else 0)
