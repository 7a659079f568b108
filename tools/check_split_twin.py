#!/usr/bin/env python3
"""Assert the DuckDB SQL twins of the sentence splitter (G1) and greedy
chunker (G3) reproduce the Scala scalar implementations byte-for-byte on
punctuation-rich fixtures. Run after:
  sbt -batch "runMain graft.tools.DumpSplitGoldens /tmp/split_goldens.json"
"""
import json, sys
import duckdb

path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/split_goldens.json"
g = json.load(open(path))

con = duckdb.connect()
con.execute("CREATE TABLE texts (tid INT, txt VARCHAR)")
for i, item in enumerate(g["items"]):
    con.execute("INSERT INTO texts VALUES (?, ?)", [i, item["text"]])

fails = 0

rows = con.execute(
    f"SELECT tid, sent_idx, sentence FROM {g['split_sql']} s "
    "ORDER BY tid, sent_idx").fetchall()
got_split = {}
for tid, idx, s in rows:
    got_split.setdefault(tid, []).append(s)
for i, item in enumerate(g["items"]):
    got = got_split.get(i, [])
    if got != item["sentences"]:
        fails += 1
        print(f"SPLIT FAIL tid={i} text={item['text']!r}\n  scala={item['sentences']}\n  duck ={got}")

rows = con.execute(
    f"SELECT tid, chunk_idx, chunk FROM {g['chunk_sql']} ch "
    "ORDER BY tid, chunk_idx").fetchall()
got_chunk = {}
for tid, idx, c in rows:
    got_chunk.setdefault(tid, []).append(c)
for i, item in enumerate(g["items"]):
    got = got_chunk.get(i, [])
    if got != item["chunks"]:
        fails += 1
        print(f"CHUNK FAIL tid={i} text={item['text']!r}\n  scala={item['chunks']}\n  duck ={got}")

n = len(g["items"])
print(f"{2*n - fails}/{2*n} twin checks pass")
sys.exit(1 if fails else 0)
