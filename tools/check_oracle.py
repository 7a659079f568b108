#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify,
then run each oracle SQL in DuckDB over the same parquet tables and
compare (column names sorted, rows sorted, values normalized)."""
import json, math, sys, glob, os
import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from driver_types import type_class  # one copy shared with audit_oracle_types.py

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
# names graft.Verify actually dumped THIS run (None for pre-manifest dumps):
# distinguishes fresh rows-only dirs from stale leftovers of a previous run
dumped = None
if os.path.exists(f"{out_dir}/dumped.json"):
    dumped = set(json.load(open(f"{out_dir}/dumped.json")))
elif "--only-existing" not in sys.argv:
    # Verify deletes the manifest up-front and writes it only on completion,
    # so in full-gate mode a missing manifest means the dump run CRASHED
    # mid-loop — every on-disk dir is a stale leftover and must not read as
    # a pass. (--only-existing keeps the None fallback for subset checks
    # over pre-manifest output.)
    print("FAIL: no dumped.json manifest — the Verify run crashed before "
          "completing; nothing on disk is provably fresh")
    sys.exit(1)

def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)

fails, passes, skips, missing = [], 0, 0, 0
for name in sorted(oracle):
    res_dir = f"{out_dir}/{name}"
    if not os.path.isdir(res_dir):
        if "--only-existing" in sys.argv:  # local iteration on a filtered dump
            missing += 1
            continue
        fails.append((name, "no spark output"))
        continue
    # a dir not in this run's manifest is a stale leftover: in subset mode
    # it simply wasn't selected (skip it — comparing it would let stale
    # passes defeat the typo'd-filter guard); in full-gate mode every
    # oracle query must have dumped, so a stale dir means the dump THREW
    # this run and the old output must not read as a pass
    if dumped is not None and name not in dumped:
        if "--only-existing" in sys.argv:
            missing += 1
            continue
        fails.append((name, "dump failed this run (stale dir from a previous run)"))
        continue
    try:
        spark_rows = con.execute(
            f"SELECT * FROM '{res_dir}/*.parquet'").fetchall()
        spark_cols = [d[0] for d in con.description]
        duck = con.execute(oracle[name])
        duck_cols = [d[0] for d in duck.description]
        duck_rows = duck.fetchall()
    except Exception as e:
        fails.append((name, f"exec error: {e}"))
        continue
    if sorted(spark_cols) != sorted(duck_cols):
        fails.append((name, f"schema: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"))
        continue
    # TYPE-STRICT compare (the r6 hole): the driver hashes TYPED values, so
    # a DuckDB HUGEINT column diverges from a Spark BIGINT dump even when
    # every value is equal — and the str(v) normalization below cannot see
    # it. DESCRIBE both sides and require matching column types, where
    # "matching" means the empirically driver-safe equivalence: all SIGNED
    # ints up to 64-bit are one class (CORRECTNESS_r06 hash-passed 10
    # queries whose Spark dump is INTEGER against DuckDB BIGINT oracles —
    # a signed <=64-bit int survives the driver's pandas conversion as an
    # integer value either way), while HUGEINT degrades to float64 in
    # pandas and was the r6 hash failure. Everything else (unsigned ints,
    # DECIMAL precision/scale, timestamp flavors) must match exactly.
    # type_class comes from driver_types (shared with the pre-code audit).
    try:
        s_types = {r[0]: r[1] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{res_dir}/*.parquet'").fetchall()}
        d_types = {r[0]: r[1] for r in con.execute(
            f"DESCRIBE {oracle[name]}").fetchall()}
    except Exception as e:
        fails.append((name, f"type describe error: {e}"))
        continue
    type_mismatch = [(c, s_types[c], d_types.get(c)) for c in sorted(s_types)
                     if type_class(s_types[c]) != type_class(d_types.get(c))]
    if type_mismatch:
        fails.append((name, "output types differ (driver hashes typed values): " +
                      ", ".join(f"{c}: spark={s} duck={d}"
                                for c, s, d in type_mismatch)))
        continue
    # reorder columns by sorted name, normalize, sort rows
    s_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
    d_idx = [duck_cols.index(c) for c in sorted(duck_cols)]
    s = sorted(tuple(norm(r[i]) for i in s_idx) for r in spark_rows)
    d = sorted(tuple(norm(r[i]) for i in d_idx) for r in duck_rows)
    if len(s) != len(d):
        fails.append((name, f"rowcount: spark={len(s)} duck={len(d)}"))
        continue
    if s != d:
        diff = next(i for i in range(len(s)) if s[i] != d[i])
        fails.append((name, f"values differ at row {diff}:\n  spark={s[diff]}\n  duck ={d[diff]}"))
        continue
    passes += 1
    print(f"PASS {name} ({len(s)} rows)")

# rows-only checks for non-oracle queries
fresh_skips = 0
for res_dir in sorted(glob.glob(f"{out_dir}/*/")):
    name = os.path.basename(res_dir.rstrip("/"))
    if name in oracle:
        continue
    n = con.execute(f"SELECT count(*) FROM '{res_dir}/*.parquet'").fetchone()[0]
    status = "ROWS" if n > 0 else "EMPTY!"
    print(f"{status} {name} ({n} rows)")
    skips += 1
    # no manifest at all (pre-manifest dump, or a run that crashed before
    # writing one) means NOTHING is provably fresh — leftover rows-only dirs
    # must not disarm the typo'd-filter guard below
    if dumped is not None and name in dumped:
        fresh_skips += 1

if missing:
    print(f"(--only-existing: skipped {missing} queries with no dump)")
    # a fully typo'd filter must not exit green on stale state — but a
    # subset dump whose queries are all legitimately rows-only (fresh
    # dirs in this run's dumped.json) DID get checked and must pass
    if passes == 0 and fresh_skips == 0 and not fails:
        print("FAIL: no query was freshly checked — query-name typo in the Verify filter?")
        sys.exit(1)
print(f"\n{passes} pass, {len(fails)} fail, {skips} rows-only")
for name, msg in fails:
    print(f"FAIL {name}: {msg}")
sys.exit(1 if fails else 0)
