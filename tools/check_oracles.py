#!/usr/bin/env python3
"""Driver-mimic: compare Verify's parquet dumps against the DuckDB oracles.

Usage: check_oracles.py <sfDir> <verifyOutDir>
Mirrors the driver's semantics: per query, sort columns by name, sort rows,
compare values exactly (decimals/floats via string normalization).
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p).removesuffix(".parquet")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.9g}"
    return str(v)

fails = 0
names = sorted(set(oracle) | {n for n in os.listdir(out) if os.path.isdir(f"{out}/{n}")})
for name in names:
    d = f"{out}/{name}"
    if not os.path.isdir(d):
        print(f"FAIL {name}: query produced no output (Verify error?)")
        fails += 1
        continue
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        print(f"FAIL {name}: no parquet output"); fails += 1; continue
    tbl = pq.read_table(files[0])
    if name not in oracle:
        print(f"ok   {name}: rows-only ({tbl.num_rows} rows)" if tbl.num_rows > 0
              else f"FAIL {name}: rows-only but 0 rows")
        fails += 0 if tbl.num_rows > 0 else 1
        continue
    try:
        ores = con.execute(oracle[name])
        ocols = [c[0] for c in ores.description]
        orows = ores.fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}"); fails += 1; continue
    scols = tbl.column_names
    if sorted(scols) != sorted(ocols):
        print(f"FAIL {name}: columns {sorted(scols)} != {sorted(ocols)}"); fails += 1
        continue
    # sort columns by name on both sides
    sidx = sorted(range(len(scols)), key=lambda i: scols[i])
    oidx = sorted(range(len(ocols)), key=lambda i: ocols[i])
    sdata = tbl.to_pylist()
    srows = sorted([tuple(norm(r[scols[i]]) for i in sidx) for r in sdata])
    orows2 = sorted([tuple(norm(r[i]) for i in oidx) for r in orows])
    if len(srows) != len(orows2):
        print(f"FAIL {name}: row count {len(srows)} != {len(orows2)}"); fails += 1
        continue
    if srows != orows2:
        bad = next(i for i in range(len(srows)) if srows[i] != orows2[i])
        print(f"FAIL {name}: value mismatch at sorted row {bad}:")
        print(f"  spark : {srows[bad]}")
        print(f"  duckdb: {orows2[bad]}")
        print(f"  cols  : {[scols[i] for i in sidx]}")
        fails += 1
        continue
    print(f"ok   {name}: {len(srows)} rows match")

print(f"\n{'ALL OK' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
