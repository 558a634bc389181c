#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle hash compare.

Usage: python3 tools/check.py [sfDir] [verifyOutDir] [only_query ...]

Reads oracle_sql.json + per-query spark parquet from verifyOutDir, runs each
oracle SQL in DuckDB over the sfDir parquet tables, and compares cell-by-cell
(columns sorted by name, row order as produced — queries must end in a total
ORDER BY). Stricter than any hash: exact equality, NaN==NaN, None==None.
"""
import duckdb, sys, json, glob

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails, passes = [], []

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        return ("f", v) if v == v else ("f", "nan")
    if isinstance(v, (int,)):
        return ("f", float(v)) if float(v) == v else ("i", v)
    return v

for name in sorted(oracle):
    if only and name not in only:
        continue
    sql = oracle[name]
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: missing spark output"); fails.append(name); continue
    try:
        ocur = con.execute(sql)
        ocols = [d[0] for d in ocur.description]
        orows = ocur.fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {str(e)[:200]}"); fails.append(name); continue
    scur = con.execute(f"SELECT * FROM read_parquet('{files[0]}')")
    scols = [d[0] for d in scur.description]
    srows = scur.fetchall()
    if sorted(ocols) != sorted(scols):
        print(f"FAIL {name}: columns oracle={sorted(ocols)} spark={sorted(scols)}")
        fails.append(name); continue
    if len(orows) != len(srows):
        print(f"FAIL {name}: rows oracle={len(orows)} spark={len(srows)}")
        fails.append(name); continue
    operm = sorted(range(len(ocols)), key=lambda i: ocols[i])
    sperm = sorted(range(len(scols)), key=lambda i: scols[i])
    bad = None
    for ri, (orow, srow) in enumerate(zip(orows, srows)):
        ov = tuple(norm(orow[i]) for i in operm)
        sv = tuple(norm(srow[i]) for i in sperm)
        if ov != sv:
            bad = (ri, ov, sv); break
    if bad:
        ri, ov, sv = bad
        print(f"FAIL {name}: row {ri} differs\n  cols : {sorted(ocols)}\n  oracle: {ov}\n  spark : {sv}")
        fails.append(name)
    else:
        print(f"PASS {name}: {len(orows)} rows")
        passes.append(name)

print(f"\n{len(passes)} passed, {len(fails)} failed" + (f": {fails}" if fails else ""))
sys.exit(1 if fails else 0)
