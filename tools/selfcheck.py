#!/usr/bin/env python3
"""Regenerate the committed CORRECTNESS_SELF_*.json round-close artifacts.

Same compare as tools/check.py (type-faithful, -0.0-aware, row order
respected), but emits the {failed, n_fail, n_pass, passed, sf_dir,
verify_out} JSON the round-close protocol commits.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir> <dest.json>
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/v001"
  python3 tools/selfcheck.py /root/testdata/sf0.01 /tmp/v001 CORRECTNESS_SELF_sf001.json
"""
import duckdb, sys, json, math

sf, out, dest = sys.argv[1], sys.argv[2], sys.argv[3]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
oracle = json.load(open(f"{out}/oracle_sql.json"))

def norm(v):
    if v is None: return None
    if isinstance(v, float):
        if v != v: return ("f","nan")
        if v == 0.0: return ("f",0.0,math.copysign(1.0,v))
        return ("f",v)
    if isinstance(v, int): return ("i",v)
    return v

passed, failed, no_oracle = [], [], []
import glob, os
dirs = set(d for d in os.listdir(out) if os.path.isdir(os.path.join(out,d)))
# Union of oracle names and output dirs, mirroring the driver's check.py:
# a query that crashed and wrote no output dir must FAIL (missing output),
# not silently vanish; an output dir with no oracle is tracked separately
# as 'no_oracle' rather than counted as a pass.
names = sorted(dirs | set(oracle.keys()))
for name in names:
    try:
        if name not in dirs:
            failed.append(name); continue
        sp = con.execute(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')")
        scols = [c[0] for c in sp.description]
        srows = sp.fetchall()
        if name not in oracle:
            no_oracle.append(name); continue
        op = con.execute(oracle[name])
        ocols = [c[0] for c in op.description]
        orows = op.fetchall()
        si = sorted(range(len(scols)), key=lambda i: scols[i])
        oi = sorted(range(len(ocols)), key=lambda i: ocols[i])
        ok = (sorted(scols) == sorted(ocols) and len(srows) == len(orows))
        if ok:
            for r1, r2 in zip(srows, orows):
                if tuple(norm(r1[i]) for i in si) != tuple(norm(r2[i]) for i in oi):
                    ok = False; break
        (passed if ok else failed).append(name)
    except Exception as e:
        failed.append(name)
json.dump({"failed": failed, "n_fail": len(failed), "n_pass": len(passed),
           "no_oracle": no_oracle, "passed": passed, "sf_dir": sf,
           "verify_out": out},
          open(dest, "w"), indent=None, sort_keys=True)
print(dest, "n_pass", len(passed), "n_fail", len(failed),
      "n_no_oracle", len(no_oracle), failed[:5])
