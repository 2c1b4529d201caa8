#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle compare.

Usage: python3 tools/parity.py /root/testdata/sf0.01 /tmp/v01
Reads <out>/oracle_sql.json, runs each SQL in DuckDB over views named after
the sf-dir parquet tables, reads the Spark parquet dump for the same key,
sorts columns by name, and compares rows / dtypes / values exactly.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    t = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
keys = sorted(d for d in os.listdir(out_dir) if os.path.isdir(f"{out_dir}/{d}"))
fails = []
# Verify's manifest makes a Spark-side query crash loud (ADVICE r17):
# a thrown query has no dump dir, so without this the denominator would
# silently shrink and the sweep would print e.g. "387/387 green".
mpath = f"{out_dir}/manifest.json"
if os.path.exists(mpath):
    man = json.load(open(mpath))
    for k in man.get("failed", []):
        print(f"{k:24s} SPARK QUERY FAILED (see Verify log)")
        fails.append(k)
    missing = sorted(set(man.get("swept", [])) - set(keys) - set(man.get("failed", [])))
    for k in missing:
        print(f"{k:24s} MISSING DUMP (swept but no parquet dir)")
        fails.append(k)
    keys = sorted(set(keys) | set(fails))
else:
    print("WARNING: no manifest.json — crashed queries would be invisible; "
          "re-run graft.Verify from current HEAD")
for k in keys:
    if k in fails:
        continue  # failed/missing per manifest — already reported above
    spark_files = glob.glob(f"{out_dir}/{k}/*.parquet")
    sdf = con.sql(f"SELECT * FROM read_parquet({spark_files!r})").df()
    if k not in oracle:
        print(f"{k:24s} rows-only: {len(sdf)} rows")
        continue
    try:
        odf = con.sql(oracle[k]).df()
    except Exception as e:
        print(f"{k:24s} ORACLE SQL ERROR: {str(e)[:160]}")
        fails.append(k); continue
    sdf = sdf.reindex(sorted(sdf.columns), axis=1)
    odf = odf.reindex(sorted(odf.columns), axis=1)
    problems = []
    if list(sdf.columns) != list(odf.columns):
        problems.append(f"cols spark={list(sdf.columns)} oracle={list(odf.columns)}")
    elif len(sdf) != len(odf):
        problems.append(f"rows spark={len(sdf)} oracle={len(odf)}")
    else:
        if list(map(str, sdf.dtypes)) != list(map(str, odf.dtypes)):
            problems.append(f"dtypes spark={list(map(str,sdf.dtypes))} oracle={list(map(str,odf.dtypes))}")
        for c in sdf.columns:
            a, b = sdf[c], odf[c]
            if a.dtype == object or b.dtype == object:
                # list/array cells: canonicalize to tuples so == is scalar
                canon = lambda v: tuple(v.tolist()) if hasattr(v, "tolist") \
                    else (tuple(v) if isinstance(v, list) else v)
                a, b = a.map(canon), b.map(canon)
            neq = ~((a == b) | (a.isna() & b.isna()))
            if neq.any():
                i = neq.idxmax()
                problems.append(f"col {c}: {int(neq.sum())} diffs, first@{i}: spark={a[i]!r} oracle={b[i]!r}")
    if problems:
        fails.append(k)
        print(f"{k:24s} FAIL  " + " | ".join(problems)[:400])
    else:
        print(f"{k:24s} OK    ({len(sdf)} rows)")
print(f"\n{len(keys)-len(fails)}/{len(keys)} green" + (f"; FAILING: {fails}" if fails else ""))
# Machine-readable summary (ADVICE r18): the sweep ledger records THIS
# tally — parity.py's actual pass/fail verdict — instead of inferring
# green from Verify's manifest (which only knows about Spark-side
# crashes, not value mismatches).
with open(f"{out_dir}/parity_summary.json", "w") as f:
    json.dump({"green": len(keys) - len(fails), "total": len(keys),
               "failing": sorted(fails)}, f)
sys.exit(1 if fails else 0)
