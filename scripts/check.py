#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only, not part
of the library): reads Verify output parquet per query, runs the oracle SQL
in DuckDB over the same testdata tables, compares schema + values after
sorting columns by name (and rows, as a safety net).

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import sys, os, json
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()

# sha1-oracle probe (round-10 directive): a13_purchases_ordered and
# b3_buyer_spend output sha1 digests; DuckDB grew core sha1() in 1.1. Print
# the capability on every run so the version pin that keeps those two rows
# golden-digest-only (EtlSpec) is machine-visible evidence, not folklore.
try:
    con.sql("SELECT sha1('probe')")
    _sha1 = "available - the sha1 queries could be promoted to full oracle"
except Exception:
    _sha1 = "UNAVAILABLE - sha1 rows stay golden-digest-pinned (EtlQueries.scala)"
print(f"  oracle: duckdb {duckdb.__version__}, sha1() {_sha1}")
for t in ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def canon(rel):
    cols = sorted(rel.columns)
    df = rel.df()[cols]
    return df

passed, failed = [], []
for name in sorted(os.listdir(out_dir)):
    qdir = os.path.join(out_dir, name)
    if not os.path.isdir(qdir):
        continue
    spark_rel = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
    if name not in oracle:
        n = len(spark_rel.fetchall())
        status = f"rows-only ({n} rows)" + (" EMPTY!" if n == 0 else "")
        print(f"  ~ {name}: {status}")
        continue
    try:
        oracle_rel = con.sql(oracle[name])
        sdf, odf = canon(spark_rel), canon(oracle_rel)
        if list(sdf.columns) != list(odf.columns):
            failed.append(name)
            print(f"  X {name}: COLUMN MISMATCH spark={list(sdf.columns)} oracle={list(odf.columns)}")
            continue
        if [str(t) for t in sdf.dtypes] != [str(t) for t in odf.dtypes]:
            print(f"  ! {name}: dtype diff spark={list(map(str, sdf.dtypes))} oracle={list(map(str, odf.dtypes))}")
        if len(sdf) != len(odf):
            failed.append(name)
            print(f"  X {name}: ROW COUNT spark={len(sdf)} oracle={len(odf)}")
            continue
        svals = sdf.sort_values(by=list(sdf.columns), kind="mergesort").reset_index(drop=True)
        ovals = odf.sort_values(by=list(odf.columns), kind="mergesort").reset_index(drop=True)
        svals.columns = ovals.columns
        neq = (svals.fillna("<null>").astype(str) != ovals.fillna("<null>").astype(str))
        if neq.any().any():
            failed.append(name)
            bad_cols = [c for c in svals.columns if neq[c].any()]
            print(f"  X {name}: VALUE MISMATCH in {bad_cols}")
            for c in bad_cols[:3]:
                idx = neq[c].idxmax()
                print(f"      {c}[{idx}]: spark={svals[c][idx]!r} oracle={ovals[c][idx]!r}")
        else:
            passed.append(name)
            print(f"  + {name}: OK ({len(sdf)} rows)")
    except Exception as e:
        failed.append(name)
        print(f"  X {name}: ORACLE ERROR {e}")

print(f"\n{len(passed)} passed, {len(failed)} failed")
sys.exit(1 if failed else 0)
