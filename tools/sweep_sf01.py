#!/usr/bin/env python3
"""sf0.1 validation sweep: run every oracle whose DuckDB side is not
known-quadratic/recursive against the sf0.1 Verify dump.

The excluded names embed O(n^2) pair generation or a recursive transitive
closure in the ORACLE SQL itself (the Spark side is fine) and stay
sf0.01-gated: d02 (exact pair set), d02a (same pairs), d03 (all-pairs
jaccard), d04a (brute-force hamming identity), d05 (all-pairs cosine),
d06 (recursive closure), a02a (exact neighbor sets).

Usage: python3 tools/sweep_sf01.py [sfDir] [verifyOut]
"""
import sys, os, json, math
import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_sf01"
SKIP = {"d02_minhash_lsh", "d02a_minhash_audit", "d03_jaccard_pairs",
        "d04a_simhash_audit", "d05_embedding_neardup", "d06_dedup_clusters",
        "a02a_lsh_audit",
        # d09/p02 ORACLEs embed the exact |train|x|probe| cross pair set
        "d09_cross_corpus_neardup", "p02_contamination_report",
        # p03 ORACLE embeds the recursive exact-pair closure
        "p03_neardup_consolidation"}

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
con = duckdb.connect()
for t in TABLES:
    p = f"{SF}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if isinstance(v, (list, tuple))
                              or type(v).__name__ == "ndarray" else v)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

npass = nfail = nskip = 0
for name in sorted(oracle):
    if name in SKIP:
        nskip += 1
        continue
    spath = f"{OUT}/{name}"
    if not os.path.isdir(spath):
        print(f"FAIL  {name}: no spark output")
        nfail += 1
        continue
    sp = canon(duckdb.sql(f"SELECT * FROM '{spath}/*.parquet'").df())
    orc = canon(con.execute(oracle[name]).df())
    ok = sp.shape == orc.shape
    if ok:
        for c in sp.columns:
            a, b = sp[c], orc[c]
            if a.dtype.kind != b.dtype.kind:
                ok = False; break
            if a.dtype.kind == "f":
                eq = [(x == y) or (isinstance(x, float) and isinstance(y, float)
                      and math.isnan(x) and math.isnan(y))
                      for x, y in zip(a, b)]
                if not all(eq):
                    ok = False; break
            elif not (a.values == b.values).all():
                ok = False; break
    print(("PASS " if ok else "FAIL ") + f" {name} ({len(sp)} rows)")
    npass += ok
    nfail += not ok
print(f"== {npass} pass, {nfail} fail, {nskip} skipped (sf0.01-gated O(n^2) oracles) ==")
sys.exit(1 if nfail else 0)
