#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/check.py [sfDir] [verifyOut]

Loads each <verifyOut>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOut>/oracle_sql.json in DuckDB over the
sfDir parquet tables, sorts columns by name and rows by all columns, and
compares cell-by-cell (exact, plus a float-tolerance diagnostic so we can
tell "bitwise off" from "wrong").
"""
import sys, os, json, glob, math
import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    p = f"{SF}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify unhashable cells (lists/arrays) for sorting
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if isinstance(v, (list, tuple)) or
                              type(v).__name__ == "ndarray" else v)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

def cmp_cell(a, b):
    """returns (exact, close)"""
    if a is None and b is None:
        return True, True
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return (a == b,) * 2
        if math.isnan(af) and math.isnan(bf):
            return True, True
        exact = af == bf
        close = exact or abs(af - bf) <= 1e-9 * max(1.0, abs(af), abs(bf))
        return exact, close
    if pd.isna(a) and pd.isna(b):
        return True, True
    return (str(a) == str(b),) * 2

n_pass = n_close = n_fail = 0
for name in sorted(oracle):
    path = f"{OUT}/{name}"
    if not os.path.isdir(path):
        print(f"FAIL  {name}: no spark output at {path}")
        n_fail += 1
        continue
    files = glob.glob(f"{path}/*.parquet")
    spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    try:
        duck_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"FAIL  {name}: oracle SQL error: {e}")
        n_fail += 1
        continue
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        print(f"FAIL  {name}: columns spark={sorted(spark_df.columns)} "
              f"duck={sorted(duck_df.columns)}")
        n_fail += 1
        continue
    if len(spark_df) != len(duck_df):
        print(f"FAIL  {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
        n_fail += 1
        continue
    # dtype-strict: the driver's hash distinguishes 3600 (int64) from
    # 3600.0 (DOUBLE) even when float() would compare equal. Compare the
    # pandas dtype *kind* per column ('i'/'u' merged; bool vs int kept
    # apart). NaN-promotion to float64 happens on both loaders alike, so
    # int-vs-float here means a genuine schema mismatch, not nulls.
    kind = lambda d: {"u": "i"}.get(d.kind, d.kind)
    dtype_bad = None
    for c in sorted(spark_df.columns):
        ka, kb = kind(spark_df[c].dtype), kind(duck_df[c].dtype)
        if ka != kb:
            dtype_bad = (c, spark_df[c].dtype, duck_df[c].dtype)
            break
    if dtype_bad is not None:
        c, da, db = dtype_bad
        print(f"FAIL  {name}: dtype col={c} spark={da} duck={db} "
              f"(driver hash is dtype-strict)")
        n_fail += 1
        continue
    a, b = canon(spark_df), canon(duck_df)
    exact = True
    close = True
    bad = None
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            e, c = cmp_cell(x, y)
            exact &= e
            if not c:
                close = False
                if bad is None:
                    bad = (col, i, x, y)
    # driver-parity order check: the driver's hash is ROW-ORDER sensitive
    # (columns sorted by name, rows in file order). Compare unsorted too.
    ordered = True
    def strify(df):
        df = df.reindex(sorted(df.columns), axis=1).copy()
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].map(lambda v: str(v) if isinstance(v, (list, tuple)) or
                                  type(v).__name__ == "ndarray" else v)
        return df
    if exact:
        ao = strify(spark_df)
        bo = strify(duck_df)
        for col in ao.columns:
            for x, y in zip(ao[col].tolist(), bo[col].tolist()):
                e, c = cmp_cell(x, y)
                if not c:
                    ordered = False
                    break
            if not ordered:
                break
    if exact and not ordered:
        print(f"ORDER {name}: cell-exact after sort but row order differs "
              f"({len(a)} rows) — driver hash would flag this")
        n_fail += 1
    elif exact:
        print(f"PASS  {name} ({len(a)} rows)")
        n_pass += 1
    elif close:
        print(f"CLOSE {name}: float-only drift (non-bitwise) ({len(a)} rows)")
        n_close += 1
    else:
        col, i, x, y = bad
        print(f"FAIL  {name}: first diff col={col} row={i} spark={x!r} duck={y!r}")
        n_fail += 1

# queries without oracle: row-count > 0 check
all_dirs = {os.path.basename(p) for p in glob.glob(f"{OUT}/*") if os.path.isdir(p)}
for name in sorted(all_dirs - set(oracle)):
    files = glob.glob(f"{OUT}/{name}/*.parquet")
    n = sum(len(pd.read_parquet(f)) for f in files)
    print(f"{'ROWS' if n > 0 else 'EMPTY'}  {name}: {n} rows (no oracle)")

print(f"\n== {n_pass} pass, {n_close} close, {n_fail} fail, "
      f"{len(all_dirs - set(oracle))} oracle-less ==")
sys.exit(1 if n_fail else 0)
