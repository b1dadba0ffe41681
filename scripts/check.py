#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (NOT part of the library).

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [query ...]

Reads each Spark result parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same sf tables, sorts
columns by name and rows by all columns, and compares values exactly
(NaN == NaN, small float tolerance report).
"""
import sys, json, glob, math, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes for compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def cmp(a: pd.DataFrame, b: pd.DataFrame):
    if list(a.columns) != list(b.columns):
        return False, f"columns differ: {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return False, f"row count differs: {len(a)} vs {len(b)}"
    for c in a.columns:
        if str(a[c].dtype) != str(b[c].dtype):
            return False, f"dtype differs for {c}: {a[c].dtype} vs {b[c].dtype}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            ok = ((av.isna() & bv.isna()) | (av == bv)).all()
            if not ok:
                d = (av - bv).abs().max()
                return False, f"col {c}: max abs diff {d}"
        else:
            ok = ((av.isna() & bv.isna()) | (av.astype(str) == bv.astype(str))).all()
            if not ok:
                i = ((av.isna() & bv.isna()) | (av.astype(str) == bv.astype(str))).idxmin()
                return False, f"col {c}: first mismatch at row {i}: {av[i]!r} vs {bv[i]!r}"
    return True, "ok"

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        if only and name not in only:
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"SKIP {name}: no parquet output"); n_skip += 1; continue
        got = norm(con.execute(f"SELECT * FROM read_parquet({files!r})").df())
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(got)} rows"); n_skip += 1; continue
        try:
            exp = norm(con.execute(oracles[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        ok, msg = cmp(got, exp)
        if ok:
            flag = " (WARNING: empty result - vacuous match)" if len(got) == 0 else ""
            print(f"PASS {name} ({len(got)} rows){flag}"); n_pass += 1
        else:
            print(f"FAIL {name}: {msg}"); n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} skip/rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
