#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB oracle gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<key> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB over the same warehouse dir, and
compares: row count, column names, dtypes, and values (columns sorted by
name, rows in emitted order). Stricter than the driver's hash compare on
purpose — if this passes, the driver should too.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.reset_index(drop=True)
    return df

def is_null_cell(x) -> bool:
    # scalar nulls only: None, float NaN, pandas NaT (NULL timestamps —
    # q_scd2_build's open-version valid_to was the first to emit them);
    # arrays are never null-equal here
    if x is None:
        return True
    if isinstance(x, (np.ndarray, list)):
        return False
    try:
        return bool(pd.isna(x))
    except (TypeError, ValueError):
        return False

def cells_equal(a, b) -> bool:
    if is_null_cell(a):
        return is_null_cell(b)
    if is_null_cell(b):
        return False
    if isinstance(a, (np.floating, float)) and isinstance(b, (np.floating, float)):
        return (a == b) or (np.isnan(a) and np.isnan(b))
    if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
        return list(a) == list(b)
    # Timestamp kind is STRICT: the driver's schema compare distinguishes
    # tz-aware (TIMESTAMP WITH TIME ZONE) from naive TIMESTAMP, and round 11
    # proved a lax local checker vouches for red rounds (15 schema-fail keys
    # that this script passed). A tz-kind mismatch is a FAIL here too.
    if isinstance(a, pd.Timestamp) and isinstance(b, pd.Timestamp):
        if (a.tzinfo is None) != (b.tzinfo is None):
            return False
    try:
        return a == b
    except Exception:
        return str(a) == str(b)

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    for key in sorted(oracle):
        if only and key not in only:
            continue
        sql = oracle[key]
        pdir = f"{outdir}/{key}"
        files = glob.glob(f"{pdir}/*.parquet")
        if not files:
            print(f"FAIL {key}: no spark output at {pdir}")
            n_fail += 1
            continue
        try:
            ours = canon(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
            theirs = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {key}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        probs = []
        if list(ours.columns) != list(theirs.columns):
            probs.append(f"cols spark={list(ours.columns)} duck={list(theirs.columns)}")
        elif len(ours) != len(theirs):
            probs.append(f"rows spark={len(ours)} duck={len(theirs)}")
        else:
            for c in ours.columns:
                av, bv = ours[c].to_list(), theirs[c].to_list()
                bad = [i for i in range(len(av)) if not cells_equal(av[i], bv[i])]
                if bad:
                    i = bad[0]
                    probs.append(
                        f"col {c}: {len(bad)} diffs, first@{i}: "
                        f"spark={av[i]!r}({type(av[i]).__name__}) "
                        f"duck={bv[i]!r}({type(bv[i]).__name__})")
        # dtype drift is a FAIL, not a note — the driver's schema compare is
        # strict on dtype kind (round 11: 15 keys failed on exactly the
        # timestamp-kind axis this script used to demote to informational).
        # Numeric width aliases that hash identically in the driver
        # (int32/int64, float32/float64) stay tolerated.
        def dtype_compat(x, y):
            if x == y:
                return True
            ints = {"int8", "int16", "int32", "int64"}
            flts = {"float32", "float64"}
            return (x in ints and y in ints) or (x in flts and y in flts)
        dt = [(c, str(ours[c].dtype), str(theirs[c].dtype))
              for c in ours.columns if c in theirs.columns
              and not dtype_compat(str(ours[c].dtype), str(theirs[c].dtype))]
        if dt:
            probs.append(f"dtype drift: {dt}")
        if probs:
            print(f"FAIL {key}: " + "; ".join(probs))
            n_fail += 1
        else:
            print(f"PASS {key} ({len(ours)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
