#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (SURVEY.md §5 t2).

Reads each parquet result dumped by `graft.Verify` under OUTDIR, runs the
matching oracle SQL from OUTDIR/oracle_sql.json in DuckDB against the same
testdata dir, and compares two ways:

1. value compare — column names (sorted), row count, values row-by-row in
   result order via Python equality (catches semantic bugs);
2. driver-emulating hash — the Spark parquet read via pandas/pyarrow, the
   oracle via duckdb `.df()`, columns sorted by name, every cell stringified,
   then hashed. This reproduces the driver's canonicalization quirks
   (round-4 finding: pyarrow renders DECIMAL as `Decimal('12.30')` but
   duckdb.df() converts DECIMAL to float64 rendering `12.3`, so DECIMAL
   outputs with a trailing-zero digit hash-mismatch while comparing
   value-equal under check 1).

A query must pass BOTH to print PASS.

Usage: verify_local.py <sfDir> <outDir> [query ...]
"""
import glob
import hashlib
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def cmp_cell(a, b):
    a, b = norm(a), norm(b)
    if isinstance(a, float) and isinstance(b, float):
        if a == b:
            return True
        return abs(a - b) <= 1e-12 * max(1.0, abs(a), abs(b))  # near-miss
    return a == b


def exact_cell(a, b):
    return norm(a) == norm(b)


def driver_hash_mismatch(con, out_dir, name, sql):
    """Emulate the driver's hash: pandas read of the Spark parquet vs
    duckdb .df() of the oracle, columns sorted by name, cells stringified.
    Returns a diff description or None."""
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    spark_df = pd.concat([pd.read_parquet(p) for p in files],
                         ignore_index=True)
    want_df = con.execute(sql).df()

    def canon(df):
        return df[sorted(df.columns)].astype(str)

    g, w = canon(spark_df), canon(want_df)
    if list(g.columns) != list(w.columns) or len(g) != len(w):
        return None  # shape diffs already reported by the value compare
    hg = hashlib.md5(g.to_csv(index=False).encode()).hexdigest()
    hw = hashlib.md5(w.to_csv(index=False).encode()).hexdigest()
    if hg == hw:
        return None
    neq = (g != w)
    rows = neq.any(axis=1)
    i = int(rows.idxmax())
    cols = [c for c in g.columns if neq.at[i, c]]
    return (f"stringified row {i} cols {cols}: "
            f"spark={[g.at[i, c] for c in cols]} "
            f"oracle={[w.at[i, c] for c in cols]}")


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
            want = con.execute(sql)
            want_cols = [d[0] for d in want.description]
            want_rows = want.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        errs = []
        if sorted(got_cols) != sorted(want_cols):
            errs.append(f"columns spark={sorted(got_cols)} oracle={sorted(want_cols)}")
        elif len(got_rows) != len(want_rows):
            errs.append(f"rowcount spark={len(got_rows)} oracle={len(want_rows)}")
        else:
            # driver sorts columns by name before hashing -> align by name
            gidx = [got_cols.index(c) for c in sorted(got_cols)]
            widx = [want_cols.index(c) for c in sorted(want_cols)]
            for i, (gr, wr) in enumerate(zip(got_rows, want_rows)):
                ga = [gr[j] for j in gidx]
                wa = [wr[j] for j in widx]
                if all(exact_cell(a, b) for a, b in zip(ga, wa)):
                    continue
                if all(cmp_cell(a, b) for a, b in zip(ga, wa)):
                    errs.append(f"row {i} NEAR-MISS (float ulp): {ga} vs {wa}")
                else:
                    errs.append(f"row {i}: spark={ga} oracle={wa}")
                if len(errs) >= 3:
                    break
        if not errs:
            try:
                d = driver_hash_mismatch(con, out_dir, name, sql)
                if d:
                    errs.append(f"driver-hash: {d}")
            except Exception as e:
                errs.append(f"driver-hash: error {e}")
        if errs:
            n_fail += 1
            print(f"FAIL {name} ({len(got_rows)} rows)")
            for e in errs:
                print(f"  {e}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(got_rows)} rows)")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
