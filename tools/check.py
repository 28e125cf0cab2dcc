#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
from outDir/oracle_sql.json in DuckDB over the sf tables, compare against
the Spark parquet dumps (columns sorted by name, rows sorted, values
hashed). Usage: check.py <sfDir> <outDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

# GRAFT_CHECK_JSON=<path>: also write a machine-readable per-query map
# in the driver's CORRECTNESS_r{N}.json shape (rows_match/schema_match/
# hash_match/spark_rows/oracle_rows/err) — the committed artifact for
# the non-sf0.01 gates (sf1 with tolerance, SPARK_GRAFT_CPUS=3).
json_out = os.environ.get("GRAFT_CHECK_JSON")
report = {}

def record(name, rows_match=False, schema_match=False, hash_match=False,
           spark_rows=None, oracle_rows=None, err=None):
    report[name] = {"rows_match": rows_match, "schema_match": schema_match,
                    "hash_match": hash_match, "spark_rows": spark_rows,
                    "oracle_rows": oracle_rows, "err": err}

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(f)[:-8]
    # driver testdata is one file per table; generated scales (GenData)
    # are spark-written directories of part files
    path = f"{f}/*.parquet" if os.path.isdir(f) else f
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    spath = f"{outdir}/{name}"
    if not os.path.isdir(spath):
        print(f"FAIL {name}: no spark output"); fails += 1
        record(name, err="no spark output"); continue
    try:
        ddf = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1
        record(name, err=f"oracle error {e}"); continue
    sdf = pd.concat([pd.read_parquet(p) for p in sorted(glob.glob(f"{spath}/*.parquet"))])
    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1)
        for c in df.columns:  # normalize dtypes for compare
            if df[c].dtype == object:
                df[c] = df[c].astype(str)
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)
    a, b = canon(sdf), canon(ddf)
    if list(a.columns) != list(b.columns):
        print(f"FAIL {name}: cols spark={list(a.columns)} duck={list(b.columns)}"); fails += 1
        record(name, spark_rows=len(a), oracle_rows=len(b),
               err=f"cols spark={list(a.columns)} duck={list(b.columns)}"); continue
    # driver's hash is dtype-sensitive: a float64 column on one side vs
    # int64 on the other (e.g. DuckDB HUGEINT from sum(INTEGER) -> pandas
    # float) hash-mismatches even when values compare equal. Flag it.
    dtype_div = [c for c in a.columns
                 if str(a[c].dtype).startswith("float") != str(b[c].dtype).startswith("float")]
    if dtype_div:
        print(f"FAIL {name}: float/int dtype divergence {[(c, str(a[c].dtype), str(b[c].dtype)) for c in dtype_div]}")
        fails += 1
        record(name, spark_rows=len(a), oracle_rows=len(b),
               err=f"float/int dtype divergence {dtype_div}"); continue
    if len(a) != len(b):
        print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}"); fails += 1
        record(name, schema_match=True, spark_rows=len(a), oracle_rows=len(b),
               err="row count mismatch"); continue
    # GRAFT_CHECK_TOL=1 (generated-scale runs only; the driver gate and
    # default mode stay bit-exact): accept cross-engine float artifacts
    # that appear above sf0.1 magnitudes — decimal->double conversion is
    # not bit-identical across engines once sums cross 2^53 (rel ~1e-16),
    # and round(x, 6) of a value sitting on a .5 boundary can differ by
    # exactly 1e-6. Everything else still compares exact.
    tol = os.environ.get("GRAFT_CHECK_TOL") == "1"
    def float_close(x, y):
        import numpy as np
        xv, yv = x.to_numpy(dtype=float), y.to_numpy(dtype=float)
        both_nan = pd.isna(xv) & pd.isna(yv)
        ad = abs(xv - yv)
        rd = ad / np.maximum(abs(xv), 1e-300)
        return bool(((ad <= 1.5e-6) | (rd <= 1e-12) | both_nan).all())
    try:
        if tol:
            for c in a.columns:
                if str(a[c].dtype).startswith("float"):
                    assert float_close(a[c], b[c]), f"float col {c} out of tolerance"
                else:
                    pd.testing.assert_series_equal(
                        a[c], b[c], check_dtype=False, check_exact=True)
        else:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
        print(f"OK   {name} ({len(a)} rows)")
        record(name, rows_match=True, schema_match=True, hash_match=True,
               spark_rows=len(a), oracle_rows=len(b))
    except AssertionError as e:
        print(f"FAIL {name}: {str(e).splitlines()[0]}")
        # show first diff
        for c in a.columns:
            neq = ~(a[c].eq(b[c]) | (a[c].isna() & b[c].isna()))
            if neq.any():
                i = neq.idxmax()
                print(f"   col={c} row={i} spark={a[c][i]!r} duck={b[c][i]!r}")
                break
        fails += 1
        record(name, rows_match=True, schema_match=True, spark_rows=len(a),
               oracle_rows=len(b), err=str(e).splitlines()[0])
if json_out:
    with open(json_out, "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {json_out}")
print(f"{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'} / {len(oracle)} queries")
sys.exit(1 if fails else 0)
