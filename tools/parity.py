#!/usr/bin/env python3
"""Engine-parity probe (driver-side tooling, not library code): time each
oracle SQL in DuckDB (median of N) over the same parquet tables the Spark
bench read, merge with a graft.Bench medians JSON, and write a
machine-readable comparison. This keeps the "exact tier at columnar-engine
parity" claims in SURVEY §6 honest and reproducible.

Usage: parity.py <sfDir> <oracle_sql.json> <bench.json> <out.json> [query ...]
       (default queries: the bench tail over 1s)
"""
import sys, json, glob, os, time, statistics
import duckdb

sfdir, oracle_path, bench_path, out_path = sys.argv[1:5]
only = sys.argv[5:]
REPS = 3

con = duckdb.connect()
con.execute("PRAGMA threads=32")
for f in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(f)[:-8]
    path = f"{f}/*.parquet" if os.path.isdir(f) else f
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")

oracle = json.load(open(oracle_path))
bench = json.load(open(bench_path))["queries"]
names = only or [q for q, s in bench.items() if s >= 1.0 and q in oracle]

out = {"sf": sfdir, "reps": REPS, "duckdb_threads": 32, "queries": {}}
for q in sorted(names):
    times = []
    for _ in range(REPS):
        t0 = time.time()
        n = len(con.sql(oracle[q]).fetchall())
        times.append(time.time() - t0)
    med = statistics.median(times)
    spark = bench.get(q)
    out["queries"][q] = {
        "spark_sec": spark, "duckdb_sec": round(med, 3), "rows": n,
        "ratio_spark_over_duckdb": round(spark / med, 3) if spark else None}
    spark_s = f"{spark:7.2f}s" if spark else "    n/a"
    ratio_s = f"{spark/med:5.2f}x" if spark else "  n/a"
    print(f"{q:28s} spark={spark_s} duckdb={med:7.2f}s "
          f"ratio={ratio_s} rows={n}")
json.dump(out, open(out_path, "w"), indent=1)
print(f"wrote {out_path}")
