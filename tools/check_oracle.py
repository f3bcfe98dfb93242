#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracle parity (mimics the driver's
DuckDB compare: sort columns by name, sort rows, compare values)."""
import duckdb, json, sys, glob, os

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    spark_dir = f"{out_dir}/{name}"
    if not os.path.isdir(spark_dir):
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        duck = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: duckdb error {e}"); fails += 1; continue
    spark = duckdb.sql(f"SELECT * FROM '{spark_dir}/*.parquet'").fetchdf()
    dcols, scols = sorted(duck.columns), sorted(spark.columns)
    if dcols != scols:
        print(f"FAIL {name}: cols duck={dcols} spark={scols}"); fails += 1; continue
    d = duck[dcols].astype(str).sort_values(dcols).reset_index(drop=True)
    s = spark[scols].astype(str).sort_values(scols).reset_index(drop=True)
    if len(d) != len(s):
        print(f"FAIL {name}: rows duck={len(d)} spark={len(s)}"); fails += 1; continue
    if not d.equals(s):
        diff = (d != s).any(axis=1)
        print(f"FAIL {name}: {diff.sum()} mismatched rows, first:")
        print(d[diff].head(3)); print(s[diff].head(3)); fails += 1; continue
    print(f"OK   {name}: {len(d)} rows")
print(f"\n{'ALL OK' if fails == 0 else str(fails) + ' FAILURES'}")
sys.exit(1 if fails else 0)
