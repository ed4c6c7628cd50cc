#!/usr/bin/env python3
"""Local pre-check of SparkEntry.oracleSql vs Verify output parquet.

Mimics the driver's compare: for each query, load the Spark result
parquet and run the oracle SQL in DuckDB over the same sf dir tables,
sort columns by name, sort rows, and diff values.
"""
import json, sys, glob
import duckdb

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
con = duckdb.connect()
for t in ["documents", "events", "lineitem", "orders", "customer", "part",
          "supplier", "nation", "region", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

fails = 0
for name in sorted(glob.glob(f"{out_dir}/*/")):
    q = name.rstrip("/").split("/")[-1]
    files = glob.glob(f"{name}/*.parquet")
    if not files:
        print(f"{q:28s} NO OUTPUT")
        fails += 1
        continue
    spark_df = con.execute(f"SELECT * FROM read_parquet('{name}/*.parquet')").fetchdf()
    if q not in oracle:
        print(f"{q:28s} rows-only: {len(spark_df)} rows " + ("OK" if len(spark_df) > 0 else "EMPTY!"))
        continue
    try:
        ora_df = con.execute(oracle[q]).fetchdf()
    except Exception as e:
        print(f"{q:28s} ORACLE SQL ERROR: {e}")
        fails += 1
        continue
    s = spark_df[sorted(spark_df.columns)].sort_values(by=sorted(spark_df.columns)).reset_index(drop=True)
    o = ora_df[sorted(ora_df.columns)].sort_values(by=sorted(ora_df.columns)).reset_index(drop=True)
    if sorted(spark_df.columns) != sorted(ora_df.columns):
        print(f"{q:28s} SCHEMA MISMATCH spark={sorted(spark_df.columns)} oracle={sorted(ora_df.columns)}")
        fails += 1
        continue
    try:
        same = s.shape == o.shape and (s.astype(str).values == o.astype(str).values).all()
    except Exception as e:
        same = False
    if same:
        print(f"{q:28s} MATCH ({len(s)} rows)")
    else:
        print(f"{q:28s} VALUE MISMATCH")
        print("  spark:", s.head(4).to_dict("records"))
        print("  oracle:", o.head(4).to_dict("records"))
        fails += 1
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
