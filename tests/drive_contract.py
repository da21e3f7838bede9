"""Simulate the driver: vanilla SparkSession + __spark_entry__ contract."""
import sys, hashlib
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
import duckdb, pandas as pd

# vanilla session - what the driver would build, none of our configs
spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as E

# 1. smoke: entry() on sf0.001
df = E.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={df.schema.simpleString()}")
assert len(rows) > 0

# 2. contract shape
qs, osql = E.queries(), E.oracle_sql()
print(f"queries: {len(qs)}, oracles: {len(osql)}, missing-oracle: {sorted(set(qs)-set(osql))}")
extra = set(osql) - set(qs)
assert not extra, f"oracle keys without query: {extra}"

# 3. run every query at sf0.01 vs duckdb (value-hash style compare)
SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

def value_hash(pdf):
    pdf = pdf[sorted(pdf.columns)].copy()
    s = pdf.astype(str).sort_values(by=list(pdf.columns)).to_csv(index=False)
    return hashlib.sha256(s.encode()).hexdigest()[:12]

fails = []
for name, fn in sorted(qs.items()):
    spdf = fn(spark, SF).toPandas()
    if name in osql:
        opdf = con.sql(osql[name]).df()
        ok = len(spdf) == len(opdf) and sorted(spdf.columns) == sorted(opdf.columns) \
             and value_hash(spdf) == value_hash(opdf)
        print(f"  {name}: spark={len(spdf)} oracle={len(opdf)} hash={'MATCH' if ok else 'MISMATCH'}")
        if not ok:
            fails.append(name)
    else:
        print(f"  {name}: rows-only {len(spdf)}")
print("FAILURES:", fails if fails else "none")
