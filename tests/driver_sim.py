"""Simulate the driver: import __spark_entry__ with a PLAIN SparkSession
(no engine confs), run entry() smoke at sf0.001, then every queries()
entry at sf0.01 vs its DuckDB oracle_sql() twin — order-insensitive,
columns sorted by name, like CORRECTNESS_r{N}.json."""
import math, sys, time

sys.path.insert(0, "/root/repo")
import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as mod

# plain session, as the driver would build it — none of interop_spark's confs
spark = (SparkSession.builder.master("local[8]")
         .appName("driver-sim").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

print("== t1 smoke: entry(spark) ==")
df = mod.entry(spark)
rows = df.collect()
print("schema:", df.schema.simpleString())
print("rows:", len(rows))
for r in rows:
    print(" ", r)
assert len(rows) >= 0

SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")


def canon(v):
    if v is None:
        return "None"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # sign-preserving: the driver's hash distinguishes -0.0 from +0.0
        # (round-4 kmeans_one_step failed on exactly this while `v + 0.0`
        # here collapsed the sign and printed ALL MATCH)
        return repr(v)
    return str(v)


qs, os_ = mod.queries(), mod.oracle_sql()
if len(sys.argv) > 1:  # optional subset: driver_sim.py name1 name2 ...
    keep = set(sys.argv[1:])
    unknown = keep - set(qs)
    if unknown:
        sys.exit(f"unknown query names: {sorted(unknown)}")
    qs = {k: v for k, v in qs.items() if k in keep}
    os_ = {k: v for k, v in os_.items() if k in keep}
print(f"\n== t2 correctness: {len(qs)} queries, {len(os_)} oracles, sf0.01 ==")
fails = []
for name in sorted(qs):
    t0 = time.time()
    sdf = qs[name](spark, SF).toPandas()
    if name not in os_:
        print(f"  {name}: rows-only ({len(sdf)} rows) [{time.time()-t0:.1f}s]")
        continue
    ddf = con.execute(os_[name]).df()
    ok = True
    if sorted(sdf.columns) != sorted(ddf.columns):
        fails.append((name, f"cols {sorted(sdf.columns)} vs {sorted(ddf.columns)}"))
        ok = False
    elif len(sdf) != len(ddf):
        fails.append((name, f"rowcount {len(sdf)} vs {len(ddf)}"))
        ok = False
    else:
        cols = sorted(sdf.columns)
        a = sorted(tuple(canon(x) for x in row)
                   for row in sdf[cols].itertuples(index=False, name=None))
        b = sorted(tuple(canon(x) for x in row)
                   for row in ddf[cols].itertuples(index=False, name=None))
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:2]
            fails.append((name, f"values {diff}"))
            ok = False
    print(f"  {name}: {'MATCH' if ok else 'MISMATCH'} ({len(sdf)} rows) "
          f"[{time.time()-t0:.1f}s]")

print("\n== RESULT ==")
if fails:
    for n, why in fails:
        print("FAIL", n, why)
    sys.exit(1)
print(f"ALL {len(os_)} ORACLE QUERIES MATCH at sf0.01")
