"""Simulate the external driver: vanilla SparkSession + __spark_entry__ contract."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
# deliberately NO engine configs — the driver won't set nanosAsLong/UTC for us
spark = SparkSession.builder.master("local[8]").appName("driver-sim").config("spark.ui.enabled","false").getOrCreate()
import __spark_entry__ as mod

df = mod.entry(spark)
rows = df.collect()
print("entry(): %d rows, schema=%s" % (len(rows), [f.name for f in df.schema.fields]))
assert len(rows) > 0

qs, osql = mod.queries(), mod.oracle_sql()
print("queries: %d keys, oracles: %d keys" % (len(qs), len(osql)))
assert set(osql) <= set(qs)

# run every query like the driver at sf0.01, hash-compare vs duckdb
import duckdb
from i2mapreduce_spark.oracle import oracle_connect, compare
sf = "/root/testdata/sf0.01"
con = oracle_connect(sf)
fails = []
t0 = time.time()
for k in sorted(qs):
    try:
        d = qs[k](spark, sf)
        if k in osql:
            r = compare(k, d, con, osql[k])
            if not r.ok: fails.append(str(r))
        else:
            assert d.count() >= 0
    except Exception as e:
        fails.append(f"{k}: {type(e).__name__} {str(e)[:200]}")
print("all keys done in %.1fs" % (time.time()-t0))
if fails:
    print("FAILURES:"); [print(" ", f) for f in fails]; sys.exit(1)
print("DRIVER-SIM PASS: entry + %d queries (%d hash-checked) on a vanilla session" % (len(qs), len(osql)))
