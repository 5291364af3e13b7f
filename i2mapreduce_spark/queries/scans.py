"""Group S — scans / sources / sinks (SURVEY §2B).

Reference analog: InputFormat/OutputFormat record readers and writers
(ref ops A7/A8, SURVEY §2A) — Hadoop TextInputFormat/SequenceFile.  Here a
scan is a parquet read through Catalyst: column pruning and predicate
pushdown reach the reader (asserted in tests/test_plans.py), which is what
makes a 100 TB scan read only the bytes the query needs.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from ..catalog import load_tables


def q_scan_full(spark, sf_dir):
    """Full scan, all columns. 100TB note: trivially parallel, one task/split."""
    load_tables(spark, sf_dir)
    return spark.table("region")


def q_scan_project_prune(spark, sf_dir):
    """Column-pruned scan: ReadSchema must contain only the 2 columns."""
    load_tables(spark, sf_dir)
    return spark.table("lineitem").select("l_orderkey", "l_quantity")


def q_scan_filter_pushdown(spark, sf_dir):
    """Filtered scan: predicate reaches parquet (PushedFilters in plan)."""
    load_tables(spark, sf_dir)
    return spark.table("orders").filter(F.col("o_totalprice") > 400000)


def q_sink_parquet_roundtrip(spark, sf_dir):
    """Write a result to parquet, read it back (ref op A8). Rows-only check."""
    load_tables(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="i2mr_sink_") + "/nation_by_region"
    df = (
        spark.table("nation")
        .join(spark.table("region"), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name", "r_name")
    )
    # repartition by the natural read key so downstream consumers get
    # co-located files; at 100TB this would be partitionBy(r_name) instead.
    df.repartition(2, "r_name").write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)


QUERIES = {
    "scan_full": q_scan_full,
    "scan_project_prune": q_scan_project_prune,
    "scan_filter_pushdown": q_scan_filter_pushdown,
    "sink_parquet_roundtrip": q_sink_parquet_roundtrip,
}

ORACLES = {
    "scan_full": "SELECT * FROM region",
    "scan_project_prune": "SELECT l_orderkey, l_quantity FROM lineitem",
    "scan_filter_pushdown": "SELECT * FROM orders WHERE o_totalprice > 400000",
    # sink_parquet_roundtrip: rows-only (side-effecting sink)
}
