"""Group F — sort / limit / top-k (SURVEY §2B).

Reference analog: the shuffle's merge-sort (ref op A3) — MapReduce totally
orders within a partition for free; a global sort needs a custom
TotalOrderPartitioner.  Spark's orderBy does range partitioning with
sampled bounds; orderBy().limit(n) collapses to TakeOrderedAndProject
(no full sort materialized — per-partition top-n then merge on driver),
which is the 100TB-safe top-k.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_tables


def q_sort_limit_topn(spark, sf_dir):
    """Global top-10 with a total order (unique-key tiebreak)."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("total_price"))
    )


def q_sort_multi_key(spark, sf_dir):
    """Full multi-key sort (range-partitioned). Hash check is order-
    insensitive; the point is exercising the sort executor path."""
    load_tables(spark, sf_dir)
    n = spark.table("nation")
    return n.orderBy(F.col("n_regionkey"), F.col("n_name").desc())


QUERIES = {
    "sort_limit_topn": q_sort_limit_topn,
    "sort_multi_key": q_sort_multi_key,
}

ORACLES = {
    "sort_limit_topn": (
        "SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total_price "
        "FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"
    ),
    "sort_multi_key": (
        "SELECT * FROM nation ORDER BY n_regionkey, n_name DESC"
    ),
}
