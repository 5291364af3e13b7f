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


def q_sort_nulls_ordering(spark, sf_dir):
    """Explicit NULLS FIRST placement under LIMIT — a dialect trap pinned
    by content: Spark default is NULLS FIRST ASC, many engines default
    NULLS LAST, and with a LIMIT the placement decides WHICH rows
    survive, which the order-insensitive hash then verifies.  Nulls are
    manufactured with nullif (status 'O' -> NULL)."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return (
        o.select(
            "o_orderkey",
            status_or_null.alias("status_nullable"),
            F.round("o_totalprice", 2).alias("total_price"),
        )
        .orderBy(
            F.col("status_nullable").asc_nulls_first(),
            F.col("total_price").desc(),
            F.col("o_orderkey"),
        )
        .limit(50)
    )


QUERIES = {
    "sort_limit_topn": q_sort_limit_topn,
    "sort_multi_key": q_sort_multi_key,
    "sort_nulls_ordering": q_sort_nulls_ordering,
}

ORACLES = {
    "sort_nulls_ordering": (
        "SELECT o_orderkey, nullif(o_orderstatus, 'O') AS status_nullable, "
        "round(o_totalprice, 2) AS total_price FROM orders "
        "ORDER BY nullif(o_orderstatus, 'O') ASC NULLS FIRST, "
        "round(o_totalprice, 2) DESC, o_orderkey LIMIT 50"
    ),
    "sort_limit_topn": (
        "SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total_price "
        "FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"
    ),
    "sort_multi_key": (
        "SELECT * FROM nation ORDER BY n_regionkey, n_name DESC"
    ),
}
