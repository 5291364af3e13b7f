"""Group H — TPC-H-shaped composite analytics (round 4).

The bread-and-butter decision-support queries every warehouse runs —
multi-table join + selective filter + aggregate + ranked answer —
adapted to this repo's TPC-H-ish fixture schema (no partsupp /
commitdate columns; see TESTDATA.md).  Each is the standard shape of a
numbered TPC-H query, named for what it answers rather than the number.

100 TB notes (shared by all five): every dimension join is
broadcast-eligible (nation/region always; customer/supplier under AQE
when filtered), fact-fact joins shuffle on their keys, every filter
pushes to the parquet scan, and every aggregate runs partial+final.
These are exactly the plans Catalyst should produce on a warehouse
cluster; tests/test_r4_ops.py pins the broadcast/pushdown shapes.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..catalog import load_tables

#: Q3 cutoff: orders placed before, lineitems shipped after
SHIP_CUTOFF = "1998-06-01"
#: Q3 market segment
Q3_SEGMENT = "BUILDING"
#: Q5 region scope
Q5_REGION = "ASIA"
#: Q8 "national" supplier nation under study
Q8_NATION = "NATION_7"
#: Q15 revenue window
Q15_LO, Q15_HI = "1997-01-01", "1997-04-01"


def _ts(s: str):
    return F.lit(s).cast("timestamp_ntz")


def q_agg_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape — top-10 highest-revenue orders not yet fully
    shipped at the cutoff: BUILDING-segment customers, orders placed
    before 1998-06-01, revenue from lineitems shipped after it.

    Plan: segment filter prunes customer before its join (broadcast
    under AQE), date predicates push to both fact scans, revenue
    aggregates partial+final on l_orderkey, and the top-10 is a
    TakeOrderedAndProject — no global sort materializes."""
    load_tables(spark, sf_dir)
    c = spark.table("customer").filter(F.col("c_mktsegment") == Q3_SEGMENT)
    o = spark.table("orders").filter(F.col("o_orderdate") < _ts(SHIP_CUTOFF))
    li = spark.table("lineitem").filter(F.col("l_shipdate") > _ts(SHIP_CUTOFF))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def q_join_exists_priority(spark, sf_dir):
    """TPC-H Q4 shape — per order priority, how many orders have at
    least one line shipped more than 90 days after the order date (the
    fixture's stand-in for the commit/receipt lateness predicate).
    EXISTS as a FILTER (left-semi join), vs join_mark_exists' EXISTS as
    a column.

    Plan: the semi-join shuffles only (orderkey) pairs after the
    lateness predicate prunes lineitem map-side; the count is a 5-group
    aggregate."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    li = spark.table("lineitem")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .select("l_orderkey")
        .distinct()
    )
    return (
        o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_late_orders"))
    )


def q_agg_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape — revenue per nation from LOCAL commerce in one
    region: customer and supplier must sit in the same nation, nation in
    ASIA.  The classic 6-table star-with-a-twist (the same-nation
    predicate correlates two dimension branches).

    Plan: nation⋈region broadcast, the region filter prunes 20 of 25
    nations BEFORE the facts join, and the same-nation equality becomes
    a join key (c_nationkey == s_nationkey) rather than a post-filter,
    so the big join never materializes cross-nation pairs."""
    load_tables(spark, sf_dir)
    n = spark.table("nation")
    r = spark.table("region").filter(F.col("r_name") == Q5_REGION)
    local_nations = n.join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    ).select("n_nationkey", "n_name")
    c = spark.table("customer")
    s = spark.table("supplier")
    o = spark.table("orders")
    li = spark.table("lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(local_nations), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


def q_agg_market_share(spark, sf_dir):
    """TPC-H Q8 shape — NATION_7's share of total order revenue per
    order year: share = Σ(revenue where supplier ∈ NATION_7) / Σ(revenue),
    the sum-of-CASE-over-sum idiom every BI share metric uses.

    Plan: one pass over the joined facts, both sums in the same
    partial+final aggregate keyed by year — the share never needs a
    second scan or a self-join."""
    load_tables(spark, sf_dir)
    n = spark.table("nation")
    s = spark.table("supplier")
    o = spark.table("orders")
    li = spark.table("lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    is_target = (F.col("n_name") == Q8_NATION).cast("double")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.round(F.sum(rev * is_target), 2).alias("nation_revenue"),
            F.round(F.sum(rev), 2).alias("total_revenue"),
            F.round(F.sum(rev * is_target) / F.sum(rev), 6).alias("mkt_share"),
        )
    )


def q_join_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape — the supplier(s) with maximum revenue over one
    quarter, ties kept: revenue per supplier from 1997Q1 shipments, then
    the rows equal to the global max (scalar-subquery max as a 1-row
    broadcast crossJoin, the view+max formulation of the original).

    Plan: revenue aggregates partial+final on suppkey; the max is a
    second tiny aggregate of that result REUSED from the same subtree
    (exchange reuse), not a rescan of lineitem."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem").filter(
        (F.col("l_shipdate") >= _ts(Q15_LO)) & (F.col("l_shipdate") < _ts(Q15_HI))
    )
    s = spark.table("supplier")
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


QUERIES = {
    "agg_shipping_priority": q_agg_shipping_priority,
    "join_exists_priority": q_join_exists_priority,
    "agg_local_supplier_volume": q_agg_local_supplier_volume,
    "agg_market_share": q_agg_market_share,
    "join_top_supplier": q_join_top_supplier,
}

ORACLES = {
    "agg_shipping_priority": (
        "SELECT l_orderkey, o_orderdate, o_orderpriority, "
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue "
        "FROM lineitem "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        f"WHERE c_mktsegment = '{Q3_SEGMENT}' "
        f"AND o_orderdate < TIMESTAMP '{SHIP_CUTOFF} 00:00:00' "
        f"AND l_shipdate > TIMESTAMP '{SHIP_CUTOFF} 00:00:00' "
        "GROUP BY l_orderkey, o_orderdate, o_orderpriority "
        "ORDER BY revenue DESC, l_orderkey LIMIT 10"
    ),
    "join_exists_priority": (
        "SELECT o_orderpriority, count(*) AS n_late_orders FROM orders o "
        "WHERE EXISTS (SELECT 1 FROM lineitem l "
        "WHERE l.l_orderkey = o.o_orderkey "
        "AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY) "
        "GROUP BY o_orderpriority"
    ),
    "agg_local_supplier_volume": (
        "SELECT n_name, "
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue "
        "FROM lineitem "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        f"WHERE r_name = '{Q5_REGION}' AND c_nationkey = s_nationkey "
        "GROUP BY n_name"
    ),
    "agg_market_share": (
        "SELECT year(o_orderdate) AS order_year, "
        "round(sum(CASE WHEN n_name = "
        f"'{Q8_NATION}' THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2) "
        "AS nation_revenue, "
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue, "
        "round(sum(CASE WHEN n_name = "
        f"'{Q8_NATION}' THEN l_extendedprice * (1 - l_discount) ELSE 0 END) "
        "/ sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share "
        "FROM lineitem "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "GROUP BY year(o_orderdate)"
    ),
    "join_top_supplier": (
        "WITH rev AS (SELECT l_suppkey, "
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue "
        "FROM lineitem "
        f"WHERE l_shipdate >= TIMESTAMP '{Q15_LO} 00:00:00' "
        f"AND l_shipdate < TIMESTAMP '{Q15_HI} 00:00:00' "
        "GROUP BY l_suppkey) "
        "SELECT s_suppkey, s_name, total_revenue FROM rev "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "WHERE total_revenue = (SELECT max(total_revenue) FROM rev)"
    ),
}
