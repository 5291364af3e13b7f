"""Group D — aggregation (SURVEY §2B).

Reference analog: combine (ref op A2, map-side partial agg) + reduce
(ref op A4).  Spark's HashAggregateExec runs the same two phases
automatically (partial before the exchange, final after), so the combiner
the reference implements by hand inside MapTask's spill path is free here.

100TB notes: every groupBy below shuffles only the (small) group keyspace
after partial agg; distinct-counts use Expand which multiplies rows —
that is the one agg whose shuffle grows with data, mitigated by partial
distinct aggregation (Spark 4 does partial de-dup map-side).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_tables


def q_agg_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape over lineitem (the flagship / entry() query)."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem")
    disc_price = li.l_extendedprice * (1 - li.l_discount)
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + li.l_tax)), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q_agg_global(spark, sf_dir):
    """Ungrouped global aggregate over orders."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    return o.agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


def q_agg_distinct_count(spark, sf_dir):
    """Exact multi-column distinct counts per group (Expand-based)."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
    )


def q_agg_having(spark, sf_dir):
    """GROUP BY ... HAVING — filter over aggregated output."""
    load_tables(spark, sf_dir)
    c, n = spark.table("customer"), spark.table("nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_cust"))
        .filter(F.col("n_cust") > 60)
    )


def q_agg_rollup(spark, sf_dir):
    """ROLLUP(r_name, n_name) with grouping() flags to disambiguate NULLs."""
    load_tables(spark, sf_dir)
    c = spark.table("customer")
    n = spark.table("nation")
    r = spark.table("region")
    joined = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.rollup("r_name", "n_name").agg(
        F.grouping("r_name").cast("int").alias("g_r"),
        F.grouping("n_name").cast("int").alias("g_n"),
        F.count("*").alias("n_cust"),
        F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
    )


def q_agg_cube(spark, sf_dir):
    """CUBE(event_type, day) over events."""
    load_tables(spark, sf_dir)
    ev = spark.table("events").select(
        "event_type", F.date_trunc("day", F.col("ts")).cast("timestamp_ntz").alias("day"), "value"
    )
    return ev.cube("event_type", "day").agg(
        F.grouping("event_type").cast("int").alias("g_t"),
        F.grouping("day").cast("int").alias("g_d"),
        F.count("*").alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


def q_agg_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS ((status,priority),(status),())."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS INT) AS g_s,
               CAST(grouping(o_orderpriority) AS INT) AS g_p,
               count(*) AS n,
               round(sum(o_totalprice), 2) AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        """
    )


def q_agg_stats(spark, sf_dir):
    """Sample stddev/variance + min/max per market segment."""
    load_tables(spark, sf_dir)
    c = spark.table("customer")
    return c.groupBy("c_mktsegment").agg(
        F.round(F.stddev_samp("c_acctbal"), 2).alias("std_bal"),
        F.round(F.var_samp("c_acctbal"), 2).alias("var_bal"),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
    )


def q_agg_approx_distinct(spark, sf_dir):
    """HLL++ approximate distinct (rows-only: approx is engine-specific).

    tests assert |approx - exact| / exact < 5%.  100TB note: this is the
    *production* distinct-count — constant memory per partition vs the
    Expand-based exact path.
    """
    load_tables(spark, sf_dir)
    li = spark.table("lineitem")
    return li.agg(F.approx_count_distinct("l_partkey").alias("approx_parts"))


def q_agg_pivot(spark, sf_dir):
    """groupBy().pivot().agg() — wide-form reshaping (values enumerated
    explicitly, as a 100TB pivot must be: value discovery is an extra
    full scan).  Output columns renamed to the lowercase contract."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .select(
            "l_returnflag",
            F.coalesce("O", F.lit(0.0)).alias("qty_open"),
            F.coalesce("F", F.lit(0.0)).alias("qty_filled"),
        )
    )


def q_agg_unpivot(spark, sf_dir):
    """unpivot/melt — long-form reshaping (the inverse surface)."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    return o.unpivot(
        ["o_orderkey"],
        ["o_totalprice", "o_custkey"],
        "measure",
        "val",
    ).select("o_orderkey", "measure", F.col("val").cast("double").alias("val"))


QUERIES = {
    "agg_pricing_summary": q_agg_pricing_summary,
    "agg_global": q_agg_global,
    "agg_distinct_count": q_agg_distinct_count,
    "agg_having": q_agg_having,
    "agg_rollup": q_agg_rollup,
    "agg_cube": q_agg_cube,
    "agg_grouping_sets": q_agg_grouping_sets,
    "agg_stats": q_agg_stats,
    "agg_approx_distinct": q_agg_approx_distinct,
    "agg_pivot": q_agg_pivot,
    "agg_unpivot": q_agg_unpivot,
}

ORACLES = {
    "agg_pricing_summary": (
        "SELECT l_returnflag, l_linestatus, "
        "round(sum(l_quantity), 2) AS sum_qty, "
        "round(sum(l_extendedprice), 2) AS sum_base_price, "
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, "
        "round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge, "
        "round(avg(l_quantity), 2) AS avg_qty, "
        "round(avg(l_extendedprice), 2) AS avg_price, "
        "round(avg(l_discount), 4) AS avg_disc, "
        "count(*) AS count_order "
        "FROM lineitem GROUP BY l_returnflag, l_linestatus"
    ),
    "agg_global": (
        "SELECT count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_price, "
        "round(avg(o_totalprice), 4) AS avg_price, "
        "round(min(o_totalprice), 2) AS min_price, "
        "round(max(o_totalprice), 2) AS max_price FROM orders"
    ),
    "agg_distinct_count": (
        "SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp, "
        "count(DISTINCT l_partkey) AS n_part FROM lineitem GROUP BY l_returnflag"
    ),
    "agg_having": (
        "SELECT n_name, count(*) AS n_cust FROM customer "
        "JOIN nation ON c_nationkey = n_nationkey "
        "GROUP BY n_name HAVING count(*) > 60"
    ),
    "agg_rollup": (
        "SELECT r_name, n_name, "
        "CAST(grouping(r_name) AS INT) AS g_r, CAST(grouping(n_name) AS INT) AS g_n, "
        "count(*) AS n_cust, round(sum(c_acctbal), 2) AS sum_bal "
        "FROM customer JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "GROUP BY ROLLUP(r_name, n_name)"
    ),
    "agg_cube": (
        "SELECT event_type, day, "
        "CAST(grouping(event_type) AS INT) AS g_t, CAST(grouping(day) AS INT) AS g_d, "
        "count(*) AS n, round(sum(value), 2) AS sum_value "
        "FROM (SELECT event_type, date_trunc('day', ts) AS day, value FROM events) t "
        "GROUP BY CUBE(event_type, day)"
    ),
    "agg_grouping_sets": (
        "SELECT o_orderstatus, o_orderpriority, "
        "CAST(grouping(o_orderstatus) AS INT) AS g_s, "
        "CAST(grouping(o_orderpriority) AS INT) AS g_p, "
        "count(*) AS n, round(sum(o_totalprice), 2) AS sum_price "
        "FROM orders "
        "GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())"
    ),
    "agg_stats": (
        "SELECT c_mktsegment, round(stddev_samp(c_acctbal), 2) AS std_bal, "
        "round(var_samp(c_acctbal), 2) AS var_bal, "
        "round(min(c_acctbal), 2) AS min_bal, round(max(c_acctbal), 2) AS max_bal "
        "FROM customer GROUP BY c_mktsegment"
    ),
    # agg_approx_distinct: rows-only (approximate)
    "agg_pivot": (
        "SELECT l_returnflag, "
        "coalesce(round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2), 0.0)"
        " AS qty_open, "
        "coalesce(round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2), 0.0)"
        " AS qty_filled "
        "FROM lineitem GROUP BY l_returnflag"
    ),
    "agg_unpivot": (
        "SELECT o_orderkey, 'o_totalprice' AS measure,"
        " CAST(o_totalprice AS DOUBLE) AS val FROM orders"
        " UNION ALL "
        "SELECT o_orderkey, 'o_custkey' AS measure,"
        " CAST(o_custkey AS DOUBLE) AS val FROM orders"
    ),
}
