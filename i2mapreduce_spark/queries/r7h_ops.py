"""Round-6 additions, batch 34: price index numbers (Laspeyres /
Paasche / Fisher — the econometrics of 'did prices or the basket
change'), the Herfindahl-Hirschman concentration index (the antitrust
market-power number), interval stabbing via sweep-line (how many
intervals cover each instant, on the distributed prefix sum), and a
per-shard data manifest (counts + order-insensitive checksums — the
data-versioning artifact every lakehouse publisher writes).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_tables
from ..operators.ranking import global_running_sum

#: index-number comparison years
IDX_BASE_Y, IDX_CURR_Y = 1993, 1997

#: interval stabbing: order 'open' horizon (days)
STAB_OPEN_DAYS = 30

#: manifest shards and checksum modulus (2^61 - 1)
MANIFEST_SHARDS = 16
CKSUM_MOD = 2305843009213693951


def q_agg_price_index(spark, sf_dir):
    """LASPEYRES / PAASCHE / FISHER price indices between two years:
    did revenue move because PRICES changed or because the BASKET did?
    L weighs current prices by base-year quantities, P by current-year
    quantities, Fisher is their geometric mean — the index-number
    machinery behind every CPI-style dashboard.

    Exactness: per part-year unit values are QUANTIZED to half-up x10^4
    integers (declared semantics — cross-part sums of raw rationals
    have incompatible denominators), quantities are exact integers, so
    all four basket sums are exact BIGINTs and the indices are two
    fixed-shape double ratios plus one sqrt."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem").select(
        "l_partkey",
        F.year("l_shipdate").alias("y"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
        F.col("l_quantity").cast("long").alias("qty"),
    ).filter(F.col("y").isin(IDX_BASE_Y, IDX_CURR_Y))
    py = li.groupBy("l_partkey", "y").agg(
        F.sum("cents").alias("e"), F.sum("qty").alias("q")
    )
    py = py.withColumn("p4", F.expr("(2 * 10000 * e + q) div (2 * q)"))
    wide = py.groupBy("l_partkey").agg(
        F.max(F.when(F.col("y") == IDX_BASE_Y, F.col("p4"))).alias("p0"),
        F.max(F.when(F.col("y") == IDX_BASE_Y, F.col("q"))).alias("q0"),
        F.max(F.when(F.col("y") == IDX_CURR_Y, F.col("p4"))).alias("p1"),
        F.max(F.when(F.col("y") == IDX_CURR_Y, F.col("q"))).alias("q1"),
    ).filter(
        F.col("p0").isNotNull() & F.col("p1").isNotNull()
    )
    s = wide.agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum(F.col("p1") * F.col("q0")).alias("l_num"),
        F.sum(F.col("p0") * F.col("q0")).alias("l_den"),
        F.sum(F.col("p1") * F.col("q1")).alias("p_num"),
        F.sum(F.col("p0") * F.col("q1")).alias("p_den"),
    )
    lasp = F.col("l_num").cast("double") / F.col("l_den").cast("double")
    paas = F.col("p_num").cast("double") / F.col("p_den").cast("double")
    return s.select(
        "n_parts",
        F.round(lasp, 6).alias("laspeyres"),
        F.round(paas, 6).alias("paasche"),
        F.round(F.sqrt(lasp * paas), 6).alias("fisher"),
    )


def q_agg_hhi_concentration(spark, sf_dir):
    """Herfindahl-Hirschman Index of supplier concentration per nation:
    HHI = 10000 * sum(share_i^2) over each supplier's revenue share —
    the antitrust screen (<1500 competitive, >2500 concentrated).
    Each nation's HHI is 10000 * sum(c_i^2) / (sum c_i)^2 where c_i are
    exact integer cents; the squared sums run in DECIMAL(38)/HUGEINT
    (c^2 leaves BIGINT near sf1), so both engines feed identical exact
    integers into one double ratio."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem")
    sup = spark.table("supplier")
    n = spark.table("nation")
    rev = li.groupBy("l_suppkey").agg(
        (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")) * 100)
        .cast("long")
        .alias("c")
    )
    j = rev.join(sup, F.col("l_suppkey") == F.col("s_suppkey")).join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    g = j.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum(F.col("c").cast("decimal(38,0)")).alias("s1"),
        F.sum(
            (F.col("c").cast("decimal(38,0)") * F.col("c")).cast(
                "decimal(38,0)"
            )
        ).alias("s2"),
    )
    return g.select(
        "n_name",
        "n_suppliers",
        F.round(
            10000.0
            * F.col("s2").cast("double")
            / (F.col("s1").cast("double") * F.col("s1").cast("double")),
            6,
        ).alias("hhi"),
    )


def q_window_interval_stabbing(spark, sf_dir):
    """INTERVAL STABBING by sweep-line: how many orders are 'open'
    (within 30 days of placement) on every calendar day — the
    concurrent-interval count behind occupancy, connection-pool and
    work-in-progress charts.  The classic rewrite: +1 at each start,
    -1 at each end, then a running sum over day order — realized with
    the DISTRIBUTED chunked-offset prefix sum (ranking
    .global_running_sum), never a single-partition window over the
    (bounded, but the pattern matters) day spine."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    x = F.expr("datediff(o_orderdate, DATE '1991-12-30')")
    deltas = o.select(x.alias("x"), F.lit(1).alias("d")).unionAll(
        o.select((x + STAB_OPEN_DAYS).alias("x"), F.lit(-1).alias("d"))
    )
    per_day = deltas.groupBy("x").agg(F.sum("d").alias("net"))
    cum = global_running_sum(per_day, ["x"], ["net"])
    return cum.select(
        F.col("x").cast("int").alias("x"),
        F.col("net").cast("long").alias("net_change"),
        F.col("cum_net").alias("open_orders"),
    )


def q_pipeline_shard_manifest(spark, sf_dir):
    """Per-shard DATA MANIFEST: for each of 16 hash shards of orders,
    the row count, key range and an order-insensitive 60-bit checksum
    (md5 row hash summed mod 2^61-1 in DECIMAL(38)/HUGEINT) — the
    artifact a dataset publisher signs so any consumer can verify a
    shard without re-reading the rest (dq_table_checksum's single
    fingerprint, sharded).  One partial+final agg keyed by the shard
    id; shard assignment is the same key mod the pipeline uses."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    # canonical NULL rendering: a checksum must COVER missing values, so
    # NULL price encodes as the empty field (a price string is never
    # empty otherwise).  concat_ws would silently DROP the field (and
    # its separator) where the oracle's || propagates NULL — coalesce
    # pins one rendering on both engines.
    canon = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.coalesce(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .cast("string"),
            F.lit(""),
        ),
        F.col("o_orderpriority"),
    )
    h = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast(
        "decimal(38,0)"
    )
    return (
        o.select((F.col("o_orderkey") % MANIFEST_SHARDS).alias("shard"),
                 "o_orderkey", h.alias("h"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
            F.expr(f"CAST(sum(h) % {CKSUM_MOD} AS BIGINT)").alias(
                "checksum"
            ),
        )
    )


QUERIES = {
    "agg_price_index": q_agg_price_index,
    "agg_hhi_concentration": q_agg_hhi_concentration,
    "window_interval_stabbing": q_window_interval_stabbing,
    "pipeline_shard_manifest": q_pipeline_shard_manifest,
}

ORACLES = {
    "agg_price_index": (
        "WITH li AS (SELECT l_partkey, year(l_shipdate) AS y, "
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) "
        "AS cents, CAST(l_quantity AS BIGINT) AS qty FROM lineitem "
        f"WHERE year(l_shipdate) IN ({IDX_BASE_Y}, {IDX_CURR_Y})), "
        "py AS (SELECT l_partkey, y, sum(cents) AS e, sum(qty) AS q "
        "FROM li GROUP BY 1, 2), "
        "q4 AS (SELECT l_partkey, y, q, "
        "(2 * 10000 * e + q) // (2 * q) AS p4 FROM py), "
        "wide AS (SELECT l_partkey, "
        f"max(CASE WHEN y = {IDX_BASE_Y} THEN p4 END) AS p0, "
        f"max(CASE WHEN y = {IDX_BASE_Y} THEN q END) AS q0, "
        f"max(CASE WHEN y = {IDX_CURR_Y} THEN p4 END) AS p1, "
        f"max(CASE WHEN y = {IDX_CURR_Y} THEN q END) AS q1 "
        "FROM q4 GROUP BY 1), "
        "m AS (SELECT * FROM wide WHERE p0 IS NOT NULL "
        "AND p1 IS NOT NULL), "
        "s AS (SELECT count(*) AS n_parts, "
        "CAST(sum(p1 * q0) AS BIGINT) AS l_num, "
        "CAST(sum(p0 * q0) AS BIGINT) AS l_den, "
        "CAST(sum(p1 * q1) AS BIGINT) AS p_num, "
        "CAST(sum(p0 * q1) AS BIGINT) AS p_den FROM m) "
        "SELECT CAST(n_parts AS BIGINT) AS n_parts, "
        "round(CAST(l_num AS DOUBLE) / CAST(l_den AS DOUBLE), 6) "
        "AS laspeyres, "
        "round(CAST(p_num AS DOUBLE) / CAST(p_den AS DOUBLE), 6) "
        "AS paasche, "
        "round(sqrt((CAST(l_num AS DOUBLE) / CAST(l_den AS DOUBLE)) "
        "* (CAST(p_num AS DOUBLE) / CAST(p_den AS DOUBLE))), 6) "
        "AS fisher FROM s"
    ),
    "agg_hhi_concentration": (
        "WITH rev AS (SELECT l_suppkey, "
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 "
        "AS BIGINT) AS c FROM lineitem GROUP BY 1), "
        "j AS (SELECT n_name, c FROM rev "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey), "
        "g AS (SELECT n_name, count(*) AS n_suppliers, sum(c) AS s1, "
        "sum(CAST(c AS HUGEINT) * c) AS s2 FROM j GROUP BY 1) "
        "SELECT n_name, CAST(n_suppliers AS BIGINT) AS n_suppliers, "
        "round(10000.0 * CAST(s2 AS DOUBLE) "
        "/ (CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)), 6) AS hhi FROM g"
    ),
    "window_interval_stabbing": (
        "WITH deltas AS (SELECT "
        "date_diff('day', DATE '1991-12-30', o_orderdate) AS x, 1 AS d "
        "FROM orders UNION ALL SELECT "
        f"date_diff('day', DATE '1991-12-30', o_orderdate) "
        f"+ {STAB_OPEN_DAYS}, -1 FROM orders), "
        "per AS (SELECT x, sum(d) AS net FROM deltas GROUP BY 1) "
        "SELECT CAST(x AS INT) AS x, CAST(net AS BIGINT) AS net_change, "
        "CAST(sum(net) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) "
        "AS BIGINT) AS open_orders FROM per"
    ),
    "pipeline_shard_manifest": (
        "WITH h AS (SELECT o_orderkey % "
        f"{MANIFEST_SHARDS} AS shard, o_orderkey, "
        "('0x' || substr(md5(o_orderkey::VARCHAR || '|' "
        "|| coalesce(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 "
        "AS BIGINT) AS VARCHAR), '') || '|' || o_orderpriority), 1, 15))"
        "::BIGINT AS h FROM orders) "
        "SELECT shard, CAST(count(*) AS BIGINT) AS n_rows, "
        "min(o_orderkey) AS min_key, max(o_orderkey) AS max_key, "
        f"CAST(sum(h) % {CKSUM_MOD} AS BIGINT) AS checksum "
        "FROM h GROUP BY 1"
    ),
}
