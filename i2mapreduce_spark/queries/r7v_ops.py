"""Round-6 additions, batch 48: the four-firm concentration ratio (CR4
— HHI's regulatory sibling, reading the top of the distribution), the
volatility of volatility (second-moment dynamics via exact quantized
rolling variances), and the NOT-IN-with-NULL trap (the ANSI three-
valued-logic semantics both engines implement and most queries get
wrong — codified as a checkable key).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..catalog import load_tables

#: CR-k: how many top firms
CR_K = 4

#: vol-of-vol windows (days)
VV_INNER, VV_OUTER = 10, 20


def q_agg_cr4_concentration(spark, sf_dir):
    """FOUR-FIRM CONCENTRATION RATIO per nation: the top-4 suppliers'
    share of national revenue — the regulator's quick screen that reads
    the TOP of the distribution where HHI (agg_hhi_concentration) sums
    the whole of it.  Top-4 by co-partitioned rank (revenue desc, key),
    share as a half-up per-mille quotient of exact cents."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem")
    sup = spark.table("supplier")
    n = spark.table("nation")
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("c")
        )
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name", "l_suppkey", "c")
    )
    w = Window.partitionBy("n_name").orderBy(
        F.col("c").desc(), F.col("l_suppkey")
    )
    ranked = rev.withColumn("rk", F.row_number().over(w))
    g = ranked.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum("c").alias("total"),
        F.sum(F.when(F.col("rk") <= CR_K, F.col("c")).otherwise(0)).alias(
            "top4"
        ),
    )
    return g.select(
        "n_name",
        "n_suppliers",
        F.expr("(2 * 1000 * top4 + total) div (2 * total)").alias(
            "cr4_pm"
        ),
    )


def q_window_vol_of_vol(spark, sf_dir):
    """VOLATILITY OF VOLATILITY: the rolling standard deviation OF the
    rolling variance of daily revenue — second-moment dynamics (is risk
    itself stable?), the nested statistic variance-regime monitors
    track.  The inner rolling variance is an EXACT rational of integer
    window sums, QUANTIZED half-up to integer cents^2 (the r6
    quantize-then-moment discipline); the outer moments then run on
    exact integers in DECIMAL(38)/HUGEINT and one sqrt closes it.
    Bounded daily grain."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    daily = o.groupBy(
        F.expr("datediff(o_orderdate, DATE '1991-12-30')").alias("x")
    ).agg(
        (F.sum("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("c")
    )
    wi = Window.orderBy("x").rowsBetween(-(VV_INNER - 1), 0)
    inner = daily.select(
        "x",
        F.count(F.lit(1)).over(wi).alias("n"),
        F.sum("c").over(wi).alias("s1"),
        F.sum(
            (F.col("c").cast("decimal(38,0)") * F.col("c")).cast(
                "decimal(38,0)"
            )
        )
        .over(wi)
        .alias("s2"),
    ).filter(F.col("n") == VV_INNER)
    # exact rolling variance (population, x cents^2), quantized half-up:
    # var = (n*s2 - s1^2) / n^2
    varq = inner.select(
        "x",
        F.expr(
            f"CAST((2 * ({VV_INNER} * s2 "
            "- CAST(s1 AS DECIMAL(38,0)) * s1) "
            f"+ {VV_INNER * VV_INNER}) div {2 * VV_INNER * VV_INNER} "
            "AS DECIMAL(38,0))"
        ).alias("v"),
    )
    wo = Window.orderBy("x").rowsBetween(-(VV_OUTER - 1), 0)
    outer = varq.select(
        "x",
        F.count(F.lit(1)).over(wo).alias("m"),
        F.sum("v").over(wo).alias("t1"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(38,0)"))
        .over(wo)
        .alias("t2"),
    ).filter(F.col("m") == VV_OUTER)
    m = F.col("m").cast("double")
    vv = F.sqrt(
        (m * F.col("t2").cast("double")
         - F.col("t1").cast("double") * F.col("t1").cast("double"))
        / (m * (m - 1))
    )
    return outer.select(
        "x",
        F.round(F.sqrt(F.col("t1").cast("double") / m) / 100.0, 6).alias(
            "mean_vol"
        ),
        F.round(F.sqrt(vv) / 100.0, 6).alias("vol_of_vol"),
    )


def q_join_not_in_null_trap(spark, sf_dir):
    """The NOT-IN-WITH-NULL trap, codified: a probe list CONTAINING A
    NULL makes `x NOT IN (list)` evaluate to UNKNOWN for every row
    (three-valued logic), so the NOT IN branch returns ZERO rows while
    the NOT EXISTS branch returns the expected complement — the ANSI
    semantics both engines implement and production queries routinely
    get wrong.  Output: both counts side by side plus the trap's row
    deficit, a regression guard on the engines' null logic."""
    load_tables(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW _probe AS "
        "SELECT * FROM VALUES (1), (2), (3), (NULL) AS t(k)"
    )
    not_in = spark.sql(
        "SELECT count(*) AS c FROM nation "
        "WHERE n_nationkey NOT IN (SELECT k FROM _probe)"
    )
    not_exists = spark.sql(
        "SELECT count(*) AS c FROM nation n WHERE NOT EXISTS "
        "(SELECT 1 FROM _probe p WHERE p.k = n.n_nationkey)"
    )
    return (
        not_in.select(F.col("c").alias("not_in_rows"))
        .crossJoin(
            not_exists.select(F.col("c").alias("not_exists_rows"))
        )
        .select(
            "not_in_rows",
            "not_exists_rows",
            (F.col("not_exists_rows") - F.col("not_in_rows")).alias(
                "trap_deficit"
            ),
        )
    )


QUERIES = {
    "agg_cr4_concentration": q_agg_cr4_concentration,
    "window_vol_of_vol": q_window_vol_of_vol,
    "join_not_in_null_trap": q_join_not_in_null_trap,
}

ORACLES = {
    "agg_cr4_concentration": (
        "WITH rev AS (SELECT n_name, l_suppkey, "
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 "
        "AS BIGINT) AS c FROM lineitem "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "GROUP BY 1, 2), "
        "r AS (SELECT n_name, c, row_number() OVER (PARTITION BY n_name "
        "ORDER BY c DESC, l_suppkey) AS rk FROM rev), "
        "g AS (SELECT n_name, count(*) AS n_suppliers, sum(c) AS total, "
        f"sum(CASE WHEN rk <= {CR_K} THEN c ELSE 0 END) AS top4 "
        "FROM r GROUP BY 1) "
        "SELECT n_name, CAST(n_suppliers AS BIGINT) AS n_suppliers, "
        "CAST((2 * 1000 * top4 + total) // (2 * total) AS BIGINT) "
        "AS cr4_pm FROM g"
    ),
    "window_vol_of_vol": (
        "WITH daily AS (SELECT "
        "date_diff('day', DATE '1991-12-30', o_orderdate) AS x, "
        "CAST(CAST(sum(o_totalprice) AS DECIMAL(18,2)) * 100 AS BIGINT) "
        "AS c FROM orders GROUP BY 1), "
        "inner_w AS (SELECT x, count(*) OVER wi AS n, "
        "sum(c) OVER wi AS s1, "
        "sum(CAST(c AS HUGEINT) * c) OVER wi AS s2 FROM daily "
        f"WINDOW wi AS (ORDER BY x ROWS BETWEEN {VV_INNER - 1} PRECEDING "
        "AND CURRENT ROW)), "
        f"varq AS (SELECT x, (2 * ({VV_INNER} * s2 "
        "- CAST(s1 AS HUGEINT) * s1) "
        f"+ {VV_INNER * VV_INNER}) // {2 * VV_INNER * VV_INNER} AS v "
        f"FROM inner_w WHERE n = {VV_INNER}), "
        "outer_w AS (SELECT x, count(*) OVER wo AS m, "
        "sum(v) OVER wo AS t1, sum(v * v) OVER wo AS t2 FROM varq "
        f"WINDOW wo AS (ORDER BY x ROWS BETWEEN {VV_OUTER - 1} PRECEDING "
        "AND CURRENT ROW)) "
        "SELECT CAST(x AS INT) AS x, "
        "round(sqrt(CAST(t1 AS DOUBLE) / m) / 100.0, 6) AS mean_vol, "
        "round(sqrt(sqrt((CAST(m AS DOUBLE) * CAST(t2 AS DOUBLE) "
        "- CAST(t1 AS DOUBLE) * CAST(t1 AS DOUBLE)) "
        "/ (CAST(m AS DOUBLE) * (m - 1)))) / 100.0, 6) AS vol_of_vol "
        f"FROM outer_w WHERE m = {VV_OUTER}"
    ),
    "join_not_in_null_trap": (
        "WITH probe AS (SELECT * FROM (VALUES (1), (2), (3), (NULL)) "
        "AS t(k)), "
        "ni AS (SELECT count(*) AS c FROM nation "
        "WHERE n_nationkey NOT IN (SELECT k FROM probe)), "
        "ne AS (SELECT count(*) AS c FROM nation n WHERE NOT EXISTS "
        "(SELECT 1 FROM probe p WHERE p.k = n.n_nationkey)) "
        "SELECT CAST(ni.c AS BIGINT) AS not_in_rows, "
        "CAST(ne.c AS BIGINT) AS not_exists_rows, "
        "CAST(ne.c - ni.c AS BIGINT) AS trap_deficit FROM ni, ne"
    ),
}
