"""Round-6 additions, batch 12: cohort lifetime-value curves and Pareto
revenue concentration.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..catalog import load_tables

LTV_MAX_YEARS = 3  #: LTV horizon (years since first order)

PARETO_TARGET_PM = 800  #: the "80" of the 80/20 rule, in per-mille


def q_agg_cohort_ltv(spark, sf_dir):
    """Cohort lifetime-value curve: customers grouped by FIRST-ORDER
    YEAR, each cohort's cumulative revenue tracked by whole years since
    first order (horizon 3) — the 'how fast does a cohort pay back'
    curve under every acquisition decision.  Two windowless aggs (per-
    customer first date, then (cohort, age) cells) plus ONE ordered
    cumulative sum over the bounded cohort×age grain; revenue is exact
    integer cents, per-customer LTV one final double division."""
    load_tables(spark, sf_dir)
    o = spark.table("orders").select(
        "o_custkey",
        "o_orderdate",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").alias(
            "cents"
        ),
    )
    first = o.groupBy("o_custkey").agg(F.min("o_orderdate").alias("first_dt"))
    aged = o.join(first, "o_custkey").select(
        "o_custkey",
        "cents",
        F.year("first_dt").alias("cohort_year"),
        # (days*4) div 1461 == floor(days/365.25) in EXACT integers —
        # float-cast rounding differs per engine (DuckDB rounds, Spark
        # truncates), so the age bucket must never touch a double
        F.expr("(datediff(o_orderdate, first_dt) * 4) div 1461")
        .cast("int")
        .alias("age_years"),
    ).filter(F.col("age_years") <= LTV_MAX_YEARS)
    sizes = first.groupBy(F.year("first_dt").alias("cohort_year")).agg(
        F.countDistinct("o_custkey").alias("n_customers")
    )
    cells = aged.groupBy("cohort_year", "age_years").agg(
        F.sum("cents").alias("cc")
    )
    w = (
        Window.partitionBy("cohort_year")
        .orderBy("age_years")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = cells.select(
        "cohort_year",
        "age_years",
        F.sum("cc").over(w).alias("cum_cents"),
    )
    return cum.join(sizes, "cohort_year").select(
        "cohort_year",
        "age_years",
        "n_customers",
        (F.col("cum_cents") / 100.0).alias("cum_revenue"),
        # half-up integer cents-per-customer: a float quotient can land
        # exactly on a 2dp tie and round differently per engine
        (
            F.expr("(2 * cum_cents + n_customers) div (2 * n_customers)")
            / 100.0
        ).alias("ltv_per_customer"),
    )


def q_agg_pareto_concentration(spark, sf_dir):
    """Pareto (80/20) revenue concentration: customers ranked by spend
    descending (distributed chunked-offset rank, custkey tiebreak), the
    running revenue share computed in exact integers, and ONE summary
    row: how many customers — and what fraction of the base — cover 80%
    of revenue, plus the top-10% cohort's revenue share.  The threshold
    test is cross-multiplied (1000·cum ≥ 800·total), no float compare;
    the curve never materializes to the driver."""
    from ..operators.ranking import global_row_number, global_running_sum

    load_tables(spark, sf_dir)
    o = spark.table("orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
        ).alias("cents")
    )
    ranked = global_row_number(
        spend.withColumn("neg", -F.col("cents")), ["neg", "o_custkey"]
    )
    tot = ranked.agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("total")
    )
    # running revenue over the DISTRIBUTED chunked-offset prefix sum
    # (customers scale with SF — no single-partition window), then the
    # 80% crossing count: rows whose PREVIOUS cumulative share < 80%
    cum = global_running_sum(ranked, ["i"], ["cents"]).select(
        "i", "cents", F.col("cum_cents").alias("cum")
    )
    j = cum.crossJoin(F.broadcast(tot))
    # cross-multiply in DECIMAL(38,0) (r10): cum*1000 passes 1e19 at
    # hostile magnitudes — the no-float compare survives any cent scale
    k_row = j.agg(
        F.sum(
            (
                (F.col("cum") - F.col("cents")).cast("decimal(38,0)") * 1000
                < PARETO_TARGET_PM * F.col("total").cast("decimal(38,0)")
            ).cast("long")
        ).alias("k80"),
        F.max("n").alias("n"),
        F.max("total").alias("total"),
    )
    top10 = j.filter(F.col("i") * 10 <= F.col("n")).agg(
        F.sum("cents").alias("t10")
    )
    return k_row.crossJoin(F.broadcast(top10)).select(
        F.col("n").alias("n_customers"),
        F.col("k80").alias("customers_for_80pct"),
        F.expr("(2000 * k80 + n) div (2 * n)").alias("base_share_pm"),
        F.round(F.col("t10") / F.col("total").cast("double"), 6).alias(
            "top_decile_rev_share"
        ),
    )


QUERIES = {
    "agg_cohort_ltv": q_agg_cohort_ltv,
    "agg_pareto_concentration": q_agg_pareto_concentration,
}

ORACLES = {
    "agg_cohort_ltv": (
        "WITH o AS (SELECT o_custkey, o_orderdate, "
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents "
        "FROM orders), "
        "f AS (SELECT o_custkey, min(o_orderdate) AS first_dt FROM o GROUP BY 1), "
        "aged AS (SELECT o.cents, year(f.first_dt) AS cohort_year, "
        "CAST((datediff('day', f.first_dt, o.o_orderdate) * 4) // 1461 AS INT) "
        "AS age_years FROM o JOIN f ON o.o_custkey = f.o_custkey), "
        "sizes AS (SELECT year(first_dt) AS cohort_year, "
        "count(DISTINCT o_custkey) AS n_customers FROM f GROUP BY 1), "
        "cells AS (SELECT cohort_year, age_years, sum(cents) AS cc "
        f"FROM aged WHERE age_years <= {LTV_MAX_YEARS} GROUP BY 1, 2), "
        "cum AS (SELECT cohort_year, age_years, "
        "CAST(sum(cc) OVER (PARTITION BY cohort_year ORDER BY age_years) "
        "AS BIGINT) AS cum_cents FROM cells) "
        "SELECT CAST(cum.cohort_year AS BIGINT) AS cohort_year, "
        "CAST(age_years AS INT) AS age_years, n_customers, "
        "cum_cents / 100.0 AS cum_revenue, "
        "((2 * cum_cents + n_customers) // (2 * n_customers)) / 100.0 "
        "AS ltv_per_customer FROM cum JOIN sizes USING (cohort_year)"
    ),
    "agg_pareto_concentration": (
        "WITH spend AS (SELECT o_custkey, "
        "sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS cents "
        "FROM orders GROUP BY 1), "
        "ranked AS (SELECT cents, "
        "row_number() OVER (ORDER BY -cents, o_custkey) AS i FROM spend), "
        "tot AS (SELECT count(*) AS n, sum(cents) AS total FROM ranked), "
        "cum AS (SELECT i, cents, CAST(sum(cents) OVER (ORDER BY i) AS BIGINT) "
        "AS cum FROM ranked), "
        "k AS (SELECT CAST(sum(CASE WHEN (cum - cents)::HUGEINT * 1000 < "
        f"{PARETO_TARGET_PM} * total::HUGEINT THEN 1 ELSE 0 END) AS BIGINT) AS k80, "
        "CAST(max(n) AS BIGINT) AS n, CAST(max(total) AS BIGINT) AS total "
        "FROM cum, tot), "
        "t10 AS (SELECT CAST(sum(cents) AS BIGINT) AS t10 FROM cum, tot "
        "WHERE i * 10 <= n) "
        "SELECT n AS n_customers, k80 AS customers_for_80pct, "
        "CAST((2000 * k80 + n) // (2 * n) AS BIGINT) AS base_share_pm, "
        "round(t10 / CAST(total AS DOUBLE), 6) AS top_decile_rev_share "
        "FROM k, t10"
    ),
}
