"""Round-6 additions, batch 30: GROUPED regression (per-key model
fitting — one OLS per brand in a single agg, the map-side ML shape),
the Ultimate Oscillator (a three-horizon TA blend), ratio-to-average
seasonal adjustment (the classic deseasonalization method, not just the
profile), and Neyman allocation (optimal stratified-sampling design —
the missing planner for the sample_* family).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..catalog import load_tables

#: Ultimate Oscillator horizons (days)
UO_FAST, UO_MID, UO_SLOW = 7, 14, 28

#: Neyman: total sample budget to allocate across strata
NEYMAN_BUDGET = 1000


def q_agg_grouped_linreg(spark, sf_dir):
    """GROUPED OLS — one price-on-quantity regression PER BRAND in a
    single partial+final aggregation (the per-key model-fitting shape:
    thousands of tiny models in one shuffle, no per-group loop).
    slope_b = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) with x = integer
    quantity, y = integer cents, so every group's five moments are
    EXACT BIGINTs and both engines feed identical integers into the
    final fixed-shape doubles.  The negative slope per brand is the
    quantity-discount signal."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem").join(
        spark.table("part"), F.col("l_partkey") == F.col("p_partkey")
    )
    base = li.select(
        "p_brand",
        F.col("l_quantity").cast("long").alias("x"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("y"),
    )
    # cross-moments in DECIMAL(38,0) (r10 extreme-magnitude sweep):
    # x·y per row passes 1e15 and the group sums 1e19 at hostile scales
    g = base.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    # EXACT integer half-up quotients (r10 extreme-magnitude sweep):
    # slope and intercept are rational in the integer moments, and at
    # 1e10+ magnitudes a round(double, 6) output exceeds the ~15.9
    # significant digits a double carries — so the 6-dp decimals are
    # produced in DECIMAL(38,0) integer space (sign-decomposed half-up,
    # the theil_sen spelling) and only divided to display.  den = 0
    # (a brand with constant quantity) yields NULL on both engines.
    slope6 = (
        "CASE WHEN den = 0 THEN NULL "
        "WHEN num >= 0 THEN "
        "((2 * num * 1000000 + den * 100) "
        " - (2 * num * 1000000 + den * 100) % (2 * den * 100)) / (2 * den * 100) "
        "ELSE -(((-2) * num * 1000000 + den * 100 "
        " - ((-2) * num * 1000000 + den * 100) % (2 * den * 100)) / (2 * den * 100)) "
        "END"
    )
    icept6 = (
        "CASE WHEN den = 0 THEN NULL "
        "WHEN inum >= 0 THEN "
        "((2 * inum * 1000000 + iden) - (2 * inum * 1000000 + iden) % (2 * iden)) "
        "/ (2 * iden) "
        "ELSE -((((-2) * inum * 1000000 + iden) "
        " - ((-2) * inum * 1000000 + iden) % (2 * iden)) / (2 * iden)) END"
    )
    moments = g.select(
        "p_brand",
        "n",
        (
            F.col("n") * F.col("sxy")
            - F.col("sx").cast("decimal(19,0)") * F.col("sy").cast("decimal(19,0)")
        ).alias("num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("decimal(38,0)")
        .alias("den"),
        F.col("sy").cast("decimal(19,0)").alias("syD"),
        F.col("sx").cast("decimal(19,0)").alias("sxD"),
    ).selectExpr(
        "p_brand",
        "n",
        "num",
        "den",
        "syD * den - num * sxD AS inum",
        "n * den * 100 AS iden",
    )
    return moments.select(
        "p_brand",
        "n",
        (F.expr(slope6) / 1000000.0).alias("slope_per_unit"),
        (F.expr(icept6) / 1000000.0).alias("intercept_value"),
    )


def q_window_ultimate_osc(spark, sf_dir):
    """Ultimate Oscillator — Williams' three-horizon momentum blend:
    UO = 100 * (4*A7 + 2*A14 + A28) / 7 where A_n = sum(buying
    pressure) / sum(true range) over n days.  Each A_n is a ratio of
    two EXACT integer window sums (buying pressure = close - true low,
    true range = true high - true low, all integer cents with the
    previous close folded in via lag), and the blend is one fixed-shape
    double expression of six exact integers.  Bounded daily grain."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem").select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("day"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    wd = Window.partitionBy("day").orderBy(F.col("ok").desc(), F.col("ln").desc())
    r = li.withColumn("rn_d", F.row_number().over(wd))
    bars = r.groupBy("day").agg(
        F.max("cents").alias("h"),
        F.min("cents").alias("l"),
        F.max(F.when(F.col("rn_d") == 1, F.col("cents"))).alias("c"),
    )
    w = Window.orderBy("day")
    pc = F.lag("c").over(w)
    flows = bars.select(
        "day",
        (F.col("c") - F.least(F.col("l"), pc)).alias("bp"),
        (F.greatest(F.col("h"), pc) - F.least(F.col("l"), pc)).alias("tr"),
        pc.alias("pc"),
    ).filter(F.col("pc").isNotNull())
    sums = flows.select(
        "day",
        *[
            s
            for n, tag in ((UO_FAST, "f"), (UO_MID, "m"), (UO_SLOW, "s"))
            for s in (
                F.sum("bp")
                .over(Window.orderBy("day").rowsBetween(-(n - 1), 0))
                .alias(f"bp_{tag}"),
                F.sum("tr")
                .over(Window.orderBy("day").rowsBetween(-(n - 1), 0))
                .alias(f"tr_{tag}"),
            )
        ],
        F.count(F.lit(1))
        .over(Window.orderBy("day").rowsBetween(-(UO_SLOW - 1), 0))
        .alias("nw"),
    ).filter(F.col("nw") == UO_SLOW)
    uo = (
        100.0
        * (
            4.0 * F.col("bp_f") / F.col("tr_f")
            + 2.0 * F.col("bp_m") / F.col("tr_m")
            + F.col("bp_s") / F.col("tr_s")
        )
        / 7.0
    )
    return sums.select("day", F.round(uo, 6).alias("ultimate_osc"))


def q_ts_seasonal_adjust(spark, sf_dir):
    """Ratio-to-average SEASONAL ADJUSTMENT of daily revenue: the
    weekday seasonal index is each weekday's mean revenue over the
    global mean, and the adjusted series divides every day by its
    weekday index — the classic deseasonalization step (the method,
    where ts_seasonal_profile only reports the profile).

    Exact path: daily revenue is integer cents; the index and the
    adjustment are built from FOUR exact integer sums (weekday cents,
    weekday days, total cents, total days) so the output double
    adjusted = raw * (wd_days * tot_cents) / (tot_days * wd_cents)
    is one fixed-shape expression of identical integers.  Weekday id is
    the portable days-since-anchor mod 7."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    daily = o.groupBy(
        F.expr("datediff(o_orderdate, DATE '1991-12-30')").alias("x")
    ).agg(
        (F.sum("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents")
    )
    wd = daily.select("x", "cents", (F.col("x") % 7).alias("g"))
    wgrp = Window.partitionBy("g")
    wtot = Window.partitionBy()
    scored = wd.select(
        "x",
        "g",
        "cents",
        F.sum("cents").over(wgrp).alias("gc"),
        F.count(F.lit(1)).over(wgrp).alias("gn"),
        F.sum("cents").over(wtot).alias("tc"),
        F.count(F.lit(1)).over(wtot).alias("tn"),
    )
    # index: ONE division of exact int64 products (gc*tn, gn*tc ~ 1e15
    # << 2^63).  adjusted: rounding a 14-significant-digit double at 6dp
    # diverged between the engines' round() implementations (measured at
    # sf0.1), so the adjusted value is an EXACT half-up cents quotient
    # computed in DECIMAL(38) (HUGEINT on the oracle side), divided once
    # for display.
    idx = F.expr("CAST(gc * tn AS DOUBLE) / CAST(gn * tc AS DOUBLE)")
    adj_cents = F.expr(
        "(CAST(2 AS DECIMAL(38,0)) * cents * gn * tc + "
        "CAST(gc AS DECIMAL(38,0)) * tn) "
        "div (CAST(2 AS DECIMAL(38,0)) * gc * tn)"
    )
    return scored.select(
        "x",
        "g",
        (F.col("cents") / 100.0).alias("revenue"),
        F.round(idx, 6).alias("weekday_index"),
        (adj_cents / 100.0).alias("adjusted_revenue"),
    )


def q_sample_neyman_allocation(spark, sf_dir):
    """NEYMAN ALLOCATION — the optimal stratified-sampling design: given
    a total budget of n draws across strata (order priority), allocate
    n_h proportional to N_h * S_h (stratum size x stratum std dev),
    which minimizes the variance of the stratified mean — the planning
    step the sample_stratified operator should be fed with.

    Per-stratum moments are exact DECIMAL(38)/HUGEINT integer sums; the
    allocation weights become doubles in one fixed shape, and the final
    integer allocation uses the floor of the proportional share (the
    deterministic largest-remainder step is reported as the residual
    column rather than re-distributed, keeping every number a pure
    function of the exact moments)."""
    load_tables(spark, sf_dir)
    o = spark.table("orders").select(
        "o_orderpriority",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    g = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_h"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("s1"),
        F.sum(
            (F.col("cents").cast("decimal(38,0)") * F.col("cents")).cast(
                "decimal(38,0)"
            )
        ).alias("s2"),
    )
    # try_divide: a 1-row stratum has no sample variance — NULL on both
    # engines (DuckDB x/0 is NULL; Spark ANSI / would throw)
    sd = F.sqrt(
        F.try_divide(
            F.col("n_h").cast("double") * F.col("s2").cast("double")
            - F.col("s1").cast("double") * F.col("s1").cast("double"),
            F.col("n_h").cast("double") * (F.col("n_h") - 1),
        )
    )
    weighted = g.select(
        "o_orderpriority", "n_h", (F.col("n_h") * sd).alias("w")
    )
    tot = weighted.agg(F.sum("w").alias("tw"))
    return (
        weighted.crossJoin(F.broadcast(tot))
        .select(
            "o_orderpriority",
            "n_h",
            F.round(F.col("w") / F.col("tw"), 6).alias("weight"),
            F.floor(NEYMAN_BUDGET * F.col("w") / F.col("tw"))
            .cast("long")
            .alias("n_alloc"),
        )
    )


QUERIES = {
    "agg_grouped_linreg": q_agg_grouped_linreg,
    "window_ultimate_osc": q_window_ultimate_osc,
    "ts_seasonal_adjust": q_ts_seasonal_adjust,
    "sample_neyman_allocation": q_sample_neyman_allocation,
}

ORACLES = {
    "agg_grouped_linreg": (
        "WITH base AS (SELECT p_brand, CAST(l_quantity AS BIGINT) AS x, "
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y "
        "FROM lineitem JOIN part ON l_partkey = p_partkey), "
        "g AS (SELECT p_brand, count(*) AS n, sum(x) AS sx, sum(y) AS sy, "
        "sum(x::HUGEINT * y) AS sxy, sum(x * x) AS sxx FROM base GROUP BY 1), "
        "m AS (SELECT p_brand, n, n * sxy - sx::HUGEINT * sy AS num, "
        "(n * sxx - sx * sx)::HUGEINT AS den, sy, sx FROM g), "
        "m2 AS (SELECT p_brand, n, num, den, "
        "sy::HUGEINT * den - num * sx AS inum, n * den * 100 AS iden FROM m) "
        "SELECT p_brand, CAST(n AS BIGINT) AS n, "
        "(CASE WHEN den = 0 THEN NULL "
        "WHEN num >= 0 THEN (2 * num * 1000000 + den * 100) // (2 * den * 100) "
        "ELSE -(((-2) * num * 1000000 + den * 100) // (2 * den * 100)) END) "
        "/ 1000000.0 AS slope_per_unit, "
        "(CASE WHEN den = 0 THEN NULL "
        "WHEN inum >= 0 THEN (2 * inum * 1000000 + iden) // (2 * iden) "
        "ELSE -(((-2) * inum * 1000000 + iden) // (2 * iden)) END) "
        "/ 1000000.0 AS intercept_value FROM m2"
    ),
    "window_ultimate_osc": (
        "WITH li AS (SELECT l_orderkey AS ok, l_linenumber AS ln, "
        "strftime(l_shipdate, '%Y-%m-%d') AS day, "
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) "
        "AS cents FROM lineitem), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY day "
        "ORDER BY ok DESC, ln DESC) AS rn_d FROM li), "
        "bars AS (SELECT day, max(cents) AS h, min(cents) AS l, "
        "max(CASE WHEN rn_d = 1 THEN cents END) AS c FROM r GROUP BY 1), "
        "flows AS (SELECT day, "
        "c - least(l, lag(c) OVER (ORDER BY day)) AS bp, "
        "greatest(h, lag(c) OVER (ORDER BY day)) "
        "- least(l, lag(c) OVER (ORDER BY day)) AS tr, "
        "lag(c) OVER (ORDER BY day) AS pc FROM bars), "
        "sums AS (SELECT day, "
        f"sum(bp) OVER wf AS bp_f, sum(tr) OVER wf AS tr_f, "
        f"sum(bp) OVER wm AS bp_m, sum(tr) OVER wm AS tr_m, "
        f"sum(bp) OVER ws AS bp_s, sum(tr) OVER ws AS tr_s, "
        "count(*) OVER ws AS nw FROM flows WHERE pc IS NOT NULL "
        f"WINDOW wf AS (ORDER BY day ROWS BETWEEN {UO_FAST - 1} PRECEDING "
        "AND CURRENT ROW), "
        f"wm AS (ORDER BY day ROWS BETWEEN {UO_MID - 1} PRECEDING "
        "AND CURRENT ROW), "
        f"ws AS (ORDER BY day ROWS BETWEEN {UO_SLOW - 1} PRECEDING "
        "AND CURRENT ROW)) "
        "SELECT day, round(100.0 * ("
        "4.0 * bp_f / tr_f + 2.0 * bp_m / tr_m + bp_s / tr_s) / 7.0, 6) "
        f"AS ultimate_osc FROM sums WHERE nw = {UO_SLOW}"
    ),
    "ts_seasonal_adjust": (
        "WITH daily AS (SELECT "
        "date_diff('day', DATE '1991-12-30', o_orderdate) AS x, "
        "CAST(CAST(sum(o_totalprice) AS DECIMAL(18,2)) * 100 AS BIGINT) "
        "AS cents FROM orders GROUP BY 1), "
        "scored AS (SELECT x, x % 7 AS g, cents, "
        "sum(cents) OVER (PARTITION BY x % 7) AS gc, "
        "count(*) OVER (PARTITION BY x % 7) AS gn, "
        "sum(cents) OVER () AS tc, count(*) OVER () AS tn FROM daily) "
        "SELECT CAST(x AS INT) AS x, CAST(g AS INT) AS g, "
        "cents / 100.0 AS revenue, "
        "round(CAST(CAST(gc * tn AS BIGINT) AS DOUBLE) "
        "/ CAST(CAST(gn * tc AS BIGINT) AS DOUBLE), 6) AS weekday_index, "
        "CAST((CAST(2 AS HUGEINT) * cents * gn * tc "
        "+ CAST(gc AS HUGEINT) * tn) "
        "// (CAST(2 AS HUGEINT) * gc * tn) AS BIGINT) / 100.0 "
        "AS adjusted_revenue FROM scored"
    ),
    "sample_neyman_allocation": (
        "WITH o AS (SELECT o_orderpriority, "
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) "
        "AS cents FROM orders), "
        "g AS (SELECT o_orderpriority, count(*) AS n_h, sum(cents::HUGEINT) AS s1, "
        "sum(cents::HUGEINT * cents) AS s2 FROM o GROUP BY 1), "
        "w AS (SELECT o_orderpriority, n_h, "
        "n_h * sqrt((CAST(n_h AS DOUBLE) * CAST(s2 AS DOUBLE) "
        "- CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) "
        "/ (CAST(n_h AS DOUBLE) * (n_h - 1))) AS wt FROM g), "
        "t AS (SELECT sum(wt) AS tw FROM w) "
        "SELECT o_orderpriority, CAST(n_h AS BIGINT) AS n_h, "
        "round(wt / tw, 6) AS weight, "
        f"CAST(floor({NEYMAN_BUDGET} * wt / tw) AS BIGINT) AS n_alloc "
        "FROM w, t"
    ),
}
