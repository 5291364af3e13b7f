"""Round-6 additions, batch 44: statistical process control — Cp/Cpk
process capability (can the process hold its spec limits), a control
chart with Western-Electric rule 1 (points beyond the 3-sigma limits of
a FROZEN baseline period), and Little's law reconciliation (L =
lambda * W — queueing theory's conservation check over the open-order
sweep).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..catalog import load_tables

#: spec limits for order value (dollars) — the declared tolerance band
SPEC_LO, SPEC_HI = 1000.0, 450000.0

#: control-chart baseline: first N days freeze the limits
CTRL_BASE_DAYS = 365

#: Little's law: order 'open' horizon (days), matches interval stabbing
LL_OPEN_DAYS = 30


def q_agg_process_capability(spark, sf_dir):
    """PROCESS CAPABILITY Cp / Cpk of order value against declared spec
    limits: Cp = (USL - LSL) / 6 sigma (potential), Cpk = min(USL - mu,
    mu - LSL) / 3 sigma (actual, penalizing off-center) — the
    manufacturing SPC indices applied to a value stream.  Moments are
    exact DECIMAL(38)/HUGEINT cent sums; Cp/Cpk are fixed-shape doubles
    of those identical integers."""
    load_tables(spark, sf_dir)
    o = spark.table("orders").select(
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("c")
    )
    m = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("c").cast("decimal(38,0)")).alias("s1"),
        F.sum(
            (F.col("c").cast("decimal(38,0)") * F.col("c")).cast(
                "decimal(38,0)"
            )
        ).alias("s2"),
    )
    n = F.col("n").cast("double")
    # try_divide: with n <= 1 the process spread is undefined — NULL on
    # both engines (DuckDB x/0 is NULL; Spark ANSI / would throw)
    mu = F.try_divide(F.col("s1").cast("double"), n)
    sd = F.sqrt(
        F.try_divide(
            n * F.col("s2").cast("double")
            - F.col("s1").cast("double") * F.col("s1").cast("double"),
            n * (n - 1),
        )
    )
    lo, hi = SPEC_LO * 100.0, SPEC_HI * 100.0
    cp = F.try_divide(F.lit(hi - lo), 6.0 * sd)
    cpk = F.try_divide(F.least(hi - mu, mu - lo), 3.0 * sd)
    return m.select(
        "n",
        F.round(mu / 100.0, 6).alias("mean_value"),
        F.round(sd / 100.0, 6).alias("sd_value"),
        F.round(cp, 6).alias("cp"),
        F.round(cpk, 6).alias("cpk"),
    )


def q_window_control_chart(spark, sf_dir):
    """CONTROL CHART with FROZEN limits: the first year of daily revenue
    fixes the center line and 3-sigma limits (exact integer baseline
    moments), then every later day is judged against those frozen
    limits (Western Electric rule 1) — the SPC discipline that
    window_anomaly_zscore's rolling z cannot express (rolling limits
    chase the drift they should flag).  Output: the out-of-control
    days with their side."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    daily = o.groupBy(
        F.expr("datediff(o_orderdate, DATE '1991-12-30')").alias("x")
    ).agg(
        (F.sum("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("c")
    )
    base = daily.filter(F.col("x") <= CTRL_BASE_DAYS).agg(
        F.count(F.lit(1)).alias("bn"),
        F.sum(F.col("c").cast("decimal(38,0)")).alias("b1"),
        F.sum(
            (F.col("c").cast("decimal(38,0)") * F.col("c")).cast(
                "decimal(38,0)"
            )
        ).alias("b2"),
    )
    j = daily.filter(F.col("x") > CTRL_BASE_DAYS).crossJoin(
        F.broadcast(base)
    )
    bn = F.col("bn").cast("double")
    mu = F.col("b1").cast("double") / bn
    sd = F.sqrt(
        (bn * F.col("b2").cast("double")
         - F.col("b1").cast("double") * F.col("b1").cast("double"))
        / (bn * (bn - 1))
    )
    side = (
        F.when(F.col("c") > mu + 3 * sd, "above")
        .when(F.col("c") < mu - 3 * sd, "below")
        .otherwise("in")
    )
    return j.select(
        "x",
        (F.col("c") / 100.0).alias("revenue"),
        side.alias("status"),
        F.round(mu / 100.0, 6).alias("center"),
        F.round(sd / 100.0, 6).alias("sigma"),
    )


def q_agg_littles_law(spark, sf_dir):
    """LITTLE'S LAW reconciliation over the open-order system: the
    time-average number of open orders (L, integrated from the
    interval-stabbing sweep) must equal the arrival rate (lambda,
    orders per day) times the fixed residence time (W = 30 days) —
    queueing theory's conservation identity as a data-quality check on
    the sweep itself.  L integrates EXACTLY: sum over orders of days
    open inside the horizon = n_orders * 30, divided by the observed
    span; every number is an exact integer ratio, and the ratio column
    proves the identity to within the boundary effect the output also
    quantifies."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    s = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.expr("datediff(o_orderdate, DATE '1991-12-30')")).alias(
            "d0"
        ),
        F.max(F.expr("datediff(o_orderdate, DATE '1991-12-30')")).alias(
            "d1"
        ),
    )
    span = F.col("d1") - F.col("d0") + 1
    # L = total open-order-days / span; open-order-days = n * W exactly
    l_x = F.expr(
        f"(2 * 1000 * n * {LL_OPEN_DAYS} + (d1 - d0 + 1)) "
        "div (2 * (d1 - d0 + 1))"
    )
    lam_x = F.expr("(2 * 1000 * n + (d1 - d0 + 1)) div (2 * (d1 - d0 + 1))")
    return s.select(
        "n",
        span.alias("span_days"),
        (l_x / 1000.0).alias("avg_open_l"),
        (lam_x / 1000.0).alias("arrival_rate"),
        F.lit(LL_OPEN_DAYS).alias("w_days"),
        # identity check: L / (lambda * W), per-mille (1000 = exact)
        F.expr(
            f"(2 * 1000 * (2 * 1000 * n * {LL_OPEN_DAYS} + (d1 - d0 + 1)) "
            f"+ {LL_OPEN_DAYS} * ((2 * 1000 * n + (d1 - d0 + 1)) "
            "div (2 * (d1 - d0 + 1))) * (2 * (d1 - d0 + 1))) "
            f"div (2 * {LL_OPEN_DAYS} * ((2 * 1000 * n + (d1 - d0 + 1)) "
            "div (2 * (d1 - d0 + 1))) * (2 * (d1 - d0 + 1)))"
        ).alias("identity_pm"),
    )


QUERIES = {
    "agg_process_capability": q_agg_process_capability,
    "window_control_chart": q_window_control_chart,
    "agg_littles_law": q_agg_littles_law,
}

ORACLES = {
    "agg_process_capability": (
        "WITH o AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) "
        "* 100 AS BIGINT) AS c FROM orders), "
        "m AS (SELECT count(*) AS n, sum(c) AS s1, "
        "sum(CAST(c AS HUGEINT) * c) AS s2 FROM o) "
        "SELECT CAST(n AS BIGINT) AS n, "
        "round(CAST(s1 AS DOUBLE) / n / 100.0, 6) AS mean_value, "
        "round(sqrt((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE) "
        "- CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) "
        "/ (CAST(n AS DOUBLE) * (n - 1))) / 100.0, 6) AS sd_value, "
        f"round(({SPEC_HI * 100.0!r} - {SPEC_LO * 100.0!r}) "
        "/ (6.0 * sqrt((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE) "
        "- CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) "
        "/ (CAST(n AS DOUBLE) * (n - 1)))), 6) AS cp, "
        f"round(least({SPEC_HI * 100.0!r} - CAST(s1 AS DOUBLE) / n, "
        f"CAST(s1 AS DOUBLE) / n - {SPEC_LO * 100.0!r}) "
        "/ (3.0 * sqrt((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE) "
        "- CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) "
        "/ (CAST(n AS DOUBLE) * (n - 1)))), 6) AS cpk FROM m"
    ),
    "window_control_chart": (
        "WITH daily AS (SELECT "
        "date_diff('day', DATE '1991-12-30', o_orderdate) AS x, "
        "CAST(CAST(sum(o_totalprice) AS DECIMAL(18,2)) * 100 AS BIGINT) "
        "AS c FROM orders GROUP BY 1), "
        f"base AS (SELECT count(*) AS bn, sum(c) AS b1, "
        "sum(CAST(c AS HUGEINT) * c) AS b2 FROM daily "
        f"WHERE x <= {CTRL_BASE_DAYS}), "
        f"j AS (SELECT x, c FROM daily WHERE x > {CTRL_BASE_DAYS}) "
        "SELECT CAST(x AS INT) AS x, c / 100.0 AS revenue, "
        "CASE WHEN c > CAST(b1 AS DOUBLE) / bn "
        "+ 3 * sqrt((CAST(bn AS DOUBLE) * CAST(b2 AS DOUBLE) "
        "- CAST(b1 AS DOUBLE) * CAST(b1 AS DOUBLE)) "
        "/ (CAST(bn AS DOUBLE) * (bn - 1))) THEN 'above' "
        "WHEN c < CAST(b1 AS DOUBLE) / bn "
        "- 3 * sqrt((CAST(bn AS DOUBLE) * CAST(b2 AS DOUBLE) "
        "- CAST(b1 AS DOUBLE) * CAST(b1 AS DOUBLE)) "
        "/ (CAST(bn AS DOUBLE) * (bn - 1))) THEN 'below' "
        "ELSE 'in' END AS status, "
        "round(CAST(b1 AS DOUBLE) / bn / 100.0, 6) AS center, "
        "round(sqrt((CAST(bn AS DOUBLE) * CAST(b2 AS DOUBLE) "
        "- CAST(b1 AS DOUBLE) * CAST(b1 AS DOUBLE)) "
        "/ (CAST(bn AS DOUBLE) * (bn - 1))) / 100.0, 6) AS sigma "
        "FROM j, base"
    ),
    "agg_littles_law": (
        "WITH s AS (SELECT count(*) AS n, "
        "min(date_diff('day', DATE '1991-12-30', o_orderdate)) AS d0, "
        "max(date_diff('day', DATE '1991-12-30', o_orderdate)) AS d1 "
        "FROM orders) "
        "SELECT CAST(n AS BIGINT) AS n, "
        "CAST(d1 - d0 + 1 AS BIGINT) AS span_days, "
        f"CAST((2 * 1000 * n * {LL_OPEN_DAYS} + (d1 - d0 + 1)) "
        "// (2 * (d1 - d0 + 1)) AS BIGINT) / 1000.0 AS avg_open_l, "
        "CAST((2 * 1000 * n + (d1 - d0 + 1)) // (2 * (d1 - d0 + 1)) "
        "AS BIGINT) / 1000.0 AS arrival_rate, "
        f"{LL_OPEN_DAYS} AS w_days, "
        f"CAST((2 * 1000 * (2 * 1000 * n * {LL_OPEN_DAYS} "
        f"+ (d1 - d0 + 1)) + {LL_OPEN_DAYS} "
        "* ((2 * 1000 * n + (d1 - d0 + 1)) // (2 * (d1 - d0 + 1))) "
        f"* (2 * (d1 - d0 + 1))) // (2 * {LL_OPEN_DAYS} "
        "* ((2 * 1000 * n + (d1 - d0 + 1)) // (2 * (d1 - d0 + 1))) "
        "* (2 * (d1 - d0 + 1))) AS BIGINT) AS identity_pm FROM s"
    ),
}
