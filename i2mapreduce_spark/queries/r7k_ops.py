"""Round-6 additions, batch 37: forecast evaluation metrics (MAPE /
sMAPE / MASE — the scorecard for the forecasting keys), grouped Gini
(inequality WITHIN each segment, co-partitioned — the global gini key
can't see it), ISO-8601 duration parsing (the P#DT#H#M#S interchange
format), and a piecewise-linear interpolation join (rate-card / yield-
curve lookup between breakpoints — neither equi nor as-of semantics).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..catalog import load_tables

#: seasonal-naive forecast lag (days)
FCE_LAG = 7

#: interpolation curve: (quantity breakpoint, rate per-million)
CURVE = ((1, 0), (10, 20_000), (25, 55_000), (40, 80_000), (50, 100_000))


def q_agg_forecast_eval(spark, sf_dir):
    """FORECAST EVALUATION of the seasonal-naive baseline (forecast =
    the value 7 days earlier) on daily revenue: MAPE, sMAPE and MASE —
    the scorecard that turns the repo's forecasting keys into graded
    models (MASE < 1 beats the one-step naive; Hyndman's scale-free
    standard).

    Exactness: per-day percentage terms are half-up x10^6 integers
    BEFORE averaging (mean-of-float-ratios is the drift trap), so MAPE/
    sMAPE are exact integer means; MASE is one ratio of two exact
    absolute-error cent sums."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    daily = o.groupBy(
        F.expr("datediff(o_orderdate, DATE '1991-12-30')").alias("x")
    ).agg(
        (F.sum("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("a")
    )
    w = Window.orderBy("x")
    j = daily.select(
        "x",
        "a",
        F.lag("a", FCE_LAG).over(w).alias("f"),
        F.lag("a", 1).over(w).alias("p1"),
    ).filter(F.col("f").isNotNull() & F.col("p1").isNotNull())
    ae = F.abs(F.col("a") - F.col("f"))
    terms = j.select(
        ae.alias("ae"),
        F.abs(F.col("a") - F.col("p1")).alias("nae"),
        # x1e6 products in DECIMAL(38,0) (r10: the absolute error passes
        # 1e13 at hostile magnitudes, so the scaled numerator overflows
        # int64); the percentage quotients stay small, so div's long
        # result is safe
        F.expr(
            "(2 * 1000000 * CAST(abs(a - f) AS DECIMAL(38,0)) + a) div (2 * a)"
        ).alias("ape6"),
        F.expr(
            "(2 * 2000000 * CAST(abs(a - f) AS DECIMAL(38,0)) + (a + f)) "
            "div (2 * (a + f))"
        ).alias("sape6"),
    )
    g = terms.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.expr("(2 * sum(ape6) + count(*)) div (2 * count(*))").alias(
            "mape6"
        ),
        F.expr("(2 * sum(sape6) + count(*)) div (2 * count(*))").alias(
            "smape6"
        ),
        F.sum("ae").alias("sae"),
        F.sum("nae").alias("snae"),
    )
    return g.select(
        "n_days",
        (F.col("mape6") / 10000.0).alias("mape_pct"),
        (F.col("smape6") / 10000.0).alias("smape_pct"),
        F.round(
            F.col("sae").cast("double") / F.col("snae").cast("double"), 6
        ).alias("mase"),
    )


def q_agg_gini_by_segment(spark, sf_dir):
    """Gini coefficient of customer account balance WITHIN each market
    segment — inequality per group, where the global agg_gini cannot
    distinguish a segment of equals from a polarized one.  The rank
    runs in a window CO-PARTITIONED by segment (each group sorts
    independently — the scalable grouped-rank shape), balances shift by
    the global minimum so the Gini identity applies to non-negative
    integers, and G = (2*sum(i*x) - (n+1)*sum(x)) / (n*sum(x)) is one
    fixed-shape double of exact BIGINTs."""
    load_tables(spark, sf_dir)
    # complete-case: a balance-less customer has no wealth to rank (the
    # engines' default NULL sort orders differ) — excluded on both sides
    c = spark.table("customer").filter(F.col("c_acctbal").isNotNull())
    shifted = c.select(
        "c_mktsegment",
        "c_custkey",
        (F.col("c_acctbal").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cb"),
    )
    mn = shifted.agg(F.min("cb").alias("mn"))
    nn = shifted.crossJoin(F.broadcast(mn)).select(
        "c_mktsegment",
        "c_custkey",
        (F.col("cb") - F.col("mn")).alias("v"),
    )
    wseg = Window.partitionBy("c_mktsegment").orderBy("v", "c_custkey")
    ranked = nn.withColumn(
        "i", F.row_number().over(wseg).cast("long")
    )
    g = ranked.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("sv"),
        F.sum(F.col("i") * F.col("v")).alias("siv"),
    )
    return g.select(
        "c_mktsegment",
        "n",
        # try_divide: a zero-spend segment (sv = 0) has no concentration
        # to measure — NULL on both engines (DuckDB x/0 is NULL)
        F.round(
            F.try_divide(
                2.0 * F.col("siv") - (F.col("n") + 1.0) * F.col("sv"),
                F.col("n").cast("double") * F.col("sv"),
            ),
            6,
        ).alias("gini"),
    )


def q_fn_iso_duration(spark, sf_dir):
    """ISO-8601 DURATION parsing: P#DT#H#M#S strings (the interchange
    format of every scheduling API) synthesized from order keys, parsed
    back to total seconds with one regexp_extract per component and
    pure integer arithmetic — and re-serialized, with the roundtrip
    asserted per row.  Regex and arithmetic identical in both
    engines."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    d = "(o_orderkey % 28)"
    h = "(o_orderkey % 24)"
    m = "(o_orderkey % 60)"
    s = "(o_orderkey % 45)"
    iso = (
        f"concat('P', {d}, 'DT', {h}, 'H', {m}, 'M', {s}, 'S')"
    )
    enc = o.select("o_orderkey", F.expr(iso).alias("iso"))
    rex = r"P(\d+)DT(\d+)H(\d+)M(\d+)S"
    total = (
        F.regexp_extract("iso", rex, 1).cast("long") * 86400
        + F.regexp_extract("iso", rex, 2).cast("long") * 3600
        + F.regexp_extract("iso", rex, 3).cast("long") * 60
        + F.regexp_extract("iso", rex, 4).cast("long")
    )
    expect = F.expr(
        f"{d} * 86400 + {h} * 3600 + {m} * 60 + {s}"
    ).cast("long")
    return enc.select(
        "o_orderkey",
        "iso",
        total.alias("total_seconds"),
        (total == expect).alias("roundtrip_ok"),
    )


def q_join_interpolate_curve(spark, sf_dir):
    """PIECEWISE-LINEAR interpolation join: look up each lineitem's
    quantity on a breakpoint rate curve and LINEARLY INTERPOLATE
    between the surrounding knots — the rate-card / yield-curve / tax-
    bracket lookup that is neither an equi-join (values fall between
    knots) nor an as-of join (as-of would step, not slope).

    Plan: the bounded literal curve gains its next knot via lead(),
    the knot interval matches with ONE theta-join (auto-broadcast tiny
    build side), and the interpolated rate is an EXACT half-up
    per-million integer: r = r0 + (q - q0) * (r1 - r0) / (q1 - q0) on
    integer operands (the numerator is non-negative: the curve is
    monotone)."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("long").alias("q"),
    )
    rows = ", ".join(f"({q}, {r})" for q, r in CURVE)
    curve = spark.sql(
        f"SELECT q0, r0, lead(q0) OVER (ORDER BY q0) AS q1, "
        f"lead(r0) OVER (ORDER BY q0) AS r1 "
        f"FROM VALUES {rows} AS t(q0, r0)"
    ).filter(F.col("q1").isNotNull())
    j = li.join(
        curve,
        (F.col("q") >= F.col("q0")) & (F.col("q") < F.col("q1")),
    )
    rate = F.expr(
        "r0 + (2 * (q - q0) * (r1 - r0) + (q1 - q0)) div (2 * (q1 - q0))"
    )
    return j.select(
        "l_orderkey",
        "l_linenumber",
        "q",
        (rate / 1000000.0).alias("interp_rate"),
    )


QUERIES = {
    "agg_forecast_eval": q_agg_forecast_eval,
    "agg_gini_by_segment": q_agg_gini_by_segment,
    "fn_iso_duration": q_fn_iso_duration,
    "join_interpolate_curve": q_join_interpolate_curve,
}

_CURVE_ROWS = ", ".join(f"({q}, {r})" for q, r in CURVE)

ORACLES = {
    "agg_forecast_eval": (
        "WITH daily AS (SELECT "
        "date_diff('day', DATE '1991-12-30', o_orderdate) AS x, "
        "CAST(CAST(sum(o_totalprice) AS DECIMAL(18,2)) * 100 AS BIGINT) "
        "AS a FROM orders GROUP BY 1), "
        "j AS (SELECT x, a, "
        f"lag(a, {FCE_LAG}) OVER (ORDER BY x) AS f, "
        "lag(a, 1) OVER (ORDER BY x) AS p1 FROM daily), "
        "terms AS (SELECT abs(a - f) AS ae, abs(a - p1) AS nae, "
        "(2 * 1000000 * abs(a - f)::HUGEINT + a) // (2 * a) AS ape6, "
        "(2 * 2000000 * abs(a - f)::HUGEINT + (a + f)) // (2 * (a + f)) AS sape6 "
        "FROM j WHERE f IS NOT NULL AND p1 IS NOT NULL) "
        "SELECT CAST(count(*) AS BIGINT) AS n_days, "
        "CAST((2 * sum(ape6) + count(*)) // (2 * count(*)) AS BIGINT) "
        "/ 10000.0 AS mape_pct, "
        "CAST((2 * sum(sape6) + count(*)) // (2 * count(*)) AS BIGINT) "
        "/ 10000.0 AS smape_pct, "
        "round(CAST(sum(ae) AS DOUBLE) / CAST(sum(nae) AS DOUBLE), 6) "
        "AS mase FROM terms"
    ),
    "agg_gini_by_segment": (
        "WITH s AS (SELECT c_mktsegment, c_custkey, "
        "CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cb "
        "FROM customer WHERE c_acctbal IS NOT NULL), "
        "mn AS (SELECT min(cb) AS mn FROM s), "
        "nn AS (SELECT c_mktsegment, c_custkey, cb - mn AS v FROM s, mn), "
        "r AS (SELECT c_mktsegment, v, CAST(row_number() OVER "
        "(PARTITION BY c_mktsegment ORDER BY v, c_custkey) AS BIGINT) "
        "AS i FROM nn), "
        "g AS (SELECT c_mktsegment, count(*) AS n, sum(v) AS sv, "
        "sum(i * v) AS siv FROM r GROUP BY 1) "
        "SELECT c_mktsegment, CAST(n AS BIGINT) AS n, "
        "round((2.0 * siv - (n + 1.0) * sv) "
        "/ (CAST(n AS DOUBLE) * sv), 6) AS gini FROM g"
    ),
    "fn_iso_duration": (
        "WITH enc AS (SELECT o_orderkey, "
        "concat('P', o_orderkey % 28, 'DT', o_orderkey % 24, 'H', "
        "o_orderkey % 60, 'M', o_orderkey % 45, 'S') AS iso FROM orders) "
        "SELECT o_orderkey, iso, "
        "CAST(regexp_extract(iso, 'P(\\d+)DT', 1) AS BIGINT) * 86400 "
        "+ CAST(regexp_extract(iso, 'DT(\\d+)H', 1) AS BIGINT) * 3600 "
        "+ CAST(regexp_extract(iso, 'H(\\d+)M', 1) AS BIGINT) * 60 "
        "+ CAST(regexp_extract(iso, 'M(\\d+)S', 1) AS BIGINT) "
        "AS total_seconds, "
        "(CAST(regexp_extract(iso, 'P(\\d+)DT', 1) AS BIGINT) * 86400 "
        "+ CAST(regexp_extract(iso, 'DT(\\d+)H', 1) AS BIGINT) * 3600 "
        "+ CAST(regexp_extract(iso, 'H(\\d+)M', 1) AS BIGINT) * 60 "
        "+ CAST(regexp_extract(iso, 'M(\\d+)S', 1) AS BIGINT)) "
        "= ((o_orderkey % 28) * 86400 + (o_orderkey % 24) * 3600 "
        "+ (o_orderkey % 60) * 60 + (o_orderkey % 45)) AS roundtrip_ok "
        "FROM enc"
    ),
    "join_interpolate_curve": (
        f"WITH c0 AS (SELECT * FROM (VALUES {_CURVE_ROWS}) AS t(q0, r0)), "
        "curve AS (SELECT q0, r0, lead(q0) OVER (ORDER BY q0) AS q1, "
        "lead(r0) OVER (ORDER BY q0) AS r1 FROM c0), "
        "k AS (SELECT * FROM curve WHERE q1 IS NOT NULL), "
        "j AS (SELECT l_orderkey, l_linenumber, "
        "CAST(l_quantity AS BIGINT) AS q, q0, r0, q1, r1 "
        "FROM lineitem JOIN k ON CAST(l_quantity AS BIGINT) >= q0 "
        "AND CAST(l_quantity AS BIGINT) < q1) "
        "SELECT l_orderkey, l_linenumber, q, "
        "(r0 + (2 * (q - q0) * (r1 - r0) + (q1 - q0)) "
        "// (2 * (q1 - q0))) / 1000000.0 AS interp_rate FROM j"
    ),
}
