"""Round-6 additions, batch 46: the odds ratio / relative risk with a
log-scale confidence interval (epidemiology's 2x2 toolkit — the same
exact-count discipline as the z/MCC keys, different inferential
surface), and the revenue BRIDGE (waterfall attribution of a
year-over-year change to segments — the decomposition every executive
review walks through).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_tables

#: exposure split and z for the 95% CI
OR_CUTOFF = 30000     # value cents: 'exposed' = high-value event
Z95 = 1.959963984540054

#: bridge years
BR_Y0, BR_Y1 = 1995, 1996


def q_agg_odds_ratio(spark, sf_dir):
    """ODDS RATIO and RELATIVE RISK of purchase for high-value vs
    low-value events, with the 95% log-scale Woolf CI — the 2x2
    epidemiology toolkit (case-control reads OR, cohort reads RR).
    The four cells are exact integers from one agg; OR, RR and the CI
    bounds exp(ln OR ± z*sqrt(1/a+1/b+1/c+1/d)) are fixed-shape doubles
    of identical integers, z as a python literal."""
    load_tables(spark, sf_dir)
    # complete-case: an unvalued event is neither exposed nor unexposed
    # (Spark's boolean-cast yields NULL where SQL's CASE-ELSE yields 0)
    # — excluded on both sides
    e = spark.table("events").filter(F.col("value").isNotNull())
    lab = e.select(
        (
            F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
            > OR_CUTOFF
        )
        .cast("long")
        .alias("x"),
        (F.col("event_type") == "purchase").cast("long").alias("y"),
    )
    c = lab.agg(
        F.sum(F.expr("x * y")).alias("a"),
        F.sum(F.expr("x * (1 - y)")).alias("b"),
        F.sum(F.expr("(1 - x) * y")).alias("c"),
        F.sum(F.expr("(1 - x) * (1 - y)")).alias("d"),
    )
    # Haldane-Anscombe correction: +0.5 on every cell keeps the OR and
    # its CI finite when a cell is empty (measured: zero high-value
    # purchases at sf0.001) — the textbook fix, exact halves in double
    a = F.col("a").cast("double") + 0.5
    b = F.col("b").cast("double") + 0.5
    cc = F.col("c").cast("double") + 0.5
    d = F.col("d").cast("double") + 0.5
    orx = (a * d) / (b * cc)
    rr = (a / (a + b)) / (cc / (cc + d))
    se = F.sqrt(1 / a + 1 / b + 1 / cc + 1 / d)
    return c.select(
        "a",
        "b",
        "c",
        "d",
        F.round(orx, 6).alias("odds_ratio"),
        F.round(rr, 6).alias("relative_risk"),
        F.round(F.exp(F.log(orx) - Z95 * se), 6).alias("or_ci_lo"),
        F.round(F.exp(F.log(orx) + Z95 * se), 6).alias("or_ci_hi"),
    )


def q_agg_revenue_bridge(spark, sf_dir):
    """REVENUE BRIDGE (waterfall): attribute the 1995 -> 1996 total
    revenue change to market segments — each segment's delta, its sign,
    and its per-mille contribution to the absolute total change (the
    walk every executive review does from last year's bar to this
    year's).  One partial+final agg to (segment, year) exact cents,
    a two-column pivot, and half-up contribution quotients on a signed
    numerator via the sign-decomposed form."""
    load_tables(spark, sf_dir)
    o = spark.table("orders").join(
        spark.table("customer"), F.col("o_custkey") == F.col("c_custkey")
    )
    per = o.filter(
        F.year("o_orderdate").isin(BR_Y0, BR_Y1)
    ).groupBy("c_mktsegment", F.year("o_orderdate").alias("y")).agg(
        (F.sum("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents")
    )
    wide = per.groupBy("c_mktsegment").agg(
        F.max(F.when(F.col("y") == BR_Y0, F.col("cents"))).alias("r0"),
        F.max(F.when(F.col("y") == BR_Y1, F.col("cents"))).alias("r1"),
    )
    tot = wide.agg(
        F.sum(F.expr("abs(r1 - r0)")).alias("tabs")
    )
    j = wide.crossJoin(F.broadcast(tot))
    delta = F.col("r1") - F.col("r0")
    contrib = F.expr(
        "CASE WHEN r1 - r0 >= 0 THEN "
        "(2 * 1000 * (r1 - r0) + tabs) div (2 * tabs) "
        "ELSE -((2 * 1000 * (r0 - r1) + tabs) div (2 * tabs)) END"
    )
    return j.select(
        "c_mktsegment",
        (F.col("r0") / 100.0).alias("rev_y0"),
        (F.col("r1") / 100.0).alias("rev_y1"),
        (delta / 100.0).alias("delta"),
        contrib.alias("contribution_pm"),
    )


QUERIES = {
    "agg_odds_ratio": q_agg_odds_ratio,
    "agg_revenue_bridge": q_agg_revenue_bridge,
}

ORACLES = {
    "agg_odds_ratio": (
        "WITH lab AS (SELECT CASE WHEN "
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) > "
        f"{OR_CUTOFF} THEN 1 ELSE 0 END AS x, "
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y "
        "FROM events WHERE value IS NOT NULL), "
        "c AS (SELECT CAST(sum(x * y) AS BIGINT) AS a, "
        "CAST(sum(x * (1 - y)) AS BIGINT) AS b, "
        "CAST(sum((1 - x) * y) AS BIGINT) AS c, "
        "CAST(sum((1 - x) * (1 - y)) AS BIGINT) AS d FROM lab) "
        "SELECT a, b, c, d, "
        "round(((a + 0.5) * (d + 0.5)) / ((b + 0.5) * (c + 0.5)), 6) "
        "AS odds_ratio, "
        "round(((a + 0.5) / (a + b + 1.0)) "
        "/ ((c + 0.5) / (c + d + 1.0)), 6) AS relative_risk, "
        "round(exp(ln(((a + 0.5) * (d + 0.5)) / ((b + 0.5) * (c + 0.5))) "
        f"- {Z95!r} * sqrt(1.0 / (a + 0.5) + 1.0 / (b + 0.5) "
        "+ 1.0 / (c + 0.5) + 1.0 / (d + 0.5))), 6) AS or_ci_lo, "
        "round(exp(ln(((a + 0.5) * (d + 0.5)) / ((b + 0.5) * (c + 0.5))) "
        f"+ {Z95!r} * sqrt(1.0 / (a + 0.5) + 1.0 / (b + 0.5) "
        "+ 1.0 / (c + 0.5) + 1.0 / (d + 0.5))), 6) AS or_ci_hi FROM c"
    ),
    "agg_revenue_bridge": (
        "WITH per AS (SELECT c_mktsegment, year(o_orderdate) AS y, "
        "CAST(CAST(sum(o_totalprice) AS DECIMAL(18,2)) * 100 AS BIGINT) "
        "AS cents FROM orders JOIN customer ON o_custkey = c_custkey "
        f"WHERE year(o_orderdate) IN ({BR_Y0}, {BR_Y1}) GROUP BY 1, 2), "
        "wide AS (SELECT c_mktsegment, "
        f"max(CASE WHEN y = {BR_Y0} THEN cents END) AS r0, "
        f"max(CASE WHEN y = {BR_Y1} THEN cents END) AS r1 "
        "FROM per GROUP BY 1), "
        "tot AS (SELECT CAST(sum(abs(r1 - r0)) AS BIGINT) AS tabs "
        "FROM wide) "
        "SELECT c_mktsegment, r0 / 100.0 AS rev_y0, r1 / 100.0 AS rev_y1, "
        "(r1 - r0) / 100.0 AS delta, "
        "CAST(CASE WHEN r1 - r0 >= 0 THEN "
        "(2 * 1000 * (r1 - r0) + tabs) // (2 * tabs) "
        "ELSE -((2 * 1000 * (r0 - r1) + tabs) // (2 * tabs)) END "
        "AS BIGINT) AS contribution_pm FROM wide, tot"
    ),
}
