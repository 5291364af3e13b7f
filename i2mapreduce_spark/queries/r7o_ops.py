"""Round-6 additions, batch 41: deterministic weighted INTERLEAVING
(the training-stream scheduler that turns mixture weights into an
actual example order), expected calibration error (the one-number
summary of the calibration table), a METADATA-DRIVEN rules engine
(validation rules as data, not code), and longest-streak analytics
(gaps-and-islands pushed to its summary form).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..catalog import load_tables
from ..operators.ranking import global_row_number

#: interleave: how many scheduled positions to emit
ILV_HEAD = 100

#: ECE bins
ECE_BINS = 10

#: validation rules: (rule_id, column, op, threshold) over orders
RULES = (
    (1, "o_totalprice", "gt", 0),
    (2, "o_totalprice", "lt", 60000000),
    (3, "o_orderkey", "gt", 0),
    (4, "o_custkey", "gt", 0),
)


def q_pipeline_interleave_order(spark, sf_dir):
    """Deterministic WEIGHTED INTERLEAVING of corpus sources into one
    training stream: each document's schedule key is its within-source
    rank STRETCHED by the inverse of the source's document share, so
    sources appear in proportion everywhere in the stream (not in
    blocks) — the step that turns pipeline_mixture_weights into an
    actual example order a trainer can consume.

    Plan: per-source ranks from co-partitioned md5-ordered windows,
    source sizes from one bounded agg, schedule key = rank * N / n_src
    as an EXACT half-up integer, global order materialized for the
    first 100 positions via distributed sort+limit.  Everything
    deterministic and integer-exact."""
    load_tables(spark, sf_dir)
    d = spark.table("documents")
    ws = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = d.select(
        "doc_id",
        "source",
        F.row_number().over(ws).cast("long").alias("r"),
    )
    sizes = ranked.groupBy("source").agg(F.max("r").alias("ns"))
    tot = sizes.agg(F.sum("ns").alias("n"))
    keyed = (
        ranked.join(F.broadcast(sizes), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "source",
            "r",
            F.expr("(2 * r * n + ns) div (2 * ns)").alias("sched"),
        )
    )
    return (
        keyed.orderBy("sched", "source", "doc_id")
        .limit(ILV_HEAD)
        .select("sched", "source", "doc_id", "r")
    )


def q_agg_ece(spark, sf_dir):
    """EXPECTED CALIBRATION ERROR: the bin-weighted mean |confidence -
    accuracy| over the ten rank-percentile score bins — the single
    number behind agg_calibration_table's diagram (the metric every
    'is my model calibrated' gate thresholds).  Per-bin confidence and
    accuracy are half-up per-mille integers; the weighted absolute gap
    aggregates as exact integers and divides once."""
    load_tables(spark, sf_dir)
    # complete-case: NULL scores cannot be rank-binned (engines' default
    # NULL sort orders differ) — excluded on both sides
    e = spark.table("events").filter(F.col("value").isNotNull())
    scored = e.select(
        "event_id",
        F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "s"
        ),
        (F.col("event_type") == "purchase").cast("long").alias("y"),
    )
    ranked = global_row_number(scored, ["s", "event_id"], "rk")
    n_row = ranked.agg(F.count(F.lit(1)).alias("n"))
    binned = ranked.crossJoin(F.broadcast(n_row)).select(
        "y",
        "rk",
        "n",
        F.expr(f"(rk * {ECE_BINS} + n - 1) div n").alias("bin"),
    )
    g = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("nb"),
        F.sum("y").alias("pos"),
        F.sum("rk").alias("rks"),
        F.max("n").alias("n"),
    )
    per = g.select(
        "nb",
        "n",
        F.expr("(2 * 1000 * pos + nb) div (2 * nb)").alias("acc_pm"),
        F.expr("(2 * 1000 * rks + nb * n) div (2 * nb * n)").alias(
            "conf_pm"
        ),
    )
    return per.agg(
        F.max("n").alias("n_events"),
        (
            F.expr(
                "(2 * sum(nb * abs(acc_pm - conf_pm)) + max(n)) "
                "div (2 * max(n))"
            )
            / 1000.0
        ).alias("ece"),
    )


def q_dq_rules_engine(spark, sf_dir):
    """METADATA-DRIVEN validation: the rules live in a TABLE
    (rule_id, column, op, threshold), the engine cross-applies every
    rule to every row with one generic CASE dispatch, and reports per-
    rule violation counts — validation-as-data, so adding a rule is an
    INSERT, not a deploy (the dq_constraint_check keys hard-code their
    predicates; this one interprets them).

    Plan: orders x bounded literal rule table (auto-broadcast), one
    dispatch expression, one partial+final agg keyed by rule."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    rows = ", ".join(
        f"({rid}, '{col}', '{op}', {thr})" for rid, col, op, thr in RULES
    )
    rules = spark.sql(
        f"SELECT * FROM VALUES {rows} AS t(rule_id, col, op, thr)"
    )
    val = F.expr(
        "CASE col WHEN 'o_totalprice' THEN "
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) "
        "WHEN 'o_orderkey' THEN o_orderkey "
        "WHEN 'o_custkey' THEN o_custkey END"
    )
    ok = F.expr(
        "CASE op WHEN 'gt' THEN v > thr WHEN 'lt' THEN v < thr END"
    )
    j = o.crossJoin(rules).select(
        "rule_id", "col", "op", "thr", val.alias("v")
    )
    return (
        j.select("rule_id", "col", "op", ok.alias("ok"))
        .groupBy("rule_id", "col", "op")
        .agg(
            F.count(F.lit(1)).alias("n_checked"),
            F.sum((~F.col("ok")).cast("long")).alias("n_violations"),
        )
    )


def q_window_longest_streak(spark, sf_dir):
    """LONGEST STREAK analytics: the maximum run of consecutive
    up-revenue days, the longest down run, and the streak in force on
    the final day — gaps-and-islands pushed to its summary form (the
    'best run' number every momentum report quotes).  Run grouping is
    the classic day-index-minus-rank trick per direction, all exact
    integers on the bounded daily grain."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    daily = o.groupBy(
        F.expr("datediff(o_orderdate, DATE '1991-12-30')").alias("x")
    ).agg(
        (F.sum("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("c")
    )
    w = Window.orderBy("x")
    dirs = daily.select(
        "x",
        F.when(F.col("c") > F.lag("c").over(w), 1)
        .when(F.col("c") < F.lag("c").over(w), -1)
        .otherwise(0)
        .alias("d"),
        F.lag("x").over(w).alias("px"),
    ).filter(F.col("px").isNotNull()).drop("px")
    wd = Window.partitionBy("d").orderBy("x")
    runs = (
        dirs.withColumn("rn", F.row_number().over(wd))
        .groupBy("d", (F.col("x") - F.col("rn")).alias("grp"))
        .agg(F.count(F.lit(1)).alias("len"), F.max("x").alias("last_x"))
    )
    last = dirs.agg(F.max("x").alias("mx"))
    return (
        runs.crossJoin(F.broadcast(last))
        .groupBy()
        .agg(
            F.max(F.when(F.col("d") == 1, F.col("len"))).alias(
                "longest_up"
            ),
            F.max(F.when(F.col("d") == -1, F.col("len"))).alias(
                "longest_down"
            ),
            F.max(
                F.when(
                    F.col("last_x") == F.col("mx"),
                    F.col("d") * F.col("len"),
                )
            ).alias("current_streak"),
        )
    )


QUERIES = {
    "pipeline_interleave_order": q_pipeline_interleave_order,
    "agg_ece": q_agg_ece,
    "dq_rules_engine": q_dq_rules_engine,
    "window_longest_streak": q_window_longest_streak,
}

_RULE_ROWS = ", ".join(
    f"({rid}, '{col}', '{op}', {thr})" for rid, col, op, thr in RULES
)

ORACLES = {
    "pipeline_interleave_order": (
        "WITH r AS (SELECT doc_id, source, "
        "CAST(row_number() OVER (PARTITION BY source "
        "ORDER BY md5(doc_id::VARCHAR), doc_id) AS BIGINT) AS r "
        "FROM documents), "
        "sz AS (SELECT source, max(r) AS ns FROM r GROUP BY 1), "
        "t AS (SELECT sum(ns) AS n FROM sz), "
        "k AS (SELECT doc_id, r.source, r, "
        "(2 * r * n + ns) // (2 * ns) AS sched "
        "FROM r JOIN sz ON r.source = sz.source, t) "
        "SELECT CAST(sched AS BIGINT) AS sched, source, doc_id, r "
        f"FROM k ORDER BY sched, source, doc_id LIMIT {ILV_HEAD}"
    ),
    "agg_ece": (
        "WITH s AS (SELECT event_id, "
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS s, "
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y "
        "FROM events WHERE value IS NOT NULL), "
        "r AS (SELECT y, CAST(row_number() OVER (ORDER BY s, event_id) "
        "AS BIGINT) AS rk FROM s), n AS (SELECT count(*) AS n FROM s), "
        f"b AS (SELECT y, rk, n, (rk * {ECE_BINS} + n - 1) // n AS bin "
        "FROM r, n), "
        "g AS (SELECT bin, count(*) AS nb, sum(y) AS pos, "
        "sum(rk) AS rks, max(n) AS n FROM b GROUP BY 1), "
        "per AS (SELECT nb, n, "
        "(2 * 1000 * pos + nb) // (2 * nb) AS acc_pm, "
        "(2 * 1000 * rks + nb * n) // (2 * nb * n) AS conf_pm FROM g) "
        "SELECT CAST(max(n) AS BIGINT) AS n_events, "
        "CAST((2 * sum(nb * abs(acc_pm - conf_pm)) + max(n)) "
        "// (2 * max(n)) AS BIGINT) / 1000.0 AS ece FROM per"
    ),
    "dq_rules_engine": (
        f"WITH rules AS (SELECT * FROM (VALUES {_RULE_ROWS}) "
        "AS t(rule_id, col, op, thr)), "
        "j AS (SELECT rule_id, col, op, thr, "
        "CASE col WHEN 'o_totalprice' THEN "
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) "
        "WHEN 'o_orderkey' THEN o_orderkey "
        "WHEN 'o_custkey' THEN o_custkey END AS v "
        "FROM orders CROSS JOIN rules) "
        "SELECT CAST(rule_id AS INT) AS rule_id, col, op, "
        "CAST(count(*) AS BIGINT) AS n_checked, "
        "CAST(sum(CASE WHEN NOT (CASE op WHEN 'gt' THEN v > thr "
        "WHEN 'lt' THEN v < thr END) THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_violations FROM j GROUP BY 1, 2, 3"
    ),
    "window_longest_streak": (
        "WITH daily AS (SELECT "
        "date_diff('day', DATE '1991-12-30', o_orderdate) AS x, "
        "CAST(CAST(sum(o_totalprice) AS DECIMAL(18,2)) * 100 AS BIGINT) "
        "AS c FROM orders GROUP BY 1), "
        "dirs AS (SELECT x, CASE WHEN c > lag(c) OVER (ORDER BY x) THEN 1 "
        "WHEN c < lag(c) OVER (ORDER BY x) THEN -1 ELSE 0 END AS d, "
        "lag(x) OVER (ORDER BY x) AS px FROM daily), "
        "f AS (SELECT x, d FROM dirs WHERE px IS NOT NULL), "
        "runs AS (SELECT d, x - row_number() OVER (PARTITION BY d "
        "ORDER BY x) AS grp, x FROM f), "
        "rl AS (SELECT d, grp, count(*) AS len, max(x) AS last_x "
        "FROM runs GROUP BY 1, 2), "
        "mx AS (SELECT max(x) AS mx FROM f) "
        "SELECT CAST(max(CASE WHEN d = 1 THEN len END) AS BIGINT) "
        "AS longest_up, "
        "CAST(max(CASE WHEN d = -1 THEN len END) AS BIGINT) "
        "AS longest_down, "
        "CAST(max(CASE WHEN last_x = mx THEN d * len END) AS BIGINT) "
        "AS current_streak FROM rl, mx"
    ),
}
