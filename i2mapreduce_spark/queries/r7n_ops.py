"""Round-6 additions, batch 40: Matthews correlation (the balanced
single-number classifier score), the Brier score (probabilistic
forecast quality — calibration + resolution in one number), Fleiss'
kappa (MULTI-rater agreement, where Cohen's handles only two), and a
JSON-array document source (one file = one big array, the API-dump
shape that line-oriented JSONL readers cannot ingest).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_tables
from ..operators.ranking import global_row_number

#: classifier threshold (value cents) for the 2x2 confusion
MCC_CUTOFF = 30000


def q_agg_matthews_corr(spark, sf_dir):
    """Matthews correlation coefficient of the threshold classifier
    'value > 300 predicts purchase': MCC = (TP*TN - FP*FN) /
    sqrt((TP+FP)(TP+FN)(TN+FP)(TN+FN)) — the single-number score that,
    unlike accuracy or F1, stays honest on imbalanced labels.  The
    confusion quadrants are exact integers from ONE agg; the products
    run in DECIMAL(38)/HUGEINT (four ~1e5 counts multiply past BIGINT
    at sf1) and collapse to one double ratio."""
    load_tables(spark, sf_dir)
    # complete-case: an unscored row (NULL value) is neither a positive
    # nor a negative prediction — excluded on both sides (Spark's
    # boolean-cast would make it NULL, SQL's CASE-ELSE would make it 0:
    # the engines disagree unless the row is out)
    e = spark.table("events").filter(F.col("value").isNotNull())
    lab = e.select(
        (
            F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
            > MCC_CUTOFF
        )
        .cast("long")
        .alias("p"),
        (F.col("event_type") == "purchase").cast("long").alias("y"),
    )
    c = lab.agg(
        F.sum(F.expr("p * y")).alias("tp"),
        F.sum(F.expr("p * (1 - y)")).alias("fp"),
        F.sum(F.expr("(1 - p) * y")).alias("fn"),
        F.sum(F.expr("(1 - p) * (1 - y)")).alias("tn"),
    )
    num = F.expr(
        "CAST(tp AS DECIMAL(38,0)) * tn - CAST(fp AS DECIMAL(38,0)) * fn"
    ).cast("double")
    den = F.sqrt(
        F.expr(
            "CAST((tp + fp) AS DECIMAL(38,0)) * (tp + fn) * (tn + fp) "
            "* (tn + fn)"
        ).cast("double")
    )
    # try_divide: MCC is undefined when any margin is empty (den = 0) —
    # NULL on both engines (DuckDB x/0 is NULL)
    return c.select(
        "tp", "fp", "fn", "tn", F.round(F.try_divide(num, den), 6).alias("mcc")
    )


def q_agg_brier_score(spark, sf_dir):
    """BRIER SCORE of the rank-percentile 'probability' that an event is
    a purchase: mean((p - y)^2) — the proper scoring rule that rewards
    calibration AND sharpness (agg_calibration_table shows the diagram;
    this is its number).  p is the exact rank percentile quantized to
    half-up per-mille, so every squared term is an exact integer and
    the score is ONE half-up quotient of exact sums — no float mean."""
    load_tables(spark, sf_dir)
    # complete-case: NULL scores cannot be rank-percentiled (engines'
    # default NULL sort orders differ) — excluded on both sides
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
    t = ranked.crossJoin(F.broadcast(n_row)).select(
        "y",
        F.expr("(2 * 1000 * rk + n) div (2 * n)").alias("p3"),
    )
    # term = (p3 - 1000*y)^2 in per-mille^2, exact integers
    g = t.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            (F.col("p3") - 1000 * F.col("y"))
            * (F.col("p3") - 1000 * F.col("y"))
        ).alias("ss"),
    )
    return g.select(
        "n_events",
        (
            F.expr("(2 * ss + n_events) div (2 * n_events)") / 1000000.0
        ).alias("brier"),
    )


def q_agg_fleiss_kappa(spark, sf_dir):
    """FLEISS' KAPPA across THREE deterministic raters labeling each
    document long-form (chars > 300 / tokens > 50 / distinct words >
    28) — multi-rater chance-corrected agreement, which Cohen's kappa
    (two raters) cannot express.  With n=3 raters and 2 categories,
    P_i per item is (c*(c-1) + (3-c)*(2-c)) / 6 with c = positive
    votes — exact sixths, so P_bar and P_e come from exact integer
    sums and kappa is one fixed-shape double."""
    load_tables(spark, sf_dir)
    # complete-case: raters cannot label a missing document
    d = spark.table("documents").filter(F.col("text").isNotNull())
    votes = d.select(
        (
            (F.col("n_chars") > 300).cast("long")
            + (F.size(F.split("text", " ")) > 50).cast("long")
            + (F.size(F.array_distinct(F.split("text", " "))) > 28).cast(
                "long"
            )
        ).alias("c")
    )
    g = votes.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("pos_votes"),
        # 6 * sum(P_i): agreement pairs among 3 raters, exact integers
        F.sum(
            F.col("c") * (F.col("c") - 1)
            + (3 - F.col("c")) * (2 - F.col("c"))
        ).alias("agree6"),
    )
    n = F.col("n").cast("double")
    p_bar = F.col("agree6") / (6.0 * n)
    p_pos = F.col("pos_votes") / (3.0 * n)
    p_e = p_pos * p_pos + (1 - p_pos) * (1 - p_pos)
    return g.select(
        "n",
        "pos_votes",
        F.round(p_bar, 6).alias("p_bar"),
        F.round(p_e, 6).alias("p_expected"),
        # try_divide: unanimous chance agreement (p_e = 1) leaves kappa
        # undefined — NULL on both engines (DuckDB x/0 is NULL)
        F.round(F.try_divide(p_bar - p_e, 1 - p_e), 6).alias("fleiss_kappa"),
    )


def q_source_json_array(spark, sf_dir):
    """JSON-ARRAY source: the whole nation table serialized as ONE json
    array in ONE file (the API-dump / config shape), read back with
    wholetext + from_json(array<struct>) + explode — the ingestion path
    JSONL line readers cannot handle because no row boundary aligns
    with a line.  Roundtrips the bounded table exactly; the oracle is
    the base table."""
    from .scans import _scratch_dir

    load_tables(spark, sf_dir)
    n = spark.table("nation")
    payload = n.agg(
        F.concat(
            F.lit("["),
            F.concat_ws(
                ",",
                F.array_sort(
                    F.collect_list(
                        F.to_json(
                            F.struct("n_nationkey", "n_name", "n_regionkey")
                        )
                    )
                ),
            ),
            F.lit("]"),
        ).alias("value")
    )
    out = _scratch_dir("i2mr_jsonarr_") + "/nation"
    payload.coalesce(1).write.mode("overwrite").text(out)
    raw = spark.read.option("wholetext", True).text(out)
    schema = (
        "array<struct<n_nationkey: int, n_name: string, n_regionkey: int>>"
    )
    return (
        raw.select(
            F.explode(F.from_json("value", schema)).alias("r")
        )
        .select(
            F.col("r")["n_nationkey"].alias("n_nationkey"),
            F.col("r")["n_name"].alias("n_name"),
            F.col("r")["n_regionkey"].alias("n_regionkey"),
        )
    )


QUERIES = {
    "agg_matthews_corr": q_agg_matthews_corr,
    "agg_brier_score": q_agg_brier_score,
    "agg_fleiss_kappa": q_agg_fleiss_kappa,
    "source_json_array": q_source_json_array,
}

ORACLES = {
    "agg_matthews_corr": (
        "WITH lab AS (SELECT CASE WHEN "
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) > "
        f"{MCC_CUTOFF} THEN 1 ELSE 0 END AS p, "
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y "
        "FROM events WHERE value IS NOT NULL), "
        "c AS (SELECT CAST(sum(p * y) AS BIGINT) AS tp, "
        "CAST(sum(p * (1 - y)) AS BIGINT) AS fp, "
        "CAST(sum((1 - p) * y) AS BIGINT) AS fn, "
        "CAST(sum((1 - p) * (1 - y)) AS BIGINT) AS tn FROM lab) "
        "SELECT tp, fp, fn, tn, "
        "round(CAST(CAST(tp AS HUGEINT) * tn "
        "- CAST(fp AS HUGEINT) * fn AS DOUBLE) "
        "/ sqrt(CAST(CAST(tp + fp AS HUGEINT) * (tp + fn) * (tn + fp) "
        "* (tn + fn) AS DOUBLE)), 6) AS mcc FROM c"
    ),
    "agg_brier_score": (
        "WITH s AS (SELECT event_id, "
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS s, "
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y "
        "FROM events WHERE value IS NOT NULL), "
        "r AS (SELECT y, CAST(row_number() OVER (ORDER BY s, event_id) "
        "AS BIGINT) AS rk FROM s), "
        "n AS (SELECT count(*) AS n FROM s), "
        "t AS (SELECT y, (2 * 1000 * rk + n) // (2 * n) AS p3 FROM r, n), "
        "g AS (SELECT count(*) AS n_events, "
        "sum((p3 - 1000 * y) * (p3 - 1000 * y)) AS ss FROM t) "
        "SELECT CAST(n_events AS BIGINT) AS n_events, "
        "CAST((2 * ss + n_events) // (2 * n_events) AS BIGINT) "
        "/ 1000000.0 AS brier FROM g"
    ),
    "agg_fleiss_kappa": (
        "WITH v AS (SELECT "
        "(CASE WHEN n_chars > 300 THEN 1 ELSE 0 END) "
        "+ (CASE WHEN len(string_split(text, ' ')) > 50 THEN 1 ELSE 0 END) "
        "+ (CASE WHEN len(list_distinct(string_split(text, ' '))) > 28 "
        "THEN 1 ELSE 0 END) AS c FROM documents "
        "WHERE text IS NOT NULL), "
        "g AS (SELECT count(*) AS n, sum(c) AS pos_votes, "
        "sum(c * (c - 1) + (3 - c) * (2 - c)) AS agree6 FROM v) "
        "SELECT CAST(n AS BIGINT) AS n, "
        "CAST(pos_votes AS BIGINT) AS pos_votes, "
        "round(agree6 / (6.0 * n), 6) AS p_bar, "
        "round((pos_votes / (3.0 * n)) * (pos_votes / (3.0 * n)) "
        "+ (1 - pos_votes / (3.0 * n)) * (1 - pos_votes / (3.0 * n)), 6) "
        "AS p_expected, "
        "round((agree6 / (6.0 * n) "
        "- ((pos_votes / (3.0 * n)) * (pos_votes / (3.0 * n)) "
        "+ (1 - pos_votes / (3.0 * n)) * (1 - pos_votes / (3.0 * n)))) "
        "/ (1 - ((pos_votes / (3.0 * n)) * (pos_votes / (3.0 * n)) "
        "+ (1 - pos_votes / (3.0 * n)) * (1 - pos_votes / (3.0 * n)))), 6) "
        "AS fleiss_kappa FROM g"
    ),
    "source_json_array": (
        "SELECT CAST(n_nationkey AS INT) AS n_nationkey, n_name, "
        "CAST(n_regionkey AS INT) AS n_regionkey FROM nation"
    ),
}
