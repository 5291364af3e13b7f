"""Round-6 additions, batch 38: the MODEL-EVALUATION suite — ROC AUC
(via the exact rank-sum identity), a calibration/reliability table,
precision/recall@k, and NDCG@k — the four metrics every scored-model
pipeline reports, here with 'value' as the score and 'purchase' as the
label so each metric is a pure function of exact integers.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_tables
from ..operators.ranking import global_row_number, global_running_sum

#: ranking-eval cutoffs
PK_K = 500
NDCG_K = 20

#: calibration bins (score deciles)
CALIB_BINS = 10


def q_agg_auc_roc(spark, sf_dir):
    """ROC AUC of the value-predicts-purchase 'model' via the EXACT
    rank-sum identity AUC = (R1 - n1(n1+1)/2) / (n1*n0) — the
    probabilistic interpretation (chance a random positive outranks a
    random negative), which handles ties by average ranks with NO curve
    construction.  Rank arithmetic follows agg_mann_whitney: tie groups
    on the distinct-score spine contribute exact integers through the
    distributed chunked-offset prefix sum, and AUC is one double ratio
    of exact BIGINTs."""
    load_tables(spark, sf_dir)
    # complete-case: a NULL score cannot be ranked (and the engines'
    # default NULL sort orders differ — Spark ASC is NULLS FIRST, DuckDB
    # NULLS LAST); rows missing the metric are excluded on both sides
    e = spark.table("events").filter(F.col("value").isNotNull())
    scored = e.select(
        F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "s"
        ),
        (F.col("event_type") == "purchase").cast("long").alias("y"),
    )
    g = scored.groupBy("s").agg(
        F.sum("y").alias("c1"),
        F.count(F.lit(1)).alias("t"),
    )
    pref = global_running_sum(g, ["s"], ["t"])
    terms = pref.select(
        "c1",
        "t",
        (2 * F.col("cum_t") - F.col("t") + 1).alias("ab"),  # 2*avg rank
    )
    a = terms.agg(
        F.sum(F.col("c1") * F.col("ab")).alias("two_r1"),
        F.sum("c1").alias("n1"),
        F.sum(F.col("t") - F.col("c1")).alias("n0"),
    )
    # try_divide: AUC needs BOTH classes present (n1*n0 > 0) — on a
    # one-class degenerate input it is NULL on both engines
    auc = F.try_divide(
        (F.col("two_r1") - F.col("n1") * (F.col("n1") + 1)).cast("double"),
        2.0 * F.col("n1") * F.col("n0"),
    )
    return a.select("n1", "n0", F.round(auc, 6).alias("auc"))


def q_agg_calibration_table(spark, sf_dir):
    """CALIBRATION (reliability) table: bucket events into score
    deciles by exact rank, and compare each bucket's implied confidence
    (its mean score percentile) with the ACTUAL purchase rate — the
    diagram that says whether a score of 0.9 means 90%.  Decile
    membership is ceil(rank*10/n) on the distributed rank (exact order
    statistics, no approx percentiles); every per-bin number is a
    half-up integer quotient."""
    load_tables(spark, sf_dir)
    # complete-case: NULL scores cannot be ranked into deciles (and the
    # engines' default NULL orders differ) — excluded on both sides
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
        "s",
        "y",
        "rk",
        "n",
        F.expr(f"(rk * {CALIB_BINS} + n - 1) div n").alias("bin"),
    )
    g = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_bin"),
        F.sum("y").alias("n_pos"),
        F.sum("rk").alias("rk_sum"),
        F.max("n").alias("n"),
    )
    return g.select(
        "bin",
        "n_bin",
        "n_pos",
        F.expr("(2 * 1000 * n_pos + n_bin) div (2 * n_bin)").alias(
            "actual_rate_pm"
        ),
        # mean percentile of the bin: avg(rank)/n, half-up per-mille
        F.expr(
            "(2 * 1000 * rk_sum + n_bin * n) div (2 * n_bin * n)"
        ).alias("mean_score_pm"),
    )


def q_agg_precision_at_k(spark, sf_dir):
    """PRECISION@k and RECALL@k: take the k highest-scored events (exact
    distributed top-k under (score desc, id) — TakeOrdered, no global
    sort) and score them against the purchase label — the retrieval
    metrics for any ranked shortlist.  All counts exact integers;
    ratios are half-up per-mille quotients."""
    load_tables(spark, sf_dir)
    e = spark.table("events")
    scored = e.select(
        "event_id",
        F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "s"
        ),
        (F.col("event_type") == "purchase").cast("long").alias("y"),
    )
    topk = scored.orderBy(F.col("s").desc(), "event_id").limit(PK_K)
    hits = topk.agg(F.sum("y").alias("tp"))
    total = scored.agg(F.sum("y").alias("pos"))
    return hits.crossJoin(F.broadcast(total)).select(
        F.lit(PK_K).alias("k"),
        "tp",
        "pos",
        F.expr(f"(2 * 1000 * tp + {PK_K}) div (2 * {PK_K})").alias(
            "precision_pm"
        ),
        # zero-positives guard matches DuckDB (x // 0 is NULL): recall
        # over an input with no positive labels is undefined
        F.expr(
            "CASE WHEN pos = 0 THEN CAST(NULL AS BIGINT) "
            "ELSE (2 * 1000 * tp + pos) div (2 * pos) END"
        ).alias("recall_pm"),
    )


def q_agg_ndcg_at_k(spark, sf_dir):
    """NDCG@20 of the value ranking against the purchase label: DCG
    discounts each hit by 1/log2(position+1); the ideal DCG places all
    hits first.  The 20 discount weights enter as PYTHON-GENERATED
    literals (no in-engine log), the top-20 selection is the exact
    distributed TakeOrdered, and the 20-term sum folds in rank order so
    both engines stream identical doubles."""
    load_tables(spark, sf_dir)
    e = spark.table("events")
    scored = e.select(
        "event_id",
        F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "s"
        ),
        (F.col("event_type") == "purchase").cast("int").alias("y"),
    )
    topk = scored.orderBy(F.col("s").desc(), "event_id").limit(NDCG_K)
    import math

    w = [1.0 / math.log2(i + 2) for i in range(NDCG_K)]  # pos 1..k
    idcg = 0.0
    for x in w:
        idcg += x
    # sort key negates s so the array order is (s DESC, event_id ASC) —
    # reverse(array_sort(struct(s, id))) would flip the id tiebreak too
    arr = topk.agg(
        F.array_sort(
            F.collect_list(
                F.struct((-F.col("s")).alias("ns"), "event_id", "y")
            )
        ).alias("a")
    )
    case = " ".join(f"WHEN {i + 1} THEN {w[i]!r}" for i in range(NDCG_K))
    dcg = F.expr(
        "aggregate(sequence(1, size(a)), cast(0.0 as double), "
        f"(acc, i) -> acc + element_at(a, i).y * (CASE i {case} END))"
    )
    # no events -> no ranking to grade (also keeps sequence(1, size(a))
    # off its empty-array descending-[1,0] trap); oracle mirrors with
    # WHERE len(a) > 0
    return arr.filter(F.size("a") > 0).select(
        F.lit(NDCG_K).alias("k"),
        F.expr("aggregate(a, 0, (acc, x) -> acc + x.y)").alias("hits"),
        F.round(dcg, 6).alias("dcg"),
        F.round(dcg / idcg, 6).alias("ndcg"),
    )


QUERIES = {
    "agg_auc_roc": q_agg_auc_roc,
    "agg_calibration_table": q_agg_calibration_table,
    "agg_precision_at_k": q_agg_precision_at_k,
    "agg_ndcg_at_k": q_agg_ndcg_at_k,
}


def _ndcg_case() -> str:
    import math

    return " ".join(
        f"WHEN {i + 1} THEN {1.0 / math.log2(i + 2)!r}"
        for i in range(NDCG_K)
    )


def _ndcg_idcg() -> float:
    import math

    t = 0.0
    for i in range(NDCG_K):
        t += 1.0 / math.log2(i + 2)
    return t


ORACLES = {
    "agg_auc_roc": (
        "WITH s AS (SELECT "
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS s, "
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y "
        "FROM events WHERE value IS NOT NULL), "
        "g AS (SELECT s, sum(y) AS c1, count(*) AS t FROM s GROUP BY 1), "
        "p AS (SELECT c1, t, 2 * sum(t) OVER (ORDER BY s "
        "ROWS UNBOUNDED PRECEDING) - t + 1 AS ab FROM g), "
        "a AS (SELECT sum(c1 * ab) AS two_r1, sum(c1) AS n1, "
        "sum(t - c1) AS n0 FROM p) "
        "SELECT CAST(n1 AS BIGINT) AS n1, CAST(n0 AS BIGINT) AS n0, "
        "round(CAST(two_r1 - n1 * (n1 + 1) AS DOUBLE) "
        "/ (2.0 * n1 * n0), 6) AS auc FROM a"
    ),
    "agg_calibration_table": (
        "WITH s AS (SELECT event_id, "
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS s, "
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y "
        "FROM events WHERE value IS NOT NULL), "
        "r AS (SELECT s, y, CAST(row_number() OVER (ORDER BY s, event_id) "
        "AS BIGINT) AS rk FROM s), "
        "n AS (SELECT count(*) AS n FROM s), "
        f"b AS (SELECT y, rk, n, (rk * {CALIB_BINS} + n - 1) // n AS bin "
        "FROM r, n), "
        "g AS (SELECT bin, count(*) AS n_bin, sum(y) AS n_pos, "
        "sum(rk) AS rk_sum, max(n) AS n FROM b GROUP BY 1) "
        "SELECT CAST(bin AS BIGINT) AS bin, "
        "CAST(n_bin AS BIGINT) AS n_bin, CAST(n_pos AS BIGINT) AS n_pos, "
        "CAST((2 * 1000 * n_pos + n_bin) // (2 * n_bin) AS BIGINT) "
        "AS actual_rate_pm, "
        "CAST((2 * 1000 * rk_sum + n_bin * n) // (2 * n_bin * n) "
        "AS BIGINT) AS mean_score_pm FROM g"
    ),
    "agg_precision_at_k": (
        "WITH s AS (SELECT event_id, "
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS s, "
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y "
        "FROM events), "
        f"topk AS (SELECT y FROM s ORDER BY s DESC, event_id "
        f"LIMIT {PK_K}), "
        "h AS (SELECT CAST(sum(y) AS BIGINT) AS tp FROM topk), "
        "t AS (SELECT CAST(sum(y) AS BIGINT) AS pos FROM s) "
        f"SELECT {PK_K} AS k, tp, pos, "
        f"(2 * 1000 * tp + {PK_K}) // (2 * {PK_K}) AS precision_pm, "
        "(2 * 1000 * tp + pos) // (2 * pos) AS recall_pm FROM h, t"
    ),
    "agg_ndcg_at_k": (
        "WITH s AS (SELECT event_id, "
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS s, "
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y "
        "FROM events), "
        f"topk AS (SELECT s, event_id, y FROM s "
        f"ORDER BY s DESC, event_id LIMIT {NDCG_K}), "
        "arr AS (SELECT list({'s': s, 'event_id': event_id, 'y': y} "
        "ORDER BY s DESC, event_id) AS a FROM topk), "
        "d AS (SELECT a, list_reduce(list_prepend(0.0, "
        "list_transform(range(1, len(a) + 1), i -> "
        "a[CAST(i AS INT)].y * (CASE i " + _ndcg_case() + " END))), "
        "(acc, v) -> acc + v) AS dcg FROM arr) "
        f"SELECT {NDCG_K} AS k, "
        "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(a, x -> CAST(x.y AS BIGINT))), "
        "(acc, v) -> acc + v) AS INT) AS hits, "
        "round(dcg, 6) AS dcg, "
        f"round(dcg / {_ndcg_idcg()!r}, 6) AS ndcg FROM d "
        "WHERE len(a) > 0"
    ),
}
