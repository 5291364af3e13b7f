"""Round-6 additions, batch 47: underwater duration (how LONG the
series stays below its running peak — window_drawdown says how deep,
this says how painful) and the out-of-vocabulary rate (share of an
eval split's bigrams never seen in the train split — the leakage-aware
novelty metric a decontaminated eval set should score HIGH on).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..catalog import load_tables

#: OOV split: train = doc_id below this fraction per-mille of max id
OOV_SPLIT_PM = 800


def q_window_underwater_duration(spark, sf_dir):
    """UNDERWATER DURATION of daily revenue: the longest run of days
    spent strictly below the running peak, and the spell in force on
    the final day — window_drawdown measures depth, this measures TIME
    (the statistic that separates a sharp dip from a long grind).
    Running max over the bounded daily grain, underwater flags, then
    the gaps-and-islands run grouping — all exact integers."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    daily = o.groupBy(
        F.expr("datediff(o_orderdate, DATE '1991-12-30')").alias("x")
    ).agg(
        (F.sum("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("c")
    )
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    uw = daily.select(
        "x",
        (F.col("c") < F.max("c").over(w)).alias("under"),
    ).filter(F.col("under"))
    wr = Window.orderBy("x")
    runs = (
        uw.withColumn("rn", F.row_number().over(wr))
        .groupBy((F.col("x") - F.col("rn")).alias("grp"))
        .agg(F.count(F.lit(1)).alias("len"), F.max("x").alias("last_x"))
    )
    mx = daily.agg(F.max("x").alias("mx"))
    return (
        runs.crossJoin(F.broadcast(mx))
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n_spells"),
            F.max("len").alias("longest_underwater"),
            F.coalesce(
                F.max(
                    F.when(F.col("last_x") == F.col("mx"), F.col("len"))
                ),
                F.lit(0),
            ).alias("current_underwater"),
        )
    )


def q_text_oov_rate(spark, sf_dir):
    """OUT-OF-VOCABULARY rate of the eval split: for every eval document
    (top 20% of doc ids), the share of its word bigrams that NEVER
    occur in the train split — the novelty metric that complements
    pipeline_decontaminate (a well-decontaminated eval set scores high;
    near-zero means the split leaks).  One distinct train-bigram set,
    one left-anti-style flag join keyed by bigram, per-doc half-up
    per-mille — all co-partitioned by bigram then by doc."""
    load_tables(spark, sf_dir)
    d = spark.table("documents")
    cut = d.agg(
        F.expr(f"(max(doc_id) * {OOV_SPLIT_PM}) div 1000").alias("cut")
    )
    big = d.crossJoin(F.broadcast(cut)).select(
        "doc_id",
        (F.col("doc_id") > F.col("cut")).alias("is_eval"),
        F.explode(
            F.expr(
                "transform(sequence(1, size(split(text, ' ')) - 1), "
                "i -> concat_ws(' ', slice(split(text, ' '), i, 2)))"
            )
        ).alias("p"),
    )
    train_vocab = (
        big.filter(~F.col("is_eval")).select("p").distinct()
        .withColumn("seen", F.lit(1))
    )
    ev = big.filter(F.col("is_eval")).join(train_vocab, "p", "left")
    per_doc = ev.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum(F.when(F.col("seen").isNull(), 1).otherwise(0)).alias(
            "n_oov"
        ),
    )
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        "n_oov",
        F.expr("(2 * 1000 * n_oov + n_bigrams) div (2 * n_bigrams)").alias(
            "oov_pm"
        ),
    )


QUERIES = {
    "window_underwater_duration": q_window_underwater_duration,
    "text_oov_rate": q_text_oov_rate,
}

ORACLES = {
    "window_underwater_duration": (
        "WITH daily AS (SELECT "
        "date_diff('day', DATE '1991-12-30', o_orderdate) AS x, "
        "CAST(CAST(sum(o_totalprice) AS DECIMAL(18,2)) * 100 AS BIGINT) "
        "AS c FROM orders GROUP BY 1), "
        "uw AS (SELECT x FROM (SELECT x, c, max(c) OVER (ORDER BY x "
        "ROWS UNBOUNDED PRECEDING) AS pk FROM daily) WHERE c < pk), "
        "runs AS (SELECT x - row_number() OVER (ORDER BY x) AS grp, x "
        "FROM uw), "
        "rl AS (SELECT grp, count(*) AS len, max(x) AS last_x "
        "FROM runs GROUP BY 1), "
        "mx AS (SELECT max(x) AS mx FROM daily) "
        "SELECT CAST(count(*) AS BIGINT) AS n_spells, "
        "CAST(max(len) AS BIGINT) AS longest_underwater, "
        "CAST(coalesce(max(CASE WHEN last_x = mx THEN len END), 0) "
        "AS BIGINT) AS current_underwater FROM rl, mx"
    ),
    "text_oov_rate": (
        "WITH cut AS (SELECT (max(doc_id) * "
        f"{OOV_SPLIT_PM}) // 1000 AS cut FROM documents), "
        "big AS (SELECT doc_id, doc_id > cut AS is_eval, "
        "array_to_string(ws[i:i+1], ' ') AS p FROM "
        "(SELECT doc_id, string_split(text, ' ') AS ws FROM documents), "
        "cut, unnest(range(1, len(ws))) AS t(i)), "
        "tv AS (SELECT DISTINCT p FROM big WHERE NOT is_eval), "
        "ev AS (SELECT b.doc_id, b.p, tv.p IS NOT NULL AS seen "
        "FROM big b LEFT JOIN tv ON b.p = tv.p WHERE b.is_eval) "
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, "
        "CAST(sum(CASE WHEN NOT seen THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_oov, "
        "CAST((2 * 1000 * sum(CASE WHEN NOT seen THEN 1 ELSE 0 END) "
        "+ count(*)) // (2 * count(*)) AS BIGINT) AS oov_pm "
        "FROM ev GROUP BY 1"
    ),
}
