"""Round-6 additions, batch 10: marketing analytics — last-touch
attribution over the event stream and RFM customer segmentation.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..catalog import load_tables

ATTR_WINDOW_H = 24  #: attribution lookback (hours)


def q_window_attribution(spark, sf_dir):
    """Last-touch attribution: each purchase attributes to the user's
    most recent click within the prior 24 h, rolled up per day —
    purchases, attributed purchases, attributed revenue (exact cents)
    and the half-up per-mille attachment rate.  The carry-forward
    'latest click ts' is ONE per-user ordered window (max of a CASE
    over unbounded-preceding rows — no self-join, no range explosion);
    the 24 h test is a timestamp+interval comparison (NTZ-safe in both
    engines; exact µs semantics).  The standard
    conversion-credit query of every event pipeline."""
    load_tables(spark, sf_dir)
    e = spark.table("events").select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_click = F.max(
        F.when(F.col("event_type") == "click", F.col("ts"))
    ).over(w)
    marked = e.withColumn("last_click_ts", last_click).filter(
        F.col("event_type") == "purchase"
    )
    attributed = F.col("last_click_ts").isNotNull() & F.expr(
        f"ts <= last_click_ts + INTERVAL {ATTR_WINDOW_H} HOURS"
    )
    daily = marked.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(attributed.cast("long")).alias("n_attributed"),
        F.sum(F.when(attributed, F.col("cents")).otherwise(0)).alias("ac"),
    )
    return daily.select(
        "day",
        "n_purchases",
        "n_attributed",
        (F.col("ac") / 100.0).alias("attributed_revenue"),
        F.expr(
            "(2000 * n_attributed + n_purchases) div (2 * n_purchases)"
        ).alias("attach_pm"),
    )


def q_agg_rfm_segments(spark, sf_dir):
    """RFM segmentation: every customer scored 1-5 on Recency (days
    since last order, newest = 5), Frequency (order count) and Monetary
    (lifetime cents), each by the exact integer quintile rule over a
    distributed chunked-offset rank (ties -> customer key, so the cut
    is total-ordered and reproducible); output = the populated R-F-M
    cells with customer count and revenue share.  The classic CRM
    segmentation, built scale-first: three rank passes over the
    customer grain, no single-partition window."""
    from ..operators.ranking import global_row_number

    load_tables(spark, sf_dir)
    o = spark.table("orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_dt"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
        ).alias("cents"),
    )
    # recency in days vs the corpus max date (1-row broadcast)
    mx = per_cust.agg(F.max("last_dt").alias("mx"))
    scored = per_cust.crossJoin(F.broadcast(mx)).select(
        "o_custkey",
        "freq",
        "cents",
        F.datediff("mx", "last_dt").alias("rec_days"),
    )
    # three quintile ranks; "better" sorts last so quintile 5 = best:
    # recency ascends by -rec_days, frequency/monetary ascend naturally
    ranked = scored
    for metric, col in [
        ("r", -F.col("rec_days")),
        ("f", F.col("freq")),
        ("m", F.col("cents")),
    ]:
        ranked = global_row_number(
            ranked.withColumn("_metric", col), ["_metric", "o_custkey"],
            out_col="i",
        )
        n = ranked.agg(F.count(F.lit(1)).alias("n"))
        ranked = (
            ranked.crossJoin(F.broadcast(n))
            .withColumn(metric, F.expr("((i - 1) * 5) div n + 1"))
            .drop("_metric", "i", "n")
        )
    tot = ranked.agg(F.sum("cents").alias("tot"))
    cells = ranked.groupBy("r", "f", "m").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("cents").alias("cc"),
    )
    return cells.crossJoin(F.broadcast(tot)).select(
        F.concat_ws("-", "r", "f", "m").alias("rfm_cell"),
        "n_customers",
        (F.col("cc") / 100.0).alias("revenue"),
        F.round(F.col("cc") / F.col("tot").cast("double"), 6).alias(
            "rev_share"
        ),
    )


QUERIES = {
    "window_attribution": q_window_attribution,
    "agg_rfm_segments": q_agg_rfm_segments,
}

ORACLES = {
    "window_attribution": (
        "WITH e AS (SELECT user_id, event_id, event_type, ts, "
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents "
        "FROM events), "
        "marked AS (SELECT *, max(CASE WHEN event_type = 'click' THEN ts END) "
        "OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ts "
        "FROM e), "
        "p AS (SELECT strftime(ts, '%Y-%m-%d') AS day, cents, "
        "CASE WHEN last_click_ts IS NOT NULL AND "
        f"ts <= last_click_ts + INTERVAL {ATTR_WINDOW_H} HOUR "
        "THEN 1 ELSE 0 END AS attr FROM marked WHERE event_type = 'purchase'), "
        "d AS (SELECT day, count(*) AS n_purchases, "
        "CAST(sum(attr) AS BIGINT) AS n_attributed, "
        "CAST(sum(CASE WHEN attr = 1 THEN cents ELSE 0 END) AS BIGINT) AS ac "
        "FROM p GROUP BY 1) "
        "SELECT day, n_purchases, n_attributed, ac / 100.0 AS attributed_revenue, "
        "CAST((2000 * n_attributed + n_purchases) // (2 * n_purchases) "
        "AS BIGINT) AS attach_pm FROM d"
    ),
    "agg_rfm_segments": (
        "WITH pc AS (SELECT o_custkey, max(o_orderdate) AS last_dt, "
        "count(*) AS freq, "
        "sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS cents "
        "FROM orders GROUP BY 1), "
        "mx AS (SELECT max(last_dt) AS mx FROM pc), "
        "scored AS (SELECT o_custkey, freq, cents, "
        "datediff('day', last_dt, mx) AS rec_days FROM pc, mx), "
        "n AS (SELECT count(*) AS n FROM scored), "
        "ranked AS (SELECT o_custkey, freq, cents, "
        "row_number() OVER (ORDER BY -rec_days, o_custkey) AS ri, "
        "row_number() OVER (ORDER BY freq, o_custkey) AS fi, "
        "row_number() OVER (ORDER BY cents, o_custkey) AS mi FROM scored), "
        "quint AS (SELECT cents, ((ri - 1) * 5) // n + 1 AS r, "
        "((fi - 1) * 5) // n + 1 AS f, ((mi - 1) * 5) // n + 1 AS m "
        "FROM ranked, n), "
        "tot AS (SELECT sum(cents) AS tot FROM quint) "
        "SELECT CAST(r AS VARCHAR) || '-' || CAST(f AS VARCHAR) || '-' || "
        "CAST(m AS VARCHAR) AS rfm_cell, count(*) AS n_customers, "
        "CAST(sum(cents) AS BIGINT) / 100.0 AS revenue, "
        "round(CAST(sum(cents) AS BIGINT) / CAST(max(tot) AS DOUBLE), 6) "
        "AS rev_share FROM quint, tot GROUP BY 1"
    ),
}
