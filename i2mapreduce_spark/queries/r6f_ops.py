"""Round-6 additions, batch 6: Aroon trend ages, floor-trader pivot
points, and a Jensen-Shannon drift profile over the corpus vocabulary.
Same float discipline as the rest of the repo (integer cents, half-up
integer quotients, one final double op on exact operands per value).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..catalog import load_tables

AROON_N = 25  #: Aroon lookback (100/25 = 4 keeps the pct exact-integer)


def q_window_aroon(spark, sf_dir):
    """Aroon up/down over the daily-revenue series: the AGE of the
    25-day high/low, aroon = 100·(N − days_since_extreme)/N — with
    N = 25 the percentage is the exact integer 4·(25 − age).  Extreme
    position = FIRST occurrence inside the ordered frame (both engines'
    array_position/list_position return the first match, so ties are
    deterministic and take the OLDEST day — the conservative age).
    Day-grain pre-aggregation bounds the frame input at any SF."""
    load_tables(spark, sf_dir)
    # complete-case: a day whose orders all lack a price is a series gap,
    # same as a day with no orders (collect_list would skip the NULL
    # where DuckDB's list() keeps it)
    o = spark.table("orders").filter(F.col("o_totalprice").isNotNull())
    daily = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day")
    ).agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
        ).alias("cents")
    )
    w = Window.orderBy("day").rowsBetween(-(AROON_N - 1), 0)
    framed = daily.select(
        "day",
        F.count(F.lit(1)).over(w).alias("n"),
        F.collect_list("cents").over(w).alias("xs"),
    ).filter(F.col("n") == AROON_N)
    # position is 1-based; the last element is the current day, so
    # days_since = N - position
    ds_hi = AROON_N - F.expr("array_position(xs, array_max(xs))")
    ds_lo = AROON_N - F.expr("array_position(xs, array_min(xs))")
    up = 4 * (AROON_N - ds_hi)
    dn = 4 * (AROON_N - ds_lo)
    return framed.select(
        "day",
        up.cast("long").alias("aroon_up"),
        dn.cast("long").alias("aroon_down"),
        F.when(up - dn > 50, "uptrend")
        .when(dn - up > 50, "downtrend")
        .otherwise("ranging")
        .alias("trend"),
    )


def q_window_pivot_points(spark, sf_dir):
    """Floor-trader pivot points from the PRIOR day's OHLC bar of the
    event-value stream: P = (H+L+C)/3 (half-up integer cents), R1 =
    2P−L, S1 = 2P−H, R2 = P+(H−L), S2 = P−(H−L), and today's close
    classified against the pivot by integer comparison.  OHLC via the
    ranked-window pick pattern (no float sums anywhere)."""
    load_tables(spark, sf_dir)
    e = spark.table("events").select(
        "event_id",
        "ts",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    wd = Window.partitionBy("day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    r = e.withColumn("rn_d", F.row_number().over(wd))
    bars = r.groupBy("day").agg(
        F.max("cents").alias("h"),
        F.min("cents").alias("l"),
        F.max(F.when(F.col("rn_d") == 1, F.col("cents"))).alias("c"),
    )
    w = Window.orderBy("day")
    prior = bars.select(
        "day",
        "c",
        F.lag("h").over(w).alias("ph"),
        F.lag("l").over(w).alias("pl"),
        F.lag("c").over(w).alias("pc"),
    ).filter(F.col("ph").isNotNull())
    p = F.expr("(2 * (ph + pl + pc) + 3) div 6")  # half-up /3 in cents
    return prior.select(
        "day",
        (F.col("c") / 100.0).alias("close_v"),
        (p / 100.0).alias("pivot"),
        ((2 * p - F.col("pl")) / 100.0).alias("r1"),
        ((2 * p - F.col("ph")) / 100.0).alias("s1"),
        ((p + F.col("ph") - F.col("pl")) / 100.0).alias("r2"),
        ((p - F.col("ph") + F.col("pl")) / 100.0).alias("s2"),
        F.when(F.col("c") > p, "above").when(F.col("c") < p, "below")
        .otherwise("at").alias("vs_pivot"),
    )


def q_text_js_divergence(spark, sf_dir):
    """Jensen-Shannon divergence cells between the even-doc and odd-doc
    corpus halves' word distributions — the text-drift detector.  Per
    vocabulary word: counts in each half, probabilities from exact
    integer (count, total) pairs, and the word's JS contribution
    ½·p·ln(p/m) + ½·q·ln(q/m) with m = (p+q)/2 and 0·ln0 = 0.  Per-cell
    output (the vocabulary is the bounded grain); summing would be an
    unordered float reduction — the cross-engine trap the repo never
    takes.  One partial+final agg over the token stream."""
    load_tables(spark, sf_dir)
    d = spark.table("documents")
    toks = d.select(
        (F.col("doc_id") % 2 == 0).alias("is_a"),
        F.explode(F.split(F.col("text"), " ")).alias("w"),
    ).filter(F.col("w") != "")
    cells = toks.groupBy("w").agg(
        F.sum(F.col("is_a").cast("long")).alias("ca"),
        F.sum((~F.col("is_a")).cast("long")).alias("cb"),
    )
    tot = cells.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    j = cells.crossJoin(F.broadcast(tot))  # 1-row totals
    # try_divide: a degenerate corpus can leave one side with zero
    # tokens (na/nb = 0) — its distribution is undefined, NULL on both
    # engines (DuckDB x/0 is NULL)
    p = F.try_divide("ca", F.col("na").cast("double"))
    q = F.try_divide("cb", F.col("nb").cast("double"))
    m = (p + q) / 2
    term_p = F.when(F.col("ca") > 0, p * F.log(p / m)).otherwise(F.lit(0.0))
    term_q = F.when(F.col("cb") > 0, q * F.log(q / m)).otherwise(F.lit(0.0))
    return j.select(
        "w",
        "ca",
        "cb",
        F.round(p, 6).alias("p_a"),
        F.round(q, 6).alias("p_b"),
        F.round((term_p + term_q) / 2, 6).alias("js_cell"),
    )


QUERIES = {
    "window_aroon": q_window_aroon,
    "window_pivot_points": q_window_pivot_points,
    "text_js_divergence": q_text_js_divergence,
}

ORACLES = {
    "window_aroon": (
        "WITH daily AS (SELECT strftime(o_orderdate, '%Y-%m-%d') AS day, "
        "sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS cents "
        "FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1), "
        "framed AS (SELECT day, count(*) OVER w AS n, list(cents) OVER w AS xs "
        f"FROM daily WINDOW w AS (ORDER BY day ROWS BETWEEN {AROON_N - 1} "
        "PRECEDING AND CURRENT ROW)), "
        f"aged AS (SELECT day, "
        f"{AROON_N} - list_position(xs, list_aggregate(xs, 'max')) AS ds_hi, "
        f"{AROON_N} - list_position(xs, list_aggregate(xs, 'min')) AS ds_lo "
        f"FROM framed WHERE n = {AROON_N}) "
        f"SELECT day, CAST(4 * ({AROON_N} - ds_hi) AS BIGINT) AS aroon_up, "
        f"CAST(4 * ({AROON_N} - ds_lo) AS BIGINT) AS aroon_down, "
        "CASE WHEN 4 * (ds_lo - ds_hi) > 50 THEN 'uptrend' "
        "WHEN 4 * (ds_hi - ds_lo) > 50 THEN 'downtrend' "
        "ELSE 'ranging' END AS trend FROM aged"
    ),
    "window_pivot_points": (
        "WITH e AS (SELECT event_id, ts, strftime(ts, '%Y-%m-%d') AS day, "
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents FROM events), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY day "
        "ORDER BY ts DESC, event_id DESC) AS rn_d FROM e), "
        "bars AS (SELECT day, max(cents) AS h, min(cents) AS l, "
        "max(CASE WHEN rn_d = 1 THEN cents END) AS c FROM r GROUP BY 1), "
        "prior AS (SELECT day, c, lag(h) OVER (ORDER BY day) AS ph, "
        "lag(l) OVER (ORDER BY day) AS pl, lag(c) OVER (ORDER BY day) AS pc "
        "FROM bars), "
        "pv AS (SELECT day, c, ph, pl, pc, "
        "(2 * (ph + pl + pc) + 3) // 6 AS p FROM prior WHERE ph IS NOT NULL) "
        "SELECT day, c / 100.0 AS close_v, p / 100.0 AS pivot, "
        "(2 * p - pl) / 100.0 AS r1, (2 * p - ph) / 100.0 AS s1, "
        "(p + ph - pl) / 100.0 AS r2, (p - ph + pl) / 100.0 AS s2, "
        "CASE WHEN c > p THEN 'above' WHEN c < p THEN 'below' ELSE 'at' END "
        "AS vs_pivot FROM pv"
    ),
    "text_js_divergence": (
        "WITH toks AS (SELECT doc_id % 2 = 0 AS is_a, "
        "unnest(string_split(text, ' ')) AS w FROM documents), "
        "cells AS (SELECT w, "
        "CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS ca, "
        "CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS cb "
        "FROM toks WHERE w <> '' GROUP BY 1), "
        "tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na, "
        "CAST(sum(cb) AS BIGINT) AS nb FROM cells), "
        "j AS (SELECT w, ca, cb, ca / CAST(na AS DOUBLE) AS p, "
        "cb / CAST(nb AS DOUBLE) AS q FROM cells, tot) "
        "SELECT w, ca, cb, round(p, 6) AS p_a, round(q, 6) AS p_b, "
        "round(((CASE WHEN ca > 0 THEN p * ln(p / ((p + q) / 2)) ELSE 0 END) + "
        "(CASE WHEN cb > 0 THEN q * ln(q / ((p + q) / 2)) ELSE 0 END)) / 2, 6) "
        "AS js_cell FROM j"
    ),
}
