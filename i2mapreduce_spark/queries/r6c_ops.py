"""Round-6 additions, batch 3: technical-analysis accumulation windows
(OBV, stochastic oscillator, ATR) and time-series anomaly primitives
(peak detection, burst days).  Float discipline as everywhere: exact
integer/DECIMAL arithmetic end-to-end; divisions either half-up integer
quotients ((2p+q) div 2q) or a single final double cast of exact
operands; threshold comparisons cross-multiplied in integers.

Scale notes: every ordered single-partition window here runs AFTER
pre-aggregation to day grain — orders span 2,399 distinct days and
events 30 days at EVERY SF (the fixture widens rows-per-day, not the
calendar), so the window input is bounded ~2.4k rows no matter the data
size; the fact-table scans underneath are ordinary partial+final aggs.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..catalog import load_tables

# =================================================================
# Group W — accumulation / volatility windows
# =================================================================

STOCH_N = 14   #: %K lookback (days)
STOCH_D = 3    #: %D smoothing (days)
ATR_N = 14     #: ATR smoothing (days)


def _daily_cents_vol(spark):
    """Order-date grain: revenue in exact integer cents + order count."""
    o = spark.table("orders")
    return o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day")
    ).agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
        ).alias("cents"),
        F.count(F.lit(1)).alias("vol"),
    )


def q_window_obv(spark, sf_dir):
    """On-balance volume over the daily order series: OBV accumulates
    the day's order count with the SIGN of the day-over-day revenue
    change (up-day adds volume, down-day subtracts, flat adds nothing;
    day 1 contributes nothing by convention).  The classic
    volume-confirms-price indicator — and a pure-integer pipeline: lag,
    sign, signed volume, running sum, no float anywhere until the
    revenue display cast."""
    load_tables(spark, sf_dir)
    daily = _daily_cents_vol(spark)
    w = Window.orderBy("day")
    lagged = daily.select(
        "day",
        "cents",
        "vol",
        F.lag("cents").over(w).alias("prev"),
    )
    signed = lagged.select(
        "day",
        "cents",
        "vol",
        F.when(F.col("prev").isNull(), F.lit(0))
        .when(F.col("cents") > F.col("prev"), F.col("vol"))
        .when(F.col("cents") < F.col("prev"), -F.col("vol"))
        .otherwise(F.lit(0))
        .alias("signed_vol"),
    )
    wc = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return signed.select(
        "day",
        (F.col("cents") / 100.0).alias("revenue"),
        "vol",
        F.sum("signed_vol").over(wc).alias("obv"),
    )


def q_window_stochastic(spark, sf_dir):
    """Stochastic oscillator %K/%D over daily revenue: %K locates today's
    close inside the 14-day high-low range, %D is its 3-day SMA, zones
    classify overbought (>80) / oversold (<20).  Both percentages live
    as HALF-UP PER-MILLE INTEGERS — k_pm = (2000·(c−lo) + (hi−lo)) div
    (2·(hi−lo)) and d_pm = (2·Σk + 3) div 6 — because a float
    (c−lo)/(hi−lo) can land exactly on a rounding tie and flip per
    engine; all operands here are non-negative so Spark `div` and
    DuckDB `//` agree.  Degenerate flat ranges (hi = lo) pin %K at 500
    by convention."""
    load_tables(spark, sf_dir)
    daily = _daily_cents_vol(spark)
    w = Window.orderBy("day").rowsBetween(-(STOCH_N - 1), 0)
    framed = daily.select(
        "day",
        "cents",
        F.count(F.lit(1)).over(w).alias("n"),
        F.max("cents").over(w).alias("hi"),
        F.min("cents").over(w).alias("lo"),
    ).filter(F.col("n") == STOCH_N)
    rng = F.col("hi") - F.col("lo")
    k_pm = F.when(rng == 0, F.lit(500)).otherwise(
        F.expr("(2000 * (cents - lo) + (hi - lo)) div (2 * (hi - lo))")
    )
    kd = framed.select("day", k_pm.alias("k_pm"))
    w2 = Window.orderBy("day").rowsBetween(-(STOCH_D - 1), 0)
    smoothed = kd.select(
        "day",
        "k_pm",
        F.count(F.lit(1)).over(w2).alias("n2"),
        F.sum("k_pm").over(w2).alias("ks"),
    ).filter(F.col("n2") == STOCH_D)
    d_pm = F.expr(f"(2 * ks + {STOCH_D}) div {2 * STOCH_D}")
    return smoothed.select(
        "day",
        (F.col("k_pm") / 10.0).alias("k_pct"),
        (d_pm / 10.0).alias("d_pct"),
        F.when(F.col("k_pm") > 800, "overbought")
        .when(F.col("k_pm") < 200, "oversold")
        .otherwise("neutral")
        .alias("zone"),
    )


def q_window_atr(spark, sf_dir):
    """Average True Range over daily OHLC bars of the event-value
    stream: TR = greatest(h−l, |h−prev_close|, |l−prev_close|) (first
    day falls back to h−l), ATR = 14-day half-up SMA of TR — the
    volatility yardstick behind position sizing.  OHLC comes from the
    ranked-window pick pattern (never a float sum): open/close are the
    first/last value in (ts, event_id) order, extremes are min/max;
    values are exact 2-dp so integer cents are lossless.  All TR/ATR
    arithmetic is integer; the one `div` has non-negative operands."""
    load_tables(spark, sf_dir)
    e = spark.table("events").select(
        "event_id",
        "ts",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    wa = Window.partitionBy("day").orderBy("ts", "event_id")
    wd = Window.partitionBy("day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    r = e.withColumn("rn_a", F.row_number().over(wa)).withColumn(
        "rn_d", F.row_number().over(wd)
    )
    bars = r.groupBy("day").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("cents"))).alias("open_c"),
        F.max("cents").alias("high_c"),
        F.min("cents").alias("low_c"),
        F.max(F.when(F.col("rn_d") == 1, F.col("cents"))).alias("close_c"),
    )
    w = Window.orderBy("day")
    pc = F.lag("close_c").over(w)
    tr = F.when(
        pc.isNull(), F.col("high_c") - F.col("low_c")
    ).otherwise(
        F.greatest(
            F.col("high_c") - F.col("low_c"),
            F.abs(F.col("high_c") - pc),
            F.abs(F.col("low_c") - pc),
        )
    )
    trd = bars.select("day", "close_c", tr.alias("tr_c"))
    wn = Window.orderBy("day").rowsBetween(-(ATR_N - 1), 0)
    framed = trd.select(
        "day",
        "close_c",
        "tr_c",
        F.count(F.lit(1)).over(wn).alias("n"),
        F.sum("tr_c").over(wn).alias("trs"),
    ).filter(F.col("n") == ATR_N)
    atr_c = F.expr(f"(2 * trs + {ATR_N}) div {2 * ATR_N}")
    return framed.select(
        "day",
        (F.col("close_c") / 100.0).alias("close_v"),
        (F.col("tr_c") / 100.0).alias("true_range"),
        (atr_c / 100.0).alias("atr"),
    )


# =================================================================
# Group T — anomaly primitives
# =================================================================


def q_ts_peak_detection(spark, sf_dir):
    """Local-maximum days per event type in the daily count series: a
    peak strictly exceeds BOTH neighbors; prominence = count − the
    higher neighbor.  The spike-finder under every alerting rule — and
    all-integer (counts, lags, subtraction), so hash-exact trivially.
    Series edges (missing a neighbor) are excluded by definition."""
    load_tables(spark, sf_dir)
    e = spark.table("events")
    d = e.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("event_type").orderBy("day")
    nb = d.select(
        "event_type",
        "day",
        "cnt",
        F.lag("cnt").over(w).alias("pv"),
        F.lead("cnt").over(w).alias("nx"),
    )
    return nb.filter(
        F.col("pv").isNotNull()
        & F.col("nx").isNotNull()
        & (F.col("cnt") > F.col("pv"))
        & (F.col("cnt") > F.col("nx"))
    ).select(
        "event_type",
        "day",
        "cnt",
        (F.col("cnt") - F.greatest("pv", "nx")).alias("prominence"),
    )


def q_ts_burst_days(spark, sf_dir):
    """Burst days per event type: daily counts more than 1.5 population
    σ above that type's mean, decided ENTIRELY in integers via the
    identity  x > μ + 1.5σ  ⟺  t := n·x − S > 0  ∧  4·t² > 9·(n·SS − S²)
    (n days, S = Σcnt, SS = Σcnt²) — no sqrt, no float, no knife edge.
    The reported z-score is one final double division of those exact
    integers.  The burst detector behind rate-anomaly alerts."""
    load_tables(spark, sf_dir)
    e = spark.table("events")
    d = e.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    m = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cnt").alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("ss"),
    )
    j = d.join(F.broadcast(m), "event_type")  # bounded: one row per type
    t = F.col("n") * F.col("cnt") - F.col("s")
    den = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    return (
        j.filter((t > 0) & (4 * t * t > 9 * den))
        .select(
            "event_type",
            "day",
            "cnt",
            F.round(t / F.sqrt(den.cast("double")), 6).alias("z"),
        )
    )


QUERIES = {
    "window_obv": q_window_obv,
    "window_stochastic": q_window_stochastic,
    "window_atr": q_window_atr,
    "ts_peak_detection": q_ts_peak_detection,
    "ts_burst_days": q_ts_burst_days,
}

ORACLES = {
    "window_obv": (
        "WITH daily AS (SELECT strftime(o_orderdate, '%Y-%m-%d') AS day, "
        "sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS cents, "
        "count(*) AS vol FROM orders GROUP BY 1), "
        "lagged AS (SELECT day, cents, vol, "
        "lag(cents) OVER (ORDER BY day) AS prev FROM daily), "
        "signed AS (SELECT day, cents, vol, "
        "CASE WHEN prev IS NULL THEN 0 WHEN cents > prev THEN vol "
        "WHEN cents < prev THEN -vol ELSE 0 END AS signed_vol FROM lagged) "
        "SELECT day, cents / 100.0 AS revenue, vol, "
        "CAST(sum(signed_vol) OVER (ORDER BY day) AS BIGINT) AS obv FROM signed"
    ),
    "window_stochastic": (
        "WITH daily AS (SELECT strftime(o_orderdate, '%Y-%m-%d') AS day, "
        "sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS cents "
        "FROM orders GROUP BY 1), "
        "framed AS (SELECT day, cents, count(*) OVER w AS n, "
        "max(cents) OVER w AS hi, min(cents) OVER w AS lo FROM daily "
        f"WINDOW w AS (ORDER BY day ROWS BETWEEN {STOCH_N - 1} PRECEDING "
        "AND CURRENT ROW)), "
        "kd AS (SELECT day, CASE WHEN hi = lo THEN 500 ELSE "
        "(2000 * (cents - lo) + (hi - lo)) // (2 * (hi - lo)) END AS k_pm "
        f"FROM framed WHERE n = {STOCH_N}), "
        "sm AS (SELECT day, k_pm, count(*) OVER w2 AS n2, "
        "sum(k_pm) OVER w2 AS ks FROM kd "
        f"WINDOW w2 AS (ORDER BY day ROWS BETWEEN {STOCH_D - 1} PRECEDING "
        "AND CURRENT ROW)) "
        "SELECT day, k_pm / 10.0 AS k_pct, "
        f"((2 * ks + {STOCH_D}) // {2 * STOCH_D}) / 10.0 AS d_pct, "
        "CASE WHEN k_pm > 800 THEN 'overbought' WHEN k_pm < 200 "
        f"THEN 'oversold' ELSE 'neutral' END AS zone FROM sm WHERE n2 = {STOCH_D}"
    ),
    "window_atr": (
        "WITH e AS (SELECT event_id, ts, strftime(ts, '%Y-%m-%d') AS day, "
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents FROM events), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY day ORDER BY ts, event_id) AS rn_a, "
        "row_number() OVER (PARTITION BY day ORDER BY ts DESC, event_id DESC) AS rn_d FROM e), "
        "bars AS (SELECT day, max(CASE WHEN rn_a = 1 THEN cents END) AS open_c, "
        "max(cents) AS high_c, min(cents) AS low_c, "
        "max(CASE WHEN rn_d = 1 THEN cents END) AS close_c FROM r GROUP BY 1), "
        "trd AS (SELECT day, close_c, CASE WHEN lag(close_c) OVER (ORDER BY day) IS NULL "
        "THEN high_c - low_c ELSE greatest(high_c - low_c, "
        "abs(high_c - lag(close_c) OVER (ORDER BY day)), "
        "abs(low_c - lag(close_c) OVER (ORDER BY day))) END AS tr_c FROM bars), "
        "framed AS (SELECT day, close_c, tr_c, count(*) OVER w AS n, "
        "sum(tr_c) OVER w AS trs FROM trd "
        f"WINDOW w AS (ORDER BY day ROWS BETWEEN {ATR_N - 1} PRECEDING "
        "AND CURRENT ROW)) "
        "SELECT day, close_c / 100.0 AS close_v, tr_c / 100.0 AS true_range, "
        f"((2 * trs + {ATR_N}) // {2 * ATR_N}) / 100.0 AS atr "
        f"FROM framed WHERE n = {ATR_N}"
    ),
    "ts_peak_detection": (
        "WITH d AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, "
        "count(*) AS cnt FROM events GROUP BY 1, 2), "
        "nb AS (SELECT event_type, day, cnt, "
        "lag(cnt) OVER (PARTITION BY event_type ORDER BY day) AS pv, "
        "lead(cnt) OVER (PARTITION BY event_type ORDER BY day) AS nx FROM d) "
        "SELECT event_type, day, cnt, cnt - greatest(pv, nx) AS prominence "
        "FROM nb WHERE pv IS NOT NULL AND nx IS NOT NULL "
        "AND cnt > pv AND cnt > nx"
    ),
    "ts_burst_days": (
        "WITH d AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, "
        "count(*) AS cnt FROM events GROUP BY 1, 2), "
        "m AS (SELECT event_type, count(*) AS n, sum(cnt) AS s, "
        "sum(cnt * cnt) AS ss FROM d GROUP BY 1) "
        "SELECT d.event_type, d.day, d.cnt, "
        "round((m.n * d.cnt - m.s) / sqrt(CAST(m.n * m.ss - m.s * m.s AS DOUBLE)), 6) AS z "
        "FROM d JOIN m ON d.event_type = m.event_type "
        "WHERE m.n * d.cnt - m.s > 0 "
        "AND 4 * (m.n * d.cnt - m.s) * (m.n * d.cnt - m.s) > 9 * (m.n * m.ss - m.s * m.s)"
    ),
}
