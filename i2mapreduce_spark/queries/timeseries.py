"""Group T — time-series analytics over the events stream: gap-filling
resample with linear interpolation, rolling z-score anomaly detection,
and a moving median.

These are the standard observability / sensor-pipeline primitives the
reference's windowed aggregates feed into.  All three hash-check
against DuckDB (the z-score and median at 4 dp with the ±0.0 guard).

Scale notes: the per-user rolling windows partition by user_id (fully
parallel); the interpolation's ordered pass runs over the *daily
aggregate* (one row per day — thousands of rows even for years of
data), so its single-partition window costs nothing while the heavy
per-event aggregation underneath is a normal distributed groupBy.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..catalog import load_tables

#: rolling frame length for the z-score (full windows only — stable stats)
ZS_LOOKBACK = 10
#: |z| above which a point is flagged
ZS_THRESH = 2.0
#: moving-median frame: current row + 4 preceding
MED_FRAME = 4
#: drop days where day-of-month % 3 == 0 to manufacture resample gaps
GAP_MOD = 3


def q_window_anomaly_zscore(spark, sf_dir):
    """Rolling z-score anomaly flags: for each event, z = (value - mean)
    / stddev over the user's previous 10 events (current row EXCLUDED —
    the detector may not see the point it scores).  Only full lookback
    windows are scored.  Output: one row per scored event with z at 4 dp
    (±0.0-normalized) and the |z| > 2 flag.

    Plan: one hash-partitioned sort per user (Window.partitionBy), all
    JVM expressions; no self-join — the frame is a running aggregate."""
    load_tables(spark, sf_dir)
    ev = spark.table("events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-ZS_LOOKBACK, -1)
    )
    mean, sd = F.avg("value").over(w), F.stddev_samp("value").over(w)
    # explicit sd > 0 guard: constant history means an undefined z-score,
    # and under ANSI mode (Spark 4 default) a bare division would THROW
    # at runtime on such a window rather than yield NULL
    z_raw = F.when(sd > 0, (F.col("value") - mean) / sd)
    scored = ev.select(
        "user_id",
        "event_id",
        F.round("value", 4).alias("value"),
        F.count("value").over(w).alias("_n"),
        z_raw.alias("_z"),
    ).filter((F.col("_n") == ZS_LOOKBACK) & F.col("_z").isNotNull())
    z = F.round("_z", 4) + F.lit(0.0)  # IEEE: -0.0 + 0.0 = +0.0
    return scored.select(
        "user_id",
        "event_id",
        "value",
        z.alias("zscore"),
        (F.abs("_z") > ZS_THRESH).alias("is_anomaly"),
    )


def q_window_moving_median(spark, sf_dir):
    """Moving median of event value over each user's last 5 events
    (4 preceding + current), interpolated for even frame sizes exactly
    as DuckDB's windowed median: mean of the two middle order statistics.

    Spark has no percentile-over-frame, so the frame is materialized as
    a sorted array (bounded: ≤5 elements) and the median read from it —
    constant memory per row, no shuffle beyond the per-user sort."""
    load_tables(spark, sf_dir)
    ev = spark.table("events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-MED_FRAME, 0)
    )
    arr = F.array_sort(F.collect_list("value").over(w))
    n = F.size(arr)
    lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
    hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    # collect_list drops NULL values, exactly like DuckDB's windowed
    # median; an all-NULL frame (n = 0) has no median — the CASE also
    # keeps element_at off the invalid index 0
    med = F.when(n > 0, F.round((lo + hi) / 2.0, 4))
    return ev.select(
        "user_id",
        "event_id",
        F.round("value", 4).alias("value"),
        med.alias("moving_median"),
    )


def q_ts_resample_interpolate(spark, sf_dir):
    """Resample events to a daily grid and linearly interpolate gaps:
    the daily mean value is computed from events EXCLUDING days where
    day-of-month % 3 == 0 (manufactured sensor outages), then a complete
    day spine from the true min to max day is generated and missing days
    filled by linear interpolation between the nearest known neighbors
    (forward/back-fill at the edges).  Output: (day, value, is_gap).

    Plan: the heavy part — per-day mean over all events — is a normal
    distributed agg; the spine + interpolation run on the one-row-per-
    day aggregate, where last/first IGNORE NULLS over an ordered window
    do the neighbor search in one pass (no self-join, no explode of the
    gap ranges)."""
    load_tables(spark, sf_dir)
    ev = spark.table("events").select(
        F.col("ts").cast("date").alias("d"), "value"
    )
    daily = (
        ev.filter(F.dayofmonth("d") % GAP_MOD != 0)
        .groupBy("d")
        .agg(F.avg("value").alias("v"))
    )
    bounds = ev.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("d")
    )
    g = spine.join(daily, "d", "left")
    wp = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    wn = Window.orderBy("d").rowsBetween(0, Window.unboundedFollowing)
    prev_v = F.last("v", ignorenulls=True).over(wp)
    prev_d = F.last(F.when(F.col("v").isNotNull(), F.col("d")), True).over(wp)
    next_v = F.first("v", ignorenulls=True).over(wn)
    next_d = F.first(F.when(F.col("v").isNotNull(), F.col("d")), True).over(wn)
    span = F.datediff(next_d, prev_d)
    frac = F.datediff(F.col("d"), prev_d) / span
    interp = F.when(F.col("v").isNotNull(), F.col("v")).otherwise(
        F.when(
            prev_v.isNotNull() & next_v.isNotNull(),
            prev_v + (next_v - prev_v) * frac,
        ).otherwise(F.coalesce(prev_v, next_v))
    )
    return g.select(
        F.col("d").cast("string").alias("day"),
        F.round(interp, 4).alias("value"),
        F.col("v").isNull().alias("is_gap"),
    )


#: |robust z| above which a point is flagged (0.6745 scales MAD to σ)
RZ_THRESH = 3.5


def q_window_robust_zscore(spark, sf_dir):
    """Robust (MAD-based) outlier score — the median-family counterpart
    of q_window_anomaly_zscore, immune to the outliers it hunts:
    per user, med = median(value), MAD = median(|value - med|),
    rz = 0.6745·(value - med)/MAD (Iglewicz-Hoban modified z-score),
    flagged at |rz| > 3.5.  Users with MAD = 0 are skipped (guarded
    division, same ANSI rationale as the rolling z-score).

    Plan: two grouped exact medians (sort-based percentile per user) and
    two joins back — no window over raw events needed.  The med/MAD
    tables are per-USER aggregates (unbounded — user count grows with
    the data), so they carry no broadcast hint: AQE broadcasts them at
    small scale, and at 100 TB the joins shuffle on user_id like every
    other per-user stage."""
    load_tables(spark, sf_dir)
    # complete-case: a missing reading cannot be scored (its flag would
    # be a NULL boolean, which the engines normalize differently);
    # medians already ignore NULLs on both engines, so the filter only
    # removes unscorable rows
    ev = spark.table("events").filter(F.col("value").isNotNull())
    med = ev.groupBy("user_id").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    with_med = ev.join(med, "user_id")
    mad = with_med.groupBy("user_id").agg(
        F.expr("percentile(abs(value - med), 0.5)").alias("mad")
    )
    j = with_med.join(mad, "user_id").filter(F.col("mad") > 0)
    # Engine-exact scoring: value is cent-valued and medians are at
    # worst midpoints of midpoints, so value/med/mad are all exact
    # multiples of 1/400.  rz = 0.6745·(v-m)/mad then becomes the pure
    # integer ratio 6745·(v400-m400)/mad400 (already ×10^4), rounded
    # half-away-from-zero in integer space — round(double, 4) on the
    # raw quotient lands 1 ulp apart across engines at some SFs.
    j = (
        j.withColumn("v400", F.round(F.col("value") * 400).cast("long"))
        .withColumn("m400", F.round(F.col("med") * 400).cast("long"))
        .withColumn("mad400", F.round(F.col("mad") * 400).cast("long"))
        .withColumn("num", F.lit(6745) * (F.col("v400") - F.col("m400")))
    )
    rzx = F.expr(
        "CASE WHEN num < 0 THEN -((2 * -num + mad400) div (2 * mad400)) "
        "ELSE (2 * num + mad400) div (2 * mad400) END"
    )
    return j.select(
        "user_id",
        "event_id",
        F.round("value", 4).alias("value"),
        (rzx / F.lit(10000.0) + F.lit(0.0)).alias("robust_z"),
        # |rz| > 3.5  <=>  2·|num| > 7·10^4·mad400, exactly
        (2 * F.abs(F.col("num")) > 70000 * F.col("mad400")).alias("is_outlier"),
    )


def q_ts_time_weighted_avg(spark, sf_dir):
    """Time-weighted average per user — the IoT/finance aggregate where
    each reading holds until the next one: TWA = Σ value_i·Δt_i / Σ Δt_i
    with Δt_i the micros until the user's next event (last reading
    carries no weight).  A plain avg() over-weights burst periods; the
    TWA is invariant to sampling cadence.

    Plan: one lead() over the per-user sort, then one aggregate —
    weights are exact integer microseconds, and value·Δt sums are
    rounded only at the final division (6 dp)."""
    load_tables(spark, sf_dir)
    ev = spark.table("events").select(
        "user_id",
        "event_id",
        "value",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    dt = (F.lead("us").over(w) - F.col("us")).alias("dt")
    seg = ev.select("user_id", "value", dt).filter(F.col("dt").isNotNull())
    return seg.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.round(
            F.sum(F.col("value") * F.col("dt")) / F.sum("dt"), 6
        ).alias("twa"),
    )


def q_ts_ohlc_bars(spark, sf_dir):
    """OHLC candlestick bars — resample the event stream to hourly bars
    per event type: open/close are the first/last value in (ts,
    event_id) order, high/low the extremes, plus the event count.

    Plan: two ranked windows partitioned by (type, hour) mark the first
    and last row of each bar, then one partial+final agg collapses to
    bar granularity — no self-join, and every output is a PICKED or
    extreme value (never a float sum), so cross-engine hashing is
    knife-edge-free by construction."""
    load_tables(spark, sf_dir)
    e = spark.table("events").select(
        "event_id",
        "event_type",
        "value",
        "ts",
        F.date_trunc("hour", "ts").alias("bar"),
    )
    wa = Window.partitionBy("event_type", "bar").orderBy("ts", "event_id")
    wd = Window.partitionBy("event_type", "bar").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    r = e.withColumn("rn_a", F.row_number().over(wa)).withColumn(
        "rn_d", F.row_number().over(wd)
    )
    return r.groupBy("event_type", "bar").agg(
        (F.round(F.max(F.when(F.col("rn_a") == 1, F.col("value"))), 4) + F.lit(0.0)).alias("open_v"),
        (F.round(F.max("value"), 4) + F.lit(0.0)).alias("high_v"),
        (F.round(F.min("value"), 4) + F.lit(0.0)).alias("low_v"),
        (F.round(F.max(F.when(F.col("rn_d") == 1, F.col("value"))), 4) + F.lit(0.0)).alias("close_v"),
        F.count(F.lit(1)).alias("n_events"),
    )


def q_ts_autocorr(spark, sf_dir):
    """Serial correlation of the hourly mean series per event type —
    lag-1 and lag-2 Pearson autocorrelation, the first question asked of
    any metric stream (is it momentum or noise?).

    Plan: the raw stream first collapses to one row per (type, hour)
    (partial+final agg — the only pass over the fact table); the lag
    pairing and corr then run over the tiny hourly series.  corr parity
    with DuckDB is the same moment arithmetic agg_corr_covar already
    hash-checks."""
    load_tables(spark, sf_dir)
    hourly = (
        spark.table("events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.avg("value").alias("m"))
    )
    w = Window.partitionBy("event_type").orderBy("h")
    lagged = hourly.select(
        "event_type",
        "m",
        F.lag("m", 1).over(w).alias("m1"),
        F.lag("m", 2).over(w).alias("m2"),
    )
    return lagged.groupBy("event_type").agg(
        (F.round(F.corr("m", "m1"), 4) + F.lit(0.0)).alias("acf1"),
        (F.round(F.corr("m", "m2"), 4) + F.lit(0.0)).alias("acf2"),
        F.count("m1").alias("n_lag1_pairs"),
    )


def q_ts_seasonal_profile(spark, sf_dir):
    """Hour-of-day seasonal profile per event type: mean value, event
    count, and each hour's share of the type's events — the additive
    seasonal component of a classic decomposition.

    Plan: one partial+final agg to (type, hour-of-day), then a window
    over the 24-row-per-type aggregate for the share.  Both 4-dp
    outputs are rounded HALF-UP in exact INTEGER arithmetic
    (floor((2a+b)/2b) over cent-scaled sums) — value is 2-dp currency,
    so mean = cents/100n is often an exact 5-dp decimal tie, where
    Spark (rounds the shortest decimal string) and DuckDB (rounds the
    binary double) disagree by one ulp; integer rounding makes both
    engines produce the identical exact 4-dp quotient."""
    load_tables(spark, sf_dir)
    by_hour = (
        spark.table("events")
        .groupBy("event_type", F.hour("ts").alias("hod"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("value").cast("decimal(18,2)") * 100).cast("long")
            ).alias("cents"),
        )
    )
    w = Window.partitionBy("event_type")
    return (
        by_hour.withColumn("tot", F.sum("n").over(w))
        .withColumn(
            # mean = cents/(100*n); x10^4, round-half-up in integer space
            "mean_q", F.expr("(2 * cents * 100 + n) div (2 * n)")
        )
        .withColumn("share_q", F.expr("(2 * n * 10000 + tot) div (2 * tot)"))
        .select(
            "event_type",
            "hod",
            "n",
            (F.col("mean_q") / 10000.0).alias("mean_value"),
            (F.col("share_q") / 10000.0).alias("share_of_type"),
        )
    )


QUERIES = {
    "ts_autocorr": q_ts_autocorr,
    "ts_seasonal_profile": q_ts_seasonal_profile,
    "ts_ohlc_bars": q_ts_ohlc_bars,
    "ts_time_weighted_avg": q_ts_time_weighted_avg,
    "window_robust_zscore": q_window_robust_zscore,
    "window_anomaly_zscore": q_window_anomaly_zscore,
    "window_moving_median": q_window_moving_median,
    "ts_resample_interpolate": q_ts_resample_interpolate,
}

ORACLES = {
    "ts_autocorr": (
        "WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS h, "
        "avg(value) AS m FROM events GROUP BY event_type, h), "
        "lagged AS (SELECT event_type, m, "
        "lag(m, 1) OVER (PARTITION BY event_type ORDER BY h) AS m1, "
        "lag(m, 2) OVER (PARTITION BY event_type ORDER BY h) AS m2 "
        "FROM hourly) "
        "SELECT event_type, "
        "round(corr(m, m1), 4) + 0.0 AS acf1, "
        "round(corr(m, m2), 4) + 0.0 AS acf2, "
        "count(m1) AS n_lag1_pairs "
        "FROM lagged GROUP BY event_type"
    ),
    "ts_seasonal_profile": (
        "WITH bh AS (SELECT event_type, "
        "CAST(hour(ts) AS INT) AS hod, count(*) AS n, "
        "sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS cents "
        "FROM events GROUP BY event_type, hod), "
        "t AS (SELECT *, sum(n) OVER (PARTITION BY event_type) AS tot "
        "FROM bh) "
        "SELECT event_type, hod, n, "
        "((2 * cents * 100 + n) // (2 * n)) / 10000.0 AS mean_value, "
        "((2 * n * 10000 + tot) // (2 * tot)) / 10000.0 AS share_of_type "
        "FROM t"
    ),
    "ts_ohlc_bars": (
        "WITH e AS (SELECT event_id, event_type, value, ts, "
        "date_trunc('hour', ts) AS bar FROM events), "
        "r AS (SELECT *, "
        "row_number() OVER (PARTITION BY event_type, bar "
        "ORDER BY ts, event_id) AS rn_a, "
        "row_number() OVER (PARTITION BY event_type, bar "
        "ORDER BY ts DESC, event_id DESC) AS rn_d FROM e) "
        "SELECT event_type, bar, "
        "round(max(CASE WHEN rn_a = 1 THEN value END), 4) + 0.0 AS open_v, "
        "round(max(value), 4) + 0.0 AS high_v, "
        "round(min(value), 4) + 0.0 AS low_v, "
        "round(max(CASE WHEN rn_d = 1 THEN value END), 4) + 0.0 AS close_v, "
        "count(*) AS n_events "
        "FROM r GROUP BY event_type, bar"
    ),
    "ts_time_weighted_avg": (
        "WITH e AS (SELECT user_id, event_id, value, epoch_us(ts) AS us "
        "FROM events), "
        "seg AS (SELECT user_id, value, "
        "lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) - us AS dt "
        "FROM e) "
        "SELECT user_id, count(*) AS n_segments, "
        "round(sum(value * dt) / sum(dt), 6) AS twa "
        "FROM seg WHERE dt IS NOT NULL GROUP BY user_id"
    ),
    "window_robust_zscore": (
        "WITH ev AS (SELECT * FROM events WHERE value IS NOT NULL), med AS (SELECT user_id, median(value) AS med FROM ev "
        "GROUP BY user_id), "
        "mad AS (SELECT e.user_id, median(abs(e.value - m.med)) AS mad "
        "FROM ev e JOIN med m ON e.user_id = m.user_id GROUP BY e.user_id), "
        "fx AS (SELECT e.user_id, e.event_id, e.value, "
        "6745 * (CAST(round(e.value * 400) AS BIGINT) "
        "- CAST(round(m.med * 400) AS BIGINT)) AS num, "
        "CAST(round(d.mad * 400) AS BIGINT) AS mad400 "
        "FROM ev e JOIN med m ON e.user_id = m.user_id "
        "JOIN mad d ON e.user_id = d.user_id WHERE d.mad > 0) "
        "SELECT user_id, event_id, round(value, 4) AS value, "
        "(CASE WHEN num < 0 THEN -((2 * -num + mad400) // (2 * mad400)) "
        "ELSE (2 * num + mad400) // (2 * mad400) END) / 10000.0 + 0.0 "
        "AS robust_z, "
        "2 * abs(num) > 70000 * mad400 AS is_outlier FROM fx"
    ),
    "window_anomaly_zscore": (
        f"WITH s AS (SELECT user_id, event_id, value, "
        f"count(value) OVER w AS n, "
        f"CASE WHEN stddev_samp(value) OVER w > 0 THEN "
        f"(value - avg(value) OVER w) / (stddev_samp(value) OVER w) END AS z "
        f"FROM events "
        f"WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
        f"ROWS BETWEEN {ZS_LOOKBACK} PRECEDING AND 1 PRECEDING)) "
        f"SELECT user_id, event_id, round(value, 4) AS value, "
        f"round(z, 4) + 0.0 AS zscore, abs(z) > {ZS_THRESH} AS is_anomaly "
        f"FROM s WHERE n = {ZS_LOOKBACK} AND z IS NOT NULL"
    ),
    "window_moving_median": (
        f"SELECT user_id, event_id, round(value, 4) AS value, "
        f"round(median(value) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        f"ROWS BETWEEN {MED_FRAME} PRECEDING AND CURRENT ROW), 4) AS moving_median "
        f"FROM events"
    ),
    "ts_resample_interpolate": (
        f"WITH ev AS (SELECT CAST(ts AS DATE) AS d, value FROM events), "
        f"daily AS (SELECT d, avg(value) AS v FROM ev "
        f"WHERE day(d) % {GAP_MOD} <> 0 GROUP BY d), "
        f"spine AS (SELECT unnest(generate_series(CAST((SELECT min(d) FROM ev) AS DATE), "
        f"CAST((SELECT max(d) FROM ev) AS DATE), INTERVAL 1 DAY))::DATE AS d), "
        f"g AS (SELECT s.d, daily.v, "
        f"last_value(daily.v IGNORE NULLS) OVER "
        f"(ORDER BY s.d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v, "
        f"last_value(CASE WHEN daily.v IS NOT NULL THEN s.d END IGNORE NULLS) OVER "
        f"(ORDER BY s.d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_d, "
        f"first_value(daily.v IGNORE NULLS) OVER "
        f"(ORDER BY s.d ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v, "
        f"first_value(CASE WHEN daily.v IS NOT NULL THEN s.d END IGNORE NULLS) OVER "
        f"(ORDER BY s.d ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_d "
        f"FROM spine s LEFT JOIN daily ON s.d = daily.d) "
        f"SELECT CAST(d AS VARCHAR) AS day, "
        f"round(CASE WHEN v IS NOT NULL THEN v "
        f"WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN "
        f"prev_v + (next_v - prev_v) * (date_diff('day', prev_d, d) * 1.0 / "
        f"date_diff('day', prev_d, next_d)) "
        f"ELSE coalesce(prev_v, next_v) END, 4) AS value, "
        f"v IS NULL AS is_gap FROM g"
    ),
}
