"""Round-6 additions, batch 16: behavioral transition modeling (Markov
matrix), two candle-domain transforms (Heikin-Ashi — a RECURSIVE candle
average — and rule-based pattern classification), and spectral period
detection.  Transition matrices and seasonality estimates are the two
session-modeling statistics the surface lacked; Heikin-Ashi exercises
the recursive-CTE oracle pattern on a 4-field candle state.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..catalog import load_tables

#: candle-pattern thresholds (per-mille of the bar's total range)
DOJI_BODY_PM = 100      # body <= 10% of range -> doji


def q_agg_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix of user event types: for
    every (from_type, to_type) pair, the transition count and the
    row-normalized probability — the session-modeling statistic under
    next-action prediction and anomaly scoring.

    One lead() over each user's (ts, event_id) order, one partial+final
    agg on the pair, one window sum per from-state (no join); the
    probability is a half-up x10^6 integer quotient.  The matrix is
    bounded by the event-type enum squared at any SF."""
    load_tables(spark, sf_dir)
    ev = spark.table("events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counted = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    wf = Window.partitionBy("from_type")
    return counted.select(
        "from_type",
        "to_type",
        "n",
        (
            F.expr(
                "(2 * 1000000 * n + sum(n) OVER "
                "(PARTITION BY from_type)) div "
                "(2 * sum(n) OVER (PARTITION BY from_type))"
            )
            / 1000000.0
        ).alias("prob"),
        F.sum("n").over(wf).alias("from_total"),
    )


def _ha_step(o: str, c: str, h: str, l: str, nh: str, nl: str, no: str,
             nc: str, dialect: str) -> dict[str, str]:
    """One Heikin-Ashi transition: ha_close = (o+h+l+c)/4 of the RAW
    bar, ha_open = (prev ha_open + prev ha_close)/2 — the recursion —
    ha_high/low = extremes vs the smoothed open/close.  All half-up
    integer-cents quotients; `o..l` are the PREVIOUS HA state fields,
    `nh..nc` the next RAW bar."""
    d = "div" if dialect == "spark" else "//"
    ho = f"(({o} + {c} + 1) {d} 2)"
    hc = f"(({no} + {nh} + {nl} + {nc} + 2) {d} 4)"
    return {
        "o": ho,
        "c": hc,
        "h": f"greatest({nh}, {ho}, {hc})",
        "l": f"least({nl}, {ho}, {hc})",
    }


def q_window_heikin_ashi(spark, sf_dir):
    """Heikin-Ashi candles over ship-day OHLC bars of lineitem prices —
    the smoothed-candle transform whose OPEN is defined RECURSIVELY
    (ha_open_t = (ha_open_{t-1} + ha_close_{t-1})/2), making it the
    candle-domain member of this repo's exact-integer recursive family:
    Spark folds the day prefix, the DuckDB oracle walks a recursive CTE
    over the MATERIALIZED bar series, every quotient half-up integer
    cents.  Seed: ha_open_1 = (o_1+c_1)/2, ha_close_1 = OHLC/4 mean.

    NULL join keys (r10): rows with NULL l_orderkey are excluded from
    the bar construction on BOTH sides — the day-bar open/close are
    picked by the (ok, ln) total order, which is undefined for NULL ok
    (engines disagree on NULL sort placement, and NULL-ok rows sharing
    a day+linenumber tie arbitrarily)."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem").filter(F.col("l_orderkey").isNotNull()).select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("day"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    wa = Window.partitionBy("day").orderBy("ok", "ln")
    wd = Window.partitionBy("day").orderBy(F.col("ok").desc(), F.col("ln").desc())
    r = li.withColumn("rn_a", F.row_number().over(wa)).withColumn(
        "rn_d", F.row_number().over(wd)
    )
    bars = r.groupBy("day").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("cents"))).alias("o"),
        F.max("cents").alias("h"),
        F.min("cents").alias("l"),
        F.max(F.when(F.col("rn_d") == 1, F.col("cents"))).alias("c"),
    )
    wf = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    framed = bars.select(
        "day",
        F.collect_list(F.struct("o", "h", "l", "c")).over(wf).alias("arr"),
    )
    s = _ha_step("acc.o", "acc.c", "acc.h", "acc.l",
                 "x.h", "x.l", "x.o", "x.c", "spark")
    fold = (
        "aggregate(slice(arr, 2, size(arr) - 1), "
        "named_struct("
        "'o', (element_at(arr, 1).o + element_at(arr, 1).c + 1) div 2, "
        "'h', element_at(arr, 1).h, 'l', element_at(arr, 1).l, "
        "'c', (element_at(arr, 1).o + element_at(arr, 1).h + "
        "element_at(arr, 1).l + element_at(arr, 1).c + 2) div 4), "
        f"(acc, x) -> named_struct('o', {s['o']}, 'h', {s['h']}, "
        f"'l', {s['l']}, 'c', {s['c']}))"
    )
    st = F.expr(fold)
    return framed.select(
        "day",
        (st["o"] / 100.0).alias("ha_open"),
        (st["h"] / 100.0).alias("ha_high"),
        (st["l"] / 100.0).alias("ha_low"),
        (st["c"] / 100.0).alias("ha_close"),
        F.when(st["c"] > st["o"], "bull")
        .when(st["c"] < st["o"], "bear")
        .otherwise("flat")
        .alias("ha_stance"),
    )


def q_window_candle_patterns(spark, sf_dir):
    """Rule-based candlestick pattern classification over ship-day OHLC
    bars: doji (body ≤ 10% of range), bullish/bearish engulfing (body
    swallows the previous body, opposite color), hammer (lower shadow ≥
    2× body, close in top third) — every rule an exact integer
    cross-multiplication over cents, one lag for the previous body, no
    float in any branch.

    NULL join keys (r10): NULL-l_orderkey rows are excluded on both
    sides — same (ok, ln) total-order rationale as window_heikin_ashi."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem").filter(F.col("l_orderkey").isNotNull()).select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("day"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    wa = Window.partitionBy("day").orderBy("ok", "ln")
    wd = Window.partitionBy("day").orderBy(F.col("ok").desc(), F.col("ln").desc())
    r = li.withColumn("rn_a", F.row_number().over(wa)).withColumn(
        "rn_d", F.row_number().over(wd)
    )
    bars = r.groupBy("day").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("cents"))).alias("o"),
        F.max("cents").alias("h"),
        F.min("cents").alias("l"),
        F.max(F.when(F.col("rn_d") == 1, F.col("cents"))).alias("c"),
    )
    w = Window.orderBy("day")
    po, pc = F.lag("o").over(w), F.lag("c").over(w)
    lined = bars.select(
        "day", "o", "h", "l", "c",
        po.alias("po"), pc.alias("pc"),
    ).filter(F.col("po").isNotNull())
    body = F.abs(F.col("c") - F.col("o"))
    rng = F.col("h") - F.col("l")
    lower_shadow = F.least("o", "c") - F.col("l")
    is_doji = (body * 1000) <= (rng * DOJI_BODY_PM)
    bull_engulf = (
        (F.col("pc") < F.col("po"))
        & (F.col("c") > F.col("o"))
        & (F.col("o") <= F.col("pc"))
        & (F.col("c") >= F.col("po"))
    )
    bear_engulf = (
        (F.col("pc") > F.col("po"))
        & (F.col("c") < F.col("o"))
        & (F.col("o") >= F.col("pc"))
        & (F.col("c") <= F.col("po"))
    )
    hammer = (lower_shadow >= 2 * body) & (
        3 * (F.greatest("o", "c") - F.col("l")) >= 2 * rng
    )
    return lined.select(
        "day",
        (F.col("o") / 100.0).alias("open_v"),
        (F.col("c") / 100.0).alias("close_v"),
        F.when(is_doji, "doji")
        .when(bull_engulf, "bullish_engulfing")
        .when(bear_engulf, "bearish_engulfing")
        .when(hammer, "hammer")
        .otherwise("none")
        .alias("pattern"),
    )


def q_ts_spectral_peak(spark, sf_dir):
    """Dominant cycle detection per event type: the periodogram peak of
    each type's daily-count series (mean-removed real FFT, Arrow-batched
    numpy per group), reporting the dominant period in days and its
    share of total spectral power — the seasonality estimate under
    every capacity-planning decision.

    Scale shape: the heavy pass is the day-grain pre-aggregation (one
    shuffle); each FFT then runs on one bounded per-type day series
    (calendar-bounded at any SF) inside applyInPandas, series sorted by
    day so the transform is order-deterministic.  Rows-only key (FFT
    floats aren't SQL-replayable); pytest replays numpy and pins a
    planted-period fixture."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    load_tables(spark, sf_dir)
    ev = spark.table("events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))

    schema = StructType(
        [
            StructField("event_type", StringType()),
            StructField("n_days", LongType()),
            StructField("dominant_period_days", DoubleType()),
            StructField("power_share", DoubleType()),
        ]
    )

    def spectral(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day")
        x = pdf["n"].to_numpy(dtype=np.float64)
        x = x - x.mean()
        spec = np.abs(np.fft.rfft(x)) ** 2
        spec[0] = 0.0
        total = spec.sum()
        if total == 0 or len(x) < 4:
            per, share = float("nan"), 0.0
        else:
            k = int(spec.argmax())
            per = len(x) / k
            share = float(spec[k] / total)
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_days": [len(x)],
                "dominant_period_days": [round(per, 4)],
                "power_share": [round(share, 6)],
            }
        )

    return daily.groupBy("event_type").applyInPandas(spectral, schema)


QUERIES = {
    "agg_markov_transitions": q_agg_markov_transitions,
    "window_heikin_ashi": q_window_heikin_ashi,
    "window_candle_patterns": q_window_candle_patterns,
    "ts_spectral_peak": q_ts_spectral_peak,
}

_HA_D = _ha_step("w.o", "w.c", "w.h", "w.l", "n.h", "n.l", "n.o", "n.c",
                 "duckdb")

ORACLES = {
    "agg_markov_transitions": (
        "WITH pairs AS (SELECT event_type AS from_type, "
        "lead(event_type) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) AS to_type FROM events), "
        "counted AS (SELECT from_type, to_type, count(*) AS n FROM pairs "
        "WHERE to_type IS NOT NULL GROUP BY 1, 2) "
        "SELECT from_type, to_type, n, "
        "((2 * 1000000 * n + sum(n) OVER (PARTITION BY from_type)) // "
        "(2 * sum(n) OVER (PARTITION BY from_type))) / 1000000.0 AS prob, "
        "CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS from_total "
        "FROM counted"
    ),
    "window_heikin_ashi": (
        "WITH RECURSIVE li AS (SELECT l_orderkey AS ok, l_linenumber AS ln, "
        "strftime(l_shipdate, '%Y-%m-%d') AS day, "
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents "
        "FROM lineitem WHERE l_orderkey IS NOT NULL), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY day "
        "ORDER BY ok, ln) AS rn_a, row_number() OVER (PARTITION BY day "
        "ORDER BY ok DESC, ln DESC) AS rn_d FROM li), "
        "bars AS (SELECT day, max(CASE WHEN rn_a = 1 THEN cents END) AS o, "
        "max(cents) AS h, min(cents) AS l, "
        "max(CASE WHEN rn_d = 1 THEN cents END) AS c FROM r GROUP BY 1), "
        "idx AS MATERIALIZED (SELECT day, o, h, l, c, "
        "row_number() OVER (ORDER BY day) AS i FROM bars), "
        "walk(i, day, o, h, l, c) AS ("
        "SELECT i, day, (o + c + 1) // 2, h, l, (o + h + l + c + 2) // 4 "
        "FROM idx WHERE i = 1 "
        "UNION ALL SELECT n.i, n.day, "
        f"{_HA_D['o']}, {_HA_D['h']}, {_HA_D['l']}, {_HA_D['c']} "
        "FROM walk w JOIN idx n ON n.i = w.i + 1) "
        "SELECT day, o / 100.0 AS ha_open, h / 100.0 AS ha_high, "
        "l / 100.0 AS ha_low, c / 100.0 AS ha_close, "
        "CASE WHEN c > o THEN 'bull' WHEN c < o THEN 'bear' ELSE 'flat' END "
        "AS ha_stance FROM walk"
    ),
    "window_candle_patterns": (
        "WITH li AS (SELECT l_orderkey AS ok, l_linenumber AS ln, "
        "strftime(l_shipdate, '%Y-%m-%d') AS day, "
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents "
        "FROM lineitem WHERE l_orderkey IS NOT NULL), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY day "
        "ORDER BY ok, ln) AS rn_a, row_number() OVER (PARTITION BY day "
        "ORDER BY ok DESC, ln DESC) AS rn_d FROM li), "
        "bars AS (SELECT day, max(CASE WHEN rn_a = 1 THEN cents END) AS o, "
        "max(cents) AS h, min(cents) AS l, "
        "max(CASE WHEN rn_d = 1 THEN cents END) AS c FROM r GROUP BY 1), "
        "lined AS (SELECT day, o, h, l, c, lag(o) OVER (ORDER BY day) AS po, "
        "lag(c) OVER (ORDER BY day) AS pc FROM bars) "
        "SELECT day, o / 100.0 AS open_v, c / 100.0 AS close_v, "
        f"CASE WHEN abs(c - o) * 1000 <= (h - l) * {DOJI_BODY_PM} THEN 'doji' "
        "WHEN pc < po AND c > o AND o <= pc AND c >= po "
        "THEN 'bullish_engulfing' "
        "WHEN pc > po AND c < o AND o >= pc AND c <= po "
        "THEN 'bearish_engulfing' "
        "WHEN least(o, c) - l >= 2 * abs(c - o) "
        "AND 3 * (greatest(o, c) - l) >= 2 * (h - l) THEN 'hammer' "
        "ELSE 'none' END AS pattern "
        "FROM lined WHERE po IS NOT NULL"
    ),
    # ts_spectral_peak: rows-only (FFT floats) — numpy golden in pytest
}
