"""Round-6 additions, batch 9: Keltner channels — the last classic TA
band family (completing Bollinger/Donchian/MACD/RSI/stochastic/ATR/
Aroon/OBV/VWAP/pivots), composed from the repo's exact fixed-point
primitives: the half-up integer EMA fold (r6b_ops._ema_fix) for the
middle line and an integer ATR for the band width.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..catalog import load_tables
from .r6b_ops import _ema_fix

KELT_EMA = 20    #: middle-line EMA span (days)
KELT_ATR = 10    #: band ATR lookback (days)
KELT_TRUNC = 64  #: EMA truncation horizon (residual weight ~1e-6)


def q_window_keltner(spark, sf_dir):
    """Keltner channels over ship-day OHLC bars of lineitem prices:
    middle = EMA-20 of the close (FIXED-POINT half-up integer fold — the
    MACD discipline: float EMA folds drift per engine), upper/lower =
    middle ± 2·ATR-10 (integer true range, half-up SMA), close position
    classified by integer comparison.  OHLC picks use the ranked-window
    pattern; day-grain pre-aggregation bounds every ordered frame at
    any SF (ship-day calendar is ~2.5k days at every scale factor)."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem").select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("day"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    wd = Window.partitionBy("day").orderBy(
        F.col("ok").desc(), F.col("ln").desc()
    )
    r = li.withColumn("rn_d", F.row_number().over(wd))
    bars = r.groupBy("day").agg(
        F.max("cents").alias("h"),
        F.min("cents").alias("l"),
        F.max(F.when(F.col("rn_d") == 1, F.col("cents"))).alias("c"),
    )
    w = Window.orderBy("day")
    pc = F.lag("c").over(w)
    tr = F.when(pc.isNull(), F.col("h") - F.col("l")).otherwise(
        F.greatest(
            F.col("h") - F.col("l"),
            F.abs(F.col("h") - pc),
            F.abs(F.col("l") - pc),
        )
    )
    trd = bars.select("day", "c", tr.alias("tr_c"))
    we = Window.orderBy("day").rowsBetween(-(KELT_TRUNC - 1), 0)
    wa = Window.orderBy("day").rowsBetween(-(KELT_ATR - 1), 0)
    framed = trd.select(
        "day",
        "c",
        F.count(F.lit(1)).over(we).alias("n"),
        F.collect_list("c").over(we).alias("cs"),
        F.count(F.lit(1)).over(wa).alias("na"),
        F.sum("tr_c").over(wa).alias("trs"),
    ).filter(F.col("n") == KELT_TRUNC)
    mid = F.expr(_ema_fix("cs", KELT_EMA, "spark"))
    atr = F.expr(f"(2 * trs + {KELT_ATR}) div {2 * KELT_ATR}")
    return framed.select(
        "day",
        (F.col("c") / 100.0).alias("close_v"),
        (mid / 100.0).alias("middle"),
        ((mid + 2 * atr) / 100.0).alias("upper"),
        ((mid - 2 * atr) / 100.0).alias("lower"),
        F.when(F.col("c") > mid + 2 * atr, "above_band")
        .when(F.col("c") < mid - 2 * atr, "below_band")
        .otherwise("inside")
        .alias("position"),
    )


QUERIES = {"window_keltner": q_window_keltner}

ORACLES = {
    "window_keltner": (
        "WITH li AS (SELECT l_orderkey AS ok, l_linenumber AS ln, "
        "strftime(l_shipdate, '%Y-%m-%d') AS day, "
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents "
        "FROM lineitem), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY day "
        "ORDER BY ok DESC, ln DESC) AS rn_d FROM li), "
        "bars AS (SELECT day, max(cents) AS h, min(cents) AS l, "
        "max(CASE WHEN rn_d = 1 THEN cents END) AS c FROM r GROUP BY 1), "
        "trd AS (SELECT day, c, CASE WHEN lag(c) OVER (ORDER BY day) IS NULL "
        "THEN h - l ELSE greatest(h - l, abs(h - lag(c) OVER (ORDER BY day)), "
        "abs(l - lag(c) OVER (ORDER BY day))) END AS tr_c FROM bars), "
        "framed AS (SELECT day, c, count(*) OVER we AS n, "
        "list(c) OVER we AS cs, sum(tr_c) OVER wa AS trs FROM trd "
        f"WINDOW we AS (ORDER BY day ROWS BETWEEN {KELT_TRUNC - 1} PRECEDING "
        "AND CURRENT ROW), "
        f"wa AS (ORDER BY day ROWS BETWEEN {KELT_ATR - 1} PRECEDING AND "
        "CURRENT ROW)), "
        "fin AS (SELECT day, c, "
        f"{_ema_fix('cs', KELT_EMA, 'duckdb')} AS mid, "
        f"(2 * trs + {KELT_ATR}) // {2 * KELT_ATR} AS atr "
        f"FROM framed WHERE n = {KELT_TRUNC}) "
        "SELECT day, c / 100.0 AS close_v, mid / 100.0 AS middle, "
        "(mid + 2 * atr) / 100.0 AS upper, (mid - 2 * atr) / 100.0 AS lower, "
        "CASE WHEN c > mid + 2 * atr THEN 'above_band' "
        "WHEN c < mid - 2 * atr THEN 'below_band' ELSE 'inside' END "
        "AS position FROM fin"
    ),
}
