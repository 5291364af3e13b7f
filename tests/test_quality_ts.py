"""Semantic unit tests for the data-quality (Q) and time-series (T)
operators on handmade inputs — the oracle-parity suite covers them
against DuckDB on the fixtures; these pin intended behavior on cases
small enough to verify by hand.
"""

from __future__ import annotations

import datetime

from i2mapreduce_spark.queries.quality import (
    q_dq_constraint_check,
    q_dq_profile,
    q_dq_referential_integrity,
)
from i2mapreduce_spark.queries.timeseries import (
    q_ts_resample_interpolate,
    q_window_anomaly_zscore,
    q_window_moving_median,
)


def test_dq_profile_one_scan_and_nulls(spark, sf_dir):
    rows = {r.column: r for r in q_dq_profile(spark, sf_dir).collect()}
    li = spark.table("lineitem")
    n = li.count()
    for r in rows.values():
        assert r.n_rows == n
        assert 0 <= r.n_null <= n
        assert 1 <= r.n_distinct <= n
    # returnflag domain is tiny and min/max are the lexical extremes
    assert rows["l_returnflag"].n_distinct <= 3
    assert rows["l_quantity"].min_value.endswith(".00")
    # ONE scan: the physical plan reads lineitem exactly once
    plan = q_dq_profile(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("lineitem.parquet") <= 1


def test_dq_referential_integrity_clean_fixture(spark, sf_dir):
    rows = {r.fk_name: r for r in q_dq_referential_integrity(spark, sf_dir).collect()}
    assert len(rows) == 6
    # synthetic star schema is referentially closed
    for r in rows.values():
        assert r.n_orphan == 0 and r.n_null_key == 0
    assert rows["lineitem_orders"].n_child == spark.table("lineitem").count()


def test_dq_constraint_null_counts_as_violation(spark):
    # NULL predicate result must count as a violation, not silently pass
    from pyspark.sql import functions as F

    t = spark.createDataFrame([(1.0,), (None,), (200.0,)], "l_quantity double")
    good = F.expr("l_quantity BETWEEN 1 AND 50")
    v = t.agg(F.sum(F.when(good, 0).otherwise(1))).collect()[0][0]
    assert v == 2  # NULL and 200 both violate


def test_zscore_constant_history_yields_null_not_ansi_error(spark):
    """A zero-variance lookback window must yield z = NULL (guarded
    division), not an ANSI DIVIDE_BY_ZERO runtime error."""
    from pyspark.sql import Window, functions as F

    from i2mapreduce_spark.queries import timeseries as T

    base = [(1, i, datetime.datetime(2024, 1, 1, 0, i), 10.0) for i in range(10)]
    spike = [(1, 10, datetime.datetime(2024, 1, 1, 0, 59), 15.0)]
    noisy = [(2, 20 + i, datetime.datetime(2024, 1, 1, 0, i), float(i % 7))
             for i in range(11)]
    df = spark.createDataFrame(
        base + spike + noisy, "user_id long, event_id long, ts timestamp, value double"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-T.ZS_LOOKBACK, -1)
    )
    mean, sd = F.avg("value").over(w), F.stddev_samp("value").over(w)
    z = F.when(sd > 0, (F.col("value") - mean) / sd)  # same guard as the query
    scored = df.select(
        "event_id", z.alias("z"), F.count("value").over(w).alias("n")
    ).filter(F.col("n") == T.ZS_LOOKBACK)
    out = {r.event_id: r.z for r in scored.collect()}
    assert out[10] is None          # constant history -> undefined z, no throw
    assert out[30] is not None      # noisy history -> real z-score


def test_moving_median_even_frame_interpolates(spark):
    rows = [(1, i, datetime.datetime(2024, 1, 1, 0, i), float(v))
            for i, v in enumerate([1, 3, 100, 7])]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    from pyspark.sql import Window, functions as F

    from i2mapreduce_spark.queries import timeseries as T

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-T.MED_FRAME, 0)
    )
    arr = F.array_sort(F.collect_list("value").over(w))
    n = F.size(arr)
    lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
    hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    med = dict(
        df.select("event_id", ((lo + hi) / 2.0).alias("m")).collect()
    )
    assert med[0] == 1.0           # frame {1}
    assert med[1] == 2.0           # frame {1,3} -> (1+3)/2
    assert med[2] == 3.0           # frame {1,3,100}
    assert med[3] == 5.0           # frame {1,3,100,7} -> (3+7)/2


def test_resample_fills_every_day_no_nulls(spark, sf_dir):
    pdf = q_ts_resample_interpolate(spark, sf_dir).toPandas()
    days = sorted(pdf.day)
    # complete daily spine, no holes
    d0 = datetime.date.fromisoformat(days[0])
    d1 = datetime.date.fromisoformat(days[-1])
    assert len(days) == (d1 - d0).days + 1
    assert pdf.value.notna().all()
    assert pdf.is_gap.any() and (~pdf.is_gap).any()
    # interpolated values lie between the neighboring observed values
    obs = pdf[~pdf.is_gap].set_index("day").value
    lo, hi = obs.min(), obs.max()
    assert pdf.value.between(lo, hi).all()


def test_uniqueness_reports_true_counts(spark, sf_dir):
    """The audit must report exact distinct counts — including FAILING
    keys: the fixture's (l_orderkey, l_linenumber) is deliberately not
    unique, and the audit's job is to say so."""
    from pyspark.sql import functions as F

    from i2mapreduce_spark.queries.quality import _UNIQUE_KEYS, q_dq_uniqueness

    rows = {r.key_name: r for r in q_dq_uniqueness(spark, sf_dir).collect()}
    assert len(rows) == 5
    for name, table, cols in _UNIQUE_KEYS:
        t = spark.table(table)
        n, nd = t.count(), t.select(*cols).distinct().count()
        r = rows[name]
        assert (r.n_rows, r.n_keys, r.n_dup_rows, r.is_unique) == (
            n, nd, n - nd, n == nd
        )
    # single-column surrogate keys in the fixture ARE unique
    for name in ("orders_pk", "events_pk", "customer_pk", "part_pk"):
        assert rows[name].is_unique


def test_benford_digits_complete_and_chi2_nonneg(spark, sf_dir):
    from i2mapreduce_spark.queries.quality import q_dq_benford

    pdf = q_dq_benford(spark, sf_dir).toPandas()
    assert sorted(pdf.digit) == list(range(1, 10))
    n = pdf.n_obs.sum()
    assert abs(pdf.n_expected.sum() - n) < 1          # Benford probs sum to 1
    assert (pdf.chi2_term >= 0).all()


def test_twa_constant_signal_equals_value(spark):
    """TWA of a constant signal equals the constant regardless of
    sampling cadence; a half-half step signal weighted by duration."""
    import datetime

    from pyspark.sql import Window, functions as F

    # user 1: constant 5.0 sampled irregularly; user 2: 0 for 10 min
    # then 10 for 30 min (plus a final zero-weight reading)
    rows = [(1, i, datetime.datetime(2024, 1, 1, 0, m), 5.0)
            for i, m in enumerate([0, 1, 5, 17, 59])]
    rows += [(2, 10, datetime.datetime(2024, 1, 1, 0, 0), 0.0),
             (2, 11, datetime.datetime(2024, 1, 1, 0, 10), 10.0),
             (2, 12, datetime.datetime(2024, 1, 1, 0, 40), 99.0)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    ev = df.select(
        "user_id", "event_id", "value",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    seg = ev.select(
        "user_id", "value", (F.lead("us").over(w) - F.col("us")).alias("dt")
    ).filter(F.col("dt").isNotNull())
    twa = {
        r.user_id: r.t
        for r in seg.groupBy("user_id")
        .agg((F.sum(F.col("value") * F.col("dt")) / F.sum("dt")).alias("t"))
        .collect()
    }
    assert twa[1] == 5.0
    assert abs(twa[2] - (0.0 * 10 + 10.0 * 30) / 40) < 1e-9


def test_equidepth_edges_monotone_and_split_evenly(spark, sf_dir):
    from pyspark.sql import functions as F

    from i2mapreduce_spark.queries.aggregates import q_agg_equidepth_histogram

    pdf = q_agg_equidepth_histogram(spark, sf_dir).toPandas()
    o = spark.table("orders").toPandas()
    for status, grp in pdf.groupby("o_orderstatus"):
        edges = grp.sort_values("decile").edge.tolist()
        assert edges == sorted(edges)
        vals = o[o.o_orderstatus == status].o_totalprice
        # the median edge splits the group roughly in half
        med = edges[4]
        frac = (vals <= med).mean()
        assert 0.4 < frac < 0.6
