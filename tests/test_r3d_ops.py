"""Semantic unit tests for round-3d operators (pattern regex, PSI drift,
approx percentile error bound, spatial kNN).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from i2mapreduce_spark.queries.aggregates import q_agg_approx_percentile
from i2mapreduce_spark.queries.joins import GEO_KNN, GEO_RADIUS_KM, q_join_spatial_knn
from i2mapreduce_spark.queries.quality import q_dq_drift_psi
from i2mapreduce_spark.queries.windows_q import q_window_pattern_regex


def test_pattern_counts_bounded_by_sequence(spark, sf_dir):
    pdf = q_window_pattern_regex(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    ev_counts = (
        spark.table("events").groupBy("user_id").count().toPandas().set_index("user_id")
    )
    for _, r in pdf.iterrows():
        assert r.seq_len == ev_counts.loc[r.user_id, "count"]
        # each match consumes >= 2 chars, so counts are bounded
        assert r.n_direct <= r.seq_len // 2
        assert r.n_assisted <= r.seq_len // 3


def test_psi_zero_for_identical_windows(spark):
    """PSI of a distribution against itself must be ~0 (only ε-smoothing
    noise): feed a synthetic frame whose ref and cur halves are equal."""
    import datetime

    rows = []
    for day, is_ref in ((1, True), (20, False)):
        for i in range(100):
            rows.append(
                (i, datetime.datetime(2024, 1, day, 0, 0, i % 60, i),
                 float(i % 10) * 10.0)
            )
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    from pyspark.sql import Window

    ev = df.select(
        F.lit("click").alias("event_type"), "value",
        (F.dayofmonth("ts") <= 15).alias("is_ref"),
    )
    rng = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    binned = ev.crossJoin(F.broadcast(rng)).select(
        "event_type", "is_ref",
        F.least(F.lit(9), F.floor((F.col("value") - F.col("lo")) /
                                  (F.col("hi") - F.col("lo")) * 10)).alias("bin"),
    )
    counts = binned.groupBy("event_type", "bin").agg(
        F.sum(F.col("is_ref").cast("long")).alias("n_ref"),
        F.sum((~F.col("is_ref")).cast("long")).alias("n_cur"),
    )
    tot = Window.partitionBy("event_type")
    p_ref = F.col("n_ref") / F.sum("n_ref").over(tot) + 1e-6
    p_cur = F.col("n_cur") / F.sum("n_cur").over(tot) + 1e-6
    psi = (
        counts.select(((p_cur - p_ref) * F.log(p_cur / p_ref)).alias("t"))
        .agg(F.sum("t"))
        .collect()[0][0]
    )
    assert abs(psi) < 1e-9


def test_psi_fixture_values_reasonable(spark, sf_dir):
    pdf = q_dq_drift_psi(spark, sf_dir).toPandas()
    assert len(pdf) == 5
    # PSI is a sum of (p-q)·ln(p/q) terms, each nonnegative — the index
    # itself must be >= 0 and finite.  (At sf0.001 the per-type halves
    # are ~15 samples, so sampling noise alone puts PSI well above the
    # production 0.25 alert line — no band assertion at fixture scale.)
    assert (pdf.psi >= 0).all() and (pdf.psi < 10).all()


def test_approx_percentile_error_bound(spark, sf_dir):
    approx = q_agg_approx_percentile(spark, sf_dir).toPandas().set_index("l_returnflag")
    exact = (
        spark.table("lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("e50"),
            F.expr("percentile(l_extendedprice, 0.95)").alias("e95"),
        )
        .toPandas()
        .set_index("l_returnflag")
    )
    for flag in exact.index:
        # GK accuracy 10000 -> rank error <= n/10000; translate to a loose
        # 2% relative value tolerance for this distribution
        assert abs(approx.loc[flag, "p50"] - exact.loc[flag, "e50"]) / exact.loc[flag, "e50"] < 0.02
        assert abs(approx.loc[flag, "p95"] - exact.loc[flag, "e95"]) / exact.loc[flag, "e95"] < 0.02


def test_spatial_knn_is_true_knn(spark, sf_dir):
    """Each probe's ranked list must be the true k nearest within the
    radius (verified brute force), ordered by distance."""
    from i2mapreduce_spark.queries.joins import _geo_points, _haversine_km

    got = q_join_spatial_knn(spark, sf_dir).toPandas()
    p = _geo_points(spark)
    a = p.select(F.col("c_custkey").alias("c1"), F.col("lat").alias("lat1"),
                 F.col("lon").alias("lon1"))
    b = p.select(F.col("c_custkey").alias("c2"), F.col("lat").alias("lat2"),
                 F.col("lon").alias("lon2"))
    brute = (
        a.crossJoin(b)
        .filter(F.col("c1") != F.col("c2"))
        .withColumn("d", _haversine_km(F.col("lat1"), F.col("lon1"),
                                       F.col("lat2"), F.col("lon2")))
        .filter(F.col("d") <= GEO_RADIUS_KM)
        .toPandas()
    )
    for c1, grp in got.groupby("c1"):
        grp = grp.sort_values("rank")
        assert grp["rank"].tolist() == list(range(1, len(grp) + 1))
        assert len(grp) <= GEO_KNN
        want = brute[brute.c1 == c1].sort_values(["d", "c2"]).head(len(grp))
        assert grp.c2.tolist() == want.c2.tolist()
