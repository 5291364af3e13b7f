"""Semantic unit tests for round-3f operators (robust MAD z-score, Gini
coefficient, symmetric difference)."""

from __future__ import annotations

from pyspark.sql import functions as F

from i2mapreduce_spark.queries.aggregates import q_agg_gini
from i2mapreduce_spark.queries.setops import q_setop_symmetric_diff
from i2mapreduce_spark.queries.timeseries import q_window_robust_zscore


def test_gini_in_unit_interval_and_matches_numpy(spark, sf_dir):
    row = q_agg_gini(spark, sf_dir).collect()[0]
    assert 0.0 <= row.gini < 1.0
    xs = sorted(
        r.x for r in spark.table("orders")
        .groupBy("o_custkey").agg(F.sum("o_totalprice").alias("x")).collect()
    )
    n, s = len(xs), sum(xs)
    expect = 2 * sum((i + 1) * x for i, x in enumerate(xs)) / (n * s) - (n + 1) / n
    assert abs(row.gini - round(expect, 6)) < 1e-6
    assert row.n_customers == n


def test_robust_zscore_median_centered(spark, sf_dir):
    pdf = q_window_robust_zscore(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    # per user, about half the points sit on each side of the median
    for uid, grp in pdf.groupby("user_id"):
        neg, pos = (grp.robust_z < 0).sum(), (grp.robust_z > 0).sum()
        assert abs(neg - pos) <= len(grp) // 2 + 1
    # outlier flag consistent with the threshold
    assert ((pdf.robust_z.abs() > 3.5) == pdf.is_outlier).all()


def test_symmetric_diff_is_set_xor(spark, sf_dir):
    got = {(r.nationkey, r.side) for r in q_setop_symmetric_diff(spark, sf_dir).collect()}
    a = {r.c_nationkey for r in spark.table("customer").select("c_nationkey").distinct().collect()}
    b = {
        r.s_nationkey
        for r in spark.table("supplier")
        .filter(F.col("s_suppkey") <= 60)
        .select("s_nationkey").distinct().collect()
    }
    want = {(k, "customer_only") for k in a - b} | {(k, "supplier_only") for k in b - a}
    assert got == want


def test_drawdown_nonnegative_and_bounded(spark, sf_dir):
    from i2mapreduce_spark.queries.windows_q import q_window_drawdown

    pdf = q_window_drawdown(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert (pdf.max_drawdown >= 0).all()
    # at least one customer with returns ('R') has a real drawdown
    assert (pdf.max_drawdown > 0).any()


def test_point_in_time_totals_conserved(spark, sf_dir):
    from pyspark.sql import functions as F

    from i2mapreduce_spark.queries.joins import q_join_point_in_time

    pdf = q_join_point_in_time(spark, sf_dir).toPandas()
    li = spark.table("lineitem")
    assert pdf.n_shipments.sum() == li.count()
    assert abs(pdf.sum_qty.sum() - li.agg(F.sum("l_quantity")).collect()[0][0]) < 1.0
    # every matched priority is a real priority value (or None for
    # shipments predating any order — impossible here since every line
    # belongs to an order placed on or before its ship date)
    prios = {r.o_orderpriority for r in
             spark.table("orders").select("o_orderpriority").distinct().collect()}
    assert set(pdf.priority.dropna()) <= prios


def test_freq_items_no_false_negatives(spark, sf_dir):
    """freqItems must return a SUPERSET of the truly >5%-frequent values
    (KPS sketch guarantee)."""
    from pyspark.sql import functions as F

    from i2mapreduce_spark.queries.aggregates import q_agg_freq_items

    row = q_agg_freq_items(spark, sf_dir).collect()[0]
    li = spark.table("lineitem")
    n = li.count()
    for col, cands in (
        ("l_returnflag", set(row.flag_candidates.split(","))),
        ("l_linestatus", set(row.status_candidates.split(","))),
    ):
        truth = {
            r[col]
            for r in li.groupBy(col).count().collect()
            if r["count"] > 0.05 * n
        }
        assert truth <= cands


def test_mark_join_flags_match_semi_joins(spark, sf_dir):
    from pyspark.sql import functions as F

    from i2mapreduce_spark.queries.joins import q_join_mark_exists

    pdf = q_join_mark_exists(spark, sf_dir).toPandas()
    c, o = spark.table("customer"), spark.table("orders")
    assert len(pdf) == c.count()          # mark join never drops rows
    big = {
        r.c_custkey
        for r in c.join(
            o.filter(F.col("o_totalprice") > 300000),
            F.col("c_custkey") == F.col("o_custkey"), "left_semi"
        ).collect()
    }
    assert set(pdf[pdf.has_big_order].c_custkey) == big
