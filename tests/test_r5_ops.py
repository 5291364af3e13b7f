"""Semantic + plan tests for the round-5 keys (six more TPC-H shapes,
error-tolerant try_* arithmetic, OHLC time-series bars).  Oracle hash
parity runs in tools/check_oracle.py / the driver; these pin the
semantics and plan shapes the hash can't see."""

from __future__ import annotations

from pyspark.sql import functions as F

from i2mapreduce_spark.catalog import load_tables


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_forecast_revenue_matches_manual_filter(spark, sf_dir):
    from i2mapreduce_spark.queries.tpch_q import Q6_HI, Q6_LO, q_agg_forecast_revenue

    row = q_agg_forecast_revenue(spark, sf_dir).collect()[0]
    li = spark.table("lineitem")
    manual = li.filter(
        (F.col("l_shipdate") >= F.lit(Q6_LO).cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(Q6_HI).cast("timestamp_ntz"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    assert row.n_lines == manual.count()
    assert row.revenue > 0
    # predicates must reach the scan, not sit post-join
    assert "PushedFilters" in _plan(q_agg_forecast_revenue(spark, sf_dir))


def test_customer_distribution_partitions_all_customers(spark, sf_dir):
    from i2mapreduce_spark.queries.tpch_q import q_agg_customer_distribution

    rows = q_agg_customer_distribution(spark, sf_dir).collect()
    load_tables(spark, sf_dir)
    n_cust = spark.table("customer").count()
    n_with_orders = (
        spark.table("orders").select("o_custkey").distinct().count()
    )
    # every customer lands in exactly one bucket
    assert sum(r.custdist for r in rows) == n_cust
    # the zero-order bucket is exactly the customers with no orders
    zero = {r.c_count: r.custdist for r in rows}.get(0, 0)
    assert zero == n_cust - n_with_orders


def test_large_volume_customers_threshold_and_order(spark, sf_dir):
    from i2mapreduce_spark.queries.tpch_q import (
        Q18_MIN_QTY,
        q_join_large_volume_customers,
    )

    rows = q_join_large_volume_customers(spark, sf_dir).collect()
    assert 0 < len(rows) <= 100
    assert all(r.total_qty > Q18_MIN_QTY for r in rows)
    key = [(-r.totalprice, r.o_orderkey) for r in rows]
    assert key == sorted(key)
    # per-order quantity sums re-derived independently for the returned set
    load_tables(spark, sf_dir)
    want = {
        r.l_orderkey: r.s
        for r in spark.table("lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").cast("bigint").alias("s"))
        .collect()
    }
    assert all(want[r.o_orderkey] == r.total_qty for r in rows)


def test_small_qty_and_bracket_revenue_broadcast_part(spark, sf_dir):
    from i2mapreduce_spark.queries.tpch_q import (
        q_agg_bracket_revenue,
        q_agg_small_qty_revenue,
    )

    for fn in (q_agg_small_qty_revenue, q_agg_bracket_revenue):
        plan = _plan(fn(spark, sf_dir))
        assert "BroadcastHashJoin" in plan, plan
        row = fn(spark, sf_dir).collect()[0]
        assert row.n_lines > 0


def test_min_cost_supplier_is_the_observed_minimum(spark, sf_dir):
    from i2mapreduce_spark.queries.tpch_q import (
        Q2_MAX_SIZE,
        q_join_min_cost_supplier,
    )

    out = q_join_min_cost_supplier(spark, sf_dir)
    pdf = out.toPandas()
    load_tables(spark, sf_dir)
    # one row per qualifying part that appears in lineitem
    n_parts = (
        spark.table("lineitem")
        .join(
            spark.table("part").filter(F.col("p_size") <= Q2_MAX_SIZE),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("p_partkey")
        .distinct()
        .count()
    )
    assert len(pdf) == n_parts
    assert pdf.p_partkey.is_unique
    # the reported cost is the true minimum unit price for each part
    mins = {
        r.p_partkey: r.m
        for r in spark.table("lineitem")
        .join(
            spark.table("part").filter(F.col("p_size") <= Q2_MAX_SIZE),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_partkey")
        .agg(
            F.round(
                F.min(F.col("l_extendedprice") / F.col("l_quantity")), 4
            ).alias("m")
        )
        .collect()
    }
    assert all(mins[r.p_partkey] == r.min_unit_cost for r in pdf.itertuples())


def test_try_arith_nulls_exactly_on_bad_rows(spark, sf_dir):
    from i2mapreduce_spark.queries.scalar_fns import q_fn_try_arith

    pdf = q_fn_try_arith(spark, sf_dir).toPandas()
    load_tables(spark, sf_dir)
    custkey = {
        r.o_orderkey: r.o_custkey for r in spark.table("orders").collect()
    }
    import math

    for r in pdf.itertuples():
        bad = custkey[r.o_orderkey] % 7 == 0
        assert (r.safe_unit is None or math.isnan(r.safe_unit)) == bad
    assert pdf.div0.isna().all()            # literal /0 -> NULL, no exception
    assert pdf.prio_full_int.isna().all()   # '1-URGENT' never parses as INT
    assert set(pdf.prio_digit.unique()) <= {1, 2, 3, 4, 5}


def test_ohlc_bars_invariants(spark, sf_dir):
    from i2mapreduce_spark.queries.timeseries import q_ts_ohlc_bars

    pdf = q_ts_ohlc_bars(spark, sf_dir).toPandas()
    load_tables(spark, sf_dir)
    assert pdf.n_events.sum() == spark.table("events").count()
    assert (pdf.high_v >= pdf.open_v).all() and (pdf.high_v >= pdf.close_v).all()
    assert (pdf.low_v <= pdf.open_v).all() and (pdf.low_v <= pdf.close_v).all()
    # single-event bars collapse to one price
    ones = pdf[pdf.n_events == 1]
    assert (ones.open_v == ones.close_v).all()
    assert (ones.high_v == ones.low_v).all()
