"""Semantic + plan tests for the round-5 batch-2 TPC-H shapes
(Q12/Q9/Q11/Q16/Q20/Q21 adaptations).  Oracle hash parity runs in
test_oracle_parity / the driver; these pin the semantics and plan
shapes the hash can't see."""

from __future__ import annotations

from pyspark.sql import functions as F

from i2mapreduce_spark.catalog import load_tables
from tests.plan_util import plan_str as _plan


def test_priority_lateness_counts_partition_late_lines(spark, sf_dir):
    from i2mapreduce_spark.queries.tpch_q import (
        Q12_LATE_DAYS,
        q_agg_priority_lateness,
    )

    rows = q_agg_priority_lateness(spark, sf_dir).collect()
    load_tables(spark, sf_dir)
    li, o = spark.table("lineitem"), spark.table("orders")
    n_late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {Q12_LATE_DAYS} DAYS")
        )
        .count()
    )
    # high + low over all statuses partitions exactly the late lines
    assert sum(r.high_line_count + r.low_line_count for r in rows) == n_late
    plan = _plan(q_agg_priority_lateness(spark, sf_dir))
    assert "Window" not in plan


def test_product_profit_broadcasts_dims_and_is_decimal_exact(spark, sf_dir):
    from i2mapreduce_spark.queries.tpch_q import q_agg_product_profit

    df = q_agg_product_profit(spark, sf_dir)
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 2, plan[:1200]
    # single global re-derivation: total profit equals the sum of groups
    # to the cent (every per-group value is an exact 2-dp decimal)
    rows = df.collect()
    total = round(sum(r.profit for r in rows), 2)
    li = spark.table("lineitem")
    o = spark.table("orders")
    p = spark.table("part").filter(F.col("p_name").contains("widget"))
    manual = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (F.lit(1) - F.col("l_discount")).cast("decimal(8,4)")
                )
                - F.sum(
                    F.col("p_retailprice").cast("decimal(18,2)")
                    * F.col("l_quantity").cast("decimal(9,0)")
                ),
                2,
            ).cast("double")
        )
        .collect()[0][0]
    )
    assert abs(total - manual) < 0.01 * len(rows)


def test_part_concentration_membership_is_exact(spark, sf_dir):
    from i2mapreduce_spark.queries.tpch_q import (
        Q11_MULT_DEN,
        Q11_MULT_NUM,
        q_agg_part_concentration,
    )

    got = {r.l_partkey for r in q_agg_part_concentration(spark, sf_dir).collect()}
    load_tables(spark, sf_dir)
    li = spark.table("lineitem")
    pv = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("v")
    )
    rows = pv.collect()
    total = sum(r.v for r in rows)
    want = {
        r.l_partkey
        for r in rows
        if Q11_MULT_DEN * r.v * len(rows) > Q11_MULT_NUM * total
    }
    assert got == want
    # the SF-invariant threshold must not be vacuous (r6 fix: the old
    # 1/1000-of-total cut returned 0 rows at every SF)
    assert len(got) > 0


def test_parts_supplier_counts_uses_anti_join_and_excludes(spark, sf_dir):
    from i2mapreduce_spark.queries.tpch_q import (
        Q16_EXCLUDE_SUFFIX,
        q_join_parts_supplier_counts,
    )

    df = q_join_parts_supplier_counts(spark, sf_dir)
    plan = _plan(df)
    assert "LeftAnti" in plan, plan[:1200]
    # the blacklist really bites: recount one spec with suppliers kept
    load_tables(spark, sf_dir)
    li, p, s = (
        spark.table("lineitem"),
        spark.table("part"),
        spark.table("supplier"),
    )
    spec = df.orderBy("p_brand", "p_type", "p_size").first()
    kept = (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(
            (F.col("p_brand") == spec.p_brand)
            & (F.col("p_type") == spec.p_type)
            & (F.col("p_size") == spec.p_size)
        )
        .join(s, li.l_suppkey == s.s_suppkey)
        .filter(~F.col("s_name").endswith(Q16_EXCLUDE_SUFFIX))
        .select("l_suppkey")
        .distinct()
        .count()
    )
    assert spec.supplier_cnt == kept


def test_potential_promotion_suppliers_qualify(spark, sf_dir):
    from i2mapreduce_spark.queries.tpch_q import (
        Q20_MIN_QTY,
        Q20_NAME_PART,
        q_join_potential_promotion,
    )

    df = q_join_potential_promotion(spark, sf_dir)
    plan = _plan(df)
    assert "LeftSemi" in plan, plan[:1200]
    got = {r.s_suppkey for r in df.collect()}
    load_tables(spark, sf_dir)
    li, p = spark.table("lineitem"), spark.table("part")
    qual = (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(F.col("p_name").contains(Q20_NAME_PART))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > Q20_MIN_QTY)
        .select("l_suppkey")
        .distinct()
    )
    want = {r.l_suppkey for r in qual.collect()}
    assert got == want


def test_waiting_suppliers_sole_late_semantics(spark, sf_dir):
    from i2mapreduce_spark.queries.tpch_q import (
        Q21_LATE_DAYS,
        q_join_waiting_suppliers,
    )

    df = q_join_waiting_suppliers(spark, sf_dir)
    assert "TakeOrderedAndProject" in _plan(df)
    rows = df.collect()
    assert rows, "expected at least one waiting supplier"
    # independent per-order recomputation in pure python
    load_tables(spark, sf_dir)
    li, o = spark.table("lineitem"), spark.table("orders")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate")
                + F.expr(f"INTERVAL {Q21_LATE_DAYS} DAYS")
            ).alias("late"),
        )
        .collect()
    )
    per_os = {}
    for r in joined:
        k = (r.l_orderkey, r.l_suppkey)
        per_os[k] = per_os.get(k, False) or r.late
    per_o = {}
    for (ok, sk), late in per_os.items():
        n, nl = per_o.get(ok, (0, 0))
        per_o[ok] = (n + 1, nl + (1 if late else 0))
    counts = {}
    for (ok, sk), late in per_os.items():
        n, nl = per_o[ok]
        if late and n >= 2 and nl == 1:
            counts[sk] = counts.get(sk, 0) + 1
    s_names = {
        r.s_suppkey: r.s_name for r in spark.table("supplier").collect()
    }
    want = sorted(
        ((c, s_names[sk]) for sk, c in counts.items()),
        key=lambda t: (-t[0], t[1]),
    )[:20]
    assert [(r.numwait, r.s_name) for r in rows] == want
