"""Semantic + plan tests for the round-4 keys (TPC-H-shaped composites,
URL-canonicalization dedup, corpus sharding, embedding-norm stats).
Oracle hash parity runs in tools/check_oracle.py / the driver; these pin
the semantics and plan shapes the hash can't see."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from i2mapreduce_spark.catalog import load_tables
from tests.plan_util import plan_str as _plan


def test_shipping_priority_topk_is_sorted_and_unshipped(spark, sf_dir):
    from i2mapreduce_spark.queries.tpch_q import (
        SHIP_CUTOFF,
        q_agg_shipping_priority,
    )

    rows = q_agg_shipping_priority(spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)
    cutoff = SHIP_CUTOFF
    for r in rows:
        assert str(r.o_orderdate) < cutoff  # placed before the cutoff
    # the top-n must be a TakeOrderedAndProject, not a global sort
    plan = _plan(q_agg_shipping_priority(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan


def test_exists_priority_counts_match_direct_recompute(spark, sf_dir):
    from i2mapreduce_spark.queries.tpch_q import q_join_exists_priority

    load_tables(spark, sf_dir)
    got = {
        r.o_orderpriority: r.n_late_orders
        for r in q_join_exists_priority(spark, sf_dir).collect()
    }
    o = spark.table("orders")
    li = spark.table("lineitem")
    want = {
        r.o_orderpriority: r.n
        for r in li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("o_orderkey", "o_orderpriority")
        .distinct()
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_local_supplier_volume_nations_are_in_region(spark, sf_dir):
    from i2mapreduce_spark.queries.tpch_q import Q5_REGION, q_agg_local_supplier_volume

    load_tables(spark, sf_dir)
    rows = q_agg_local_supplier_volume(spark, sf_dir).collect()
    assert len(rows) > 0
    in_region = {
        r.n_name
        for r in spark.table("nation")
        .join(
            spark.table("region").filter(F.col("r_name") == Q5_REGION),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .collect()
    }
    assert {r.n_name for r in rows} <= in_region
    # dims must broadcast
    assert "BroadcastHashJoin" in _plan(q_agg_local_supplier_volume(spark, sf_dir))


def test_market_share_is_a_true_share(spark, sf_dir):
    from i2mapreduce_spark.queries.tpch_q import q_agg_market_share

    rows = q_agg_market_share(spark, sf_dir).collect()
    assert len(rows) >= 5  # one row per order year 1995-2001
    for r in rows:
        assert 0.0 <= r.mkt_share <= 1.0
        assert r.nation_revenue <= r.total_revenue
        assert math.isclose(
            r.mkt_share, r.nation_revenue / r.total_revenue, rel_tol=1e-3
        )


def test_top_supplier_is_the_argmax(spark, sf_dir):
    from i2mapreduce_spark.queries.tpch_q import (
        Q15_HI,
        Q15_LO,
        q_join_top_supplier,
    )

    load_tables(spark, sf_dir)
    rows = q_join_top_supplier(spark, sf_dir).collect()
    assert len(rows) >= 1
    li = spark.table("lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q15_LO).cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(Q15_HI).cast("timestamp_ntz"))
    )
    best = (
        li.groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("rev")
        )
        .agg(F.max("rev"))
        .collect()[0][0]
    )
    for r in rows:
        assert r.total_revenue == best


def test_url_canonicalize_collapses_all_variant_axes(spark, sf_dir):
    from i2mapreduce_spark.queries.llmops import q_dedup_url_canonicalize

    rows = q_dedup_url_canonicalize(spark, sf_dir).collect()
    # 500 docs over 50 pages -> exactly 50 canonical URLs, ~10 variants each
    assert len(rows) == 50
    for r in rows:
        u = r.canonical_url
        assert u.startswith("https://www.example.com/Articles/"), u
        assert "#" not in u and "utm" not in u and not u.endswith("/"), u
        assert r.n_variants >= 2  # case/utm/slash/fragment variants collapsed


def test_shard_assign_is_deterministic_and_balanced(spark, sf_dir):
    from i2mapreduce_spark.queries.pipelines import N_SHARDS, q_pipeline_shard_assign

    a = {r.shard: (r.n_docs, r.n_tokens) for r in q_pipeline_shard_assign(spark, sf_dir).collect()}
    b = {r.shard: (r.n_docs, r.n_tokens) for r in q_pipeline_shard_assign(spark, sf_dir).collect()}
    assert a == b  # content-independent hash key -> identical re-runs
    assert set(a) <= set(range(N_SHARDS))
    rows = q_pipeline_shard_assign(spark, sf_dir).collect()
    total = sum(r.token_permille for r in rows)
    assert abs(total - 1000.0) < 1.0  # shares sum to ~1000 permille


def test_embedding_norm_stats_matches_numpy(spark, sf_dir):
    import numpy as np

    from i2mapreduce_spark.queries.llmops import q_embedding_norm_stats

    load_tables(spark, sf_dir)
    got = {r.label: r for r in q_embedding_norm_stats(spark, sf_dir).collect()}
    pdf = spark.table("embeddings").toPandas()
    pdf["nrm"] = pdf.embedding.map(
        lambda v: math.sqrt(sum(float(x) * float(x) for x in v))
    )
    for label, g in pdf.groupby("label"):
        r = got[int(label)]
        assert r.n_vecs == len(g)
        assert abs(r.mean_norm - round(float(g.nrm.mean()), 4)) < 1e-3
        assert abs(r.min_norm - round(float(g.nrm.min()), 6)) < 1e-6
        assert abs(r.max_norm - round(float(g.nrm.max()), 6)) < 1e-6
    # the norm must be computed JVM-side: no Python rows in the plan
    plan = _plan(q_embedding_norm_stats(spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_trade_volume_is_bidirectional_and_cross_nation(spark, sf_dir):
    from i2mapreduce_spark.queries.tpch_q import (
        Q7_NATION_A,
        Q7_NATION_B,
        q_join_nation_trade_volume,
    )

    rows = q_join_nation_trade_volume(spark, sf_dir).collect()
    assert len(rows) > 0
    pairs = {(r.supp_nation, r.cust_nation) for r in rows}
    assert pairs <= {(Q7_NATION_A, Q7_NATION_B), (Q7_NATION_B, Q7_NATION_A)}
    assert len(pairs) == 2  # both directions present at this SF


def test_returned_revenue_only_counts_returns(spark, sf_dir):
    from i2mapreduce_spark.queries.tpch_q import (
        Q10_HI,
        Q10_LO,
        q_agg_returned_revenue,
    )

    load_tables(spark, sf_dir)
    rows = q_agg_returned_revenue(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    revs = [r.lost_revenue for r in rows]
    assert revs == sorted(revs, reverse=True)
    # recompute the top row from the raw facts
    li = spark.table("lineitem").filter(
        (F.col("l_returnflag") == "R")
        & (F.col("l_shipdate") >= F.lit(Q10_LO).cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(Q10_HI).cast("timestamp_ntz"))
    )
    o = spark.table("orders")
    top = rows[0]
    want = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("o_custkey") == top.c_custkey)
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2))
        .collect()[0][0]
    )
    assert top.lost_revenue == want


def test_promo_share_brackets_and_monthly(spark, sf_dir):
    from i2mapreduce_spark.queries.tpch_q import q_agg_promo_share

    rows = q_agg_promo_share(spark, sf_dir).collect()
    assert len(rows) == 12
    for r in rows:
        assert 0.0 <= r.promo_share_pct <= 100.0
        assert r.promo_revenue <= r.total_revenue


def test_untapped_customers_match_direct_recompute(spark, sf_dir):
    from i2mapreduce_spark.queries.tpch_q import Q22_BIG, q_join_untapped_customers

    load_tables(spark, sf_dir)
    got = {
        r.c_mktsegment: r.n_candidates
        for r in q_join_untapped_customers(spark, sf_dir).collect()
    }
    c = spark.table("customer")
    o = spark.table("orders")
    avg_bal = c.agg(F.avg("c_acctbal")).collect()[0][0]
    big_cust = {
        r.o_custkey
        for r in o.filter(F.col("o_totalprice") > Q22_BIG)
        .select("o_custkey")
        .distinct()
        .collect()
    }
    want: dict = {}
    for r in c.collect():
        if r.c_acctbal > avg_bal and r.c_custkey not in big_cust:
            want[r.c_mktsegment] = want.get(r.c_mktsegment, 0) + 1
    assert got == want


def test_quality_gate_funnel_is_monotone_with_real_attrition(spark, sf_dir):
    from i2mapreduce_spark.queries.pipelines import q_pipeline_quality_gate

    rows = sorted(
        q_pipeline_quality_gate(spark, sf_dir).collect(), key=lambda r: r.stage
    )
    assert [r.stage for r in rows] == [0, 1, 2, 3, 4]
    passes = [r.n_pass for r in rows]
    assert passes == sorted(passes, reverse=True)  # monotone funnel
    assert passes[-1] > 0  # gates don't kill the corpus
    assert passes[-1] < passes[0]  # ...but do drop something
    for prev, cur in zip(rows, rows[1:]):
        assert cur.n_dropped == prev.n_pass - cur.n_pass
    # the language gate must drop the disallowed language's docs
    assert rows[3].n_dropped > 0


def test_percent_of_total_sums_to_100_per_region(spark, sf_dir):
    from i2mapreduce_spark.queries.windows_q import q_window_percent_of_total

    pdf = q_window_percent_of_total(spark, sf_dir).toPandas()
    assert len(pdf) == 25  # 25 nations
    for region, g in pdf.groupby("r_name"):
        assert abs(g.pct_of_region.sum() - 100.0) < 0.01
        ranks = sorted(g.rank_in_region)
        assert ranks == list(range(1, len(g) + 1))


def test_distributed_cache_lookup_is_map_side(spark, sf_dir):
    from i2mapreduce_spark.queries.mapred_q import (
        RETURNFLAG_DESC,
        q_mr_distributed_cache,
    )

    load_tables(spark, sf_dir)
    rows = q_mr_distributed_cache(spark, sf_dir).collect()
    assert {r.flag_desc for r in rows} == set(RETURNFLAG_DESC.values())
    assert sum(r.n_lines for r in rows) == spark.table("lineitem").count()
    # side-data enrichment must not introduce a join or exchange before
    # the aggregate's own shuffle: exactly one Exchange node (formatted
    # explain prints each node twice — tree line + detail block)
    plan = _plan(q_mr_distributed_cache(spark, sf_dir))
    assert plan.count("Exchange") <= 2 and "Join" not in plan, plan


def test_total_order_sort_matches_global_window_rank(spark, sf_dir):
    from pyspark.sql import Window

    from i2mapreduce_spark.queries.mapred_q import q_mr_total_order_sort

    load_tables(spark, sf_dir)
    got = sorted(
        (r.rnk, r.l_orderkey, r.l_linenumber)
        for r in q_mr_total_order_sort(spark, sf_dir).collect()
    )
    li = spark.table("lineitem").select("l_orderkey", "l_linenumber")
    w = Window.orderBy("l_orderkey", "l_linenumber")
    want = sorted(
        (r.rnk, r.l_orderkey, r.l_linenumber)
        for r in li.withColumn("rnk", F.row_number().over(w))
        .filter((F.col("rnk") - 1) % 2500 == 0)
        .collect()
    )
    assert got == want
    # and the production path must NOT be the single-partition window
    plan = _plan(q_mr_total_order_sort(spark, sf_dir))
    for line in plan.splitlines():
        if "row_number()" in line and "Arguments" in line:
            assert "_pid" in line, f"unpartitioned rank window: {line}"


def test_bitmap_distinct_equals_exact_count_distinct(spark, sf_dir):
    from i2mapreduce_spark.queries.aggregates import q_agg_bitmap_distinct

    load_tables(spark, sf_dir)
    got = {
        r.l_returnflag: r.n_distinct_orders
        for r in q_agg_bitmap_distinct(spark, sf_dir).collect()
    }
    want = {
        r.l_returnflag: r.n
        for r in spark.table("lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    assert got == want  # bitmap counting is EXACT, not approximate


def test_stream_windowed_topk_ranks_within_each_window(spark, sf_dir):
    from i2mapreduce_spark.queries.streaming_q import (
        STREAM_TOPK,
        q_stream_windowed_topk,
    )

    pdf = q_stream_windowed_topk(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    for ws, g in pdf.groupby("ws"):
        ranks = sorted(g["rank"])
        assert ranks == list(range(1, len(g) + 1))
        assert len(g) <= STREAM_TOPK
        # counts non-increasing along the rank order
        ordered = g.sort_values("rank")["n"].tolist()
        assert ordered == sorted(ordered, reverse=True)


def test_dynamic_overwrite_touches_only_its_partitions(spark, sf_dir):
    from i2mapreduce_spark.queries.scans import q_sink_dynamic_partition_overwrite

    load_tables(spark, sf_dir)
    got = {
        r.o_orderstatus: (r.n, r.total)
        for r in q_sink_dynamic_partition_overwrite(spark, sf_dir).collect()
    }
    base = {
        r.o_orderstatus: (r.n, r.total)
        for r in spark.table("orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .collect()
    }
    assert set(got) == set(base)
    for status, (n, total) in base.items():
        gn, gtotal = got[status]
        assert gn == n  # row counts survive everywhere
        if status == "F":
            assert abs(gtotal - round(total * 2, 2)) < 0.05  # repriced
        else:
            assert gtotal == total  # sibling partitions untouched
    # the overwrite-mode conf must be restored afterward
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        != "dynamic"
    )


def test_aes_roundtrip_is_lossless_and_really_encrypts(spark, sf_dir):
    from i2mapreduce_spark.queries.scalar_fns import AES_KEY, q_fn_aes_roundtrip

    load_tables(spark, sf_dir)
    rows = q_fn_aes_roundtrip(spark, sf_dir).collect()
    names = {
        r.c_custkey: r.c_name for r in spark.table("customer").collect()
    }
    for r in rows:
        assert r.name_roundtrip == names[r.c_custkey]  # lossless
        # GCM layout: IV(12) || ciphertext(plaintext len) || tag(16)
        assert r.cipher_len == len(r.name_roundtrip) + 28
    # ciphertext must differ from plaintext bytes (it IS encrypted)
    one = (
        spark.table("customer")
        .limit(1)
        .selectExpr(
            f"cast(aes_encrypt(cast(c_name AS BINARY), '{AES_KEY}', 'GCM', "
            "'DEFAULT', unhex('000102030405060708090a0b')) AS STRING) AS ct",
            "c_name",
        )
        .collect()[0]
    )
    assert one.ct != one.c_name
