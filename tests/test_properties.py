"""Property tests (SURVEY §5.3): cheap cross-operator invariants at
sf0.001.  These catch semantic regressions the oracle comparison can't —
e.g. a filter that silently drops NULL-adjacent rows still hash-matches
an oracle making the same mistake.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from i2mapreduce_spark.catalog import load_tables
from i2mapreduce_spark.operators import dedup
from i2mapreduce_spark.queries import build_registry

QUERIES, _ = build_registry()


def test_filter_partitions_table(spark, sf_dir):
    """filter(p) ∪ filter(¬p) must partition the table exactly (no NULLs
    in o_totalprice per fixtures — the complement is total)."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    p = F.col("o_totalprice") > 200000
    n_p, n_not_p, n = o.filter(p).count(), o.filter(~p).count(), o.count()
    assert n_p + n_not_p == n
    assert n_p > 0 and n_not_p > 0, "degenerate predicate tests nothing"


def test_inner_join_subset_of_left(spark, sf_dir):
    load_tables(spark, sf_dir)
    c, o = spark.table("customer"), spark.table("orders")
    inner = c.join(o, c.c_custkey == o.o_custkey).count()
    left = c.join(o, c.c_custkey == o.o_custkey, "left").count()
    assert inner <= left


def test_rollup_total_row_equals_global_agg(spark, sf_dir):
    load_tables(spark, sf_dir)
    cust = spark.table("customer")
    rolled = (
        cust.rollup("c_mktsegment")
        .agg(F.count("*").alias("n"))
        .filter(F.col("c_mktsegment").isNull())
        .collect()
    )
    assert len(rolled) == 1 and rolled[0].n == cust.count()


def test_topk_per_group_bounded(spark, sf_dir):
    load_tables(spark, sf_dir)
    df = QUERIES["window_topk_per_group"](spark, sf_dir)
    k, groups = 3, df.select("o_custkey").distinct().count()
    assert df.count() <= k * groups
    per_group = df.groupBy("o_custkey").count().agg(F.max("count")).collect()[0][0]
    assert per_group <= k


def test_cosine_sims_bounded_and_self_similarity(spark, sf_dir):
    load_tables(spark, sf_dir)
    df = QUERIES["sim_topk_cosine"](spark, sf_dir)
    bounds = df.agg(F.min("sim"), F.max("sim")).collect()[0]
    assert -1.0 <= bounds[0] and bounds[1] <= 1.0
    # kernel sanity: a vector against itself scores exactly 1
    from i2mapreduce_spark.operators.similarity import cosine_topk

    emb = spark.table("embeddings").limit(1)
    clone = emb.withColumn("vec_id", F.col("vec_id") + 1)
    pair = cosine_topk(spark, emb.unionAll(clone), k=1).collect()
    assert len(pair) == 1 and abs(pair[0].sim - 1.0) < 1e-9


def test_dedup_idempotent(spark, sf_dir):
    """Dedup of a deduped set is the identity: every group size 1."""
    load_tables(spark, sf_dir)
    d = spark.table("documents")
    once = dedup.exact_dedup_keys(d.unionAll(d))
    assert once.filter(F.col("n") != 2).count() == 0
    kept = d.join(
        once.select(F.col("keep_id").alias("doc_id")), "doc_id", "left_semi"
    )
    twice = dedup.exact_dedup_keys(kept)
    assert twice.filter(F.col("n") != 1).count() == 0
    assert twice.count() == once.count()


def test_union_distinct_consistent_with_union_all(spark, sf_dir):
    load_tables(spark, sf_dir)
    ua = QUERIES["setop_union_all"](spark, sf_dir)
    ud = QUERIES["setop_union_distinct"](spark, sf_dir)
    assert ud.count() == ua.distinct().count()


def test_bag_setops_partition_multiplicities(spark, sf_dir):
    """Bag algebra: per key, |INTERSECT ALL| = min(l,r) and
    |EXCEPT ALL| = max(l-r, 0); together they partition the left bag."""
    load_tables(spark, sf_dir)
    ia = QUERIES["setop_intersect_all"](spark, sf_dir).groupBy("nationkey").count()
    ea = QUERIES["setop_except_all"](spark, sf_dir).groupBy("nationkey").count()
    l = (
        spark.table("customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("l"))
    )
    r = (
        spark.table("supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("r"))
    )
    joined = (
        l.join(r, "nationkey", "full_outer")
        .join(ia.withColumnRenamed("count", "ia"), "nationkey", "left")
        .join(ea.withColumnRenamed("count", "ea"), "nationkey", "left")
        .fillna(0)
    )
    bad = joined.filter(
        (F.col("ia") != F.least("l", "r"))
        | (F.col("ea") != F.greatest(F.col("l") - F.col("r"), F.lit(0)))
    )
    assert bad.count() == 0


def test_full_outer_covers_both_sides(spark, sf_dir):
    """FULL OUTER keys = left keys ∪ right keys, and per-side counts in
    the joined output match each side's own aggregation."""
    load_tables(spark, sf_dir)
    fo = QUERIES["join_full_outer"](spark, sf_dir)
    c_keys = {
        r.nationkey
        for r in spark.table("customer")
        .filter("c_nationkey <= 15")
        .select(F.col("c_nationkey").alias("nationkey"))
        .distinct()
        .collect()
    }
    s_keys = {
        r.nationkey
        for r in spark.table("supplier")
        .filter("s_nationkey >= 10")
        .select(F.col("s_nationkey").alias("nationkey"))
        .distinct()
        .collect()
    }
    rows = {r.nationkey: (r.n_cust, r.n_supp) for r in fo.collect()}
    assert set(rows) == c_keys | s_keys
    for k in c_keys - s_keys:
        assert rows[k][1] == 0
    for k in s_keys - c_keys:
        assert rows[k][0] == 0


def test_warmstart_state_matches_cold_fixpoint(spark, sf_dir):
    """Warm and cold starts must converge to the SAME fixpoint (the warm
    start saves iterations, never changes the answer)."""
    from i2mapreduce_spark.operators.algorithms import pagerank

    load_tables(spark, sf_dir)
    edges = spark.table("edges_cp")
    a = pagerank(spark, edges, iters=30, damping=0.5, tol=1e-9)
    b = pagerank(spark, edges, iters=30, damping=0.5, tol=1e-9, init_ranks=a.state)
    drift = (
        a.state.alias("a")
        .join(b.state.alias("b"), "node")
        .agg(F.max(F.abs(F.col("a.rank") - F.col("b.rank"))))
        .collect()[0][0]
    )
    assert drift < 1e-8
