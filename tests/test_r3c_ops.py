"""Semantic unit tests for the round-3c operators (bitmap-prefilter
join, geo-radius grid join, running distinct, PMI collocations,
small-file compaction).
"""

from __future__ import annotations

import glob
import tempfile

from pyspark.sql import functions as F

from i2mapreduce_spark.queries.joins import (
    GEO_RADIUS_KM,
    q_join_geo_radius,
    q_join_prefilter_bitmap,
)
from i2mapreduce_spark.queries.scans import (
    COMPACT_SMALL,
    COMPACT_TARGET,
    q_sink_compact_small_files,
)
from i2mapreduce_spark.queries.windows_q import q_window_running_distinct


def test_prefilter_bitmap_no_false_negatives(spark, sf_dir):
    """The prefiltered semi-join must return exactly the plain semi-join
    aggregate — the bucket filter may only drop non-matching rows."""
    got = {
        r.l_returnflag: (r.n, r.sum_qty)
        for r in q_join_prefilter_bitmap(spark, sf_dir).collect()
    }
    li, s = spark.table("lineitem"), spark.table("supplier")
    plain = (
        li.join(
            s.filter(F.col("s_nationkey") < 5).select("s_suppkey"),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
    )
    want = {r.l_returnflag: (r.n, r.q) for r in plain.collect()}
    assert got == want


def test_geo_radius_grid_equals_bruteforce(spark, sf_dir):
    """The 3x3-cell candidate search must find EXACTLY the brute-force
    pair set — the cell geometry proof, checked empirically."""
    from i2mapreduce_spark.queries.joins import _geo_points, _haversine_km

    grid = {
        (r.c1, r.c2) for r in q_join_geo_radius(spark, sf_dir).collect()
    }
    p = _geo_points(spark)
    a = p.select(
        F.col("c_custkey").alias("c1"), F.col("lat").alias("lat1"), F.col("lon").alias("lon1")
    )
    b = p.select(
        F.col("c_custkey").alias("c2"), F.col("lat").alias("lat2"), F.col("lon").alias("lon2")
    )
    brute = (
        a.crossJoin(b)
        .filter(F.col("c1") < F.col("c2"))
        .withColumn(
            "d", _haversine_km(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2"))
        )
        .filter(F.col("d") <= GEO_RADIUS_KM)
    )
    want = {(r.c1, r.c2) for r in brute.collect()}
    assert grid == want and len(grid) > 0


def test_running_distinct_final_equals_total(spark, sf_dir):
    """The last running value per supplier must equal that supplier's
    total distinct part count."""
    out = q_window_running_distinct(spark, sf_dir)
    last = (
        out.groupBy("l_suppkey")
        .agg(F.max("n_distinct_parts").alias("run_max"))
    )
    truth = (
        spark.table("lineitem")
        .groupBy("l_suppkey")
        .agg(F.count_distinct("l_partkey").alias("nd"))
    )
    joined = last.join(truth, "l_suppkey")
    bad = joined.filter(F.col("run_max") != F.col("nd")).count()
    assert bad == 0


def test_pmi_prefers_fixed_phrases(spark, sf_dir):
    """PMI must rank a bigram higher than chance co-occurrence would:
    every reported PMI uses exact counts, so recompute a few by hand."""
    import math

    from i2mapreduce_spark.queries.llmops import q_text_collocations_pmi

    pdf = q_text_collocations_pmi(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    toks = (
        spark.table("documents")
        .select("doc_id", F.posexplode(F.filter(F.split("text", " "), lambda x: x != "")).alias("p", "w"))
    )
    uni = {r.w: r.c for r in toks.groupBy("w").agg(F.count("*").alias("c")).collect()}
    n = sum(uni.values())
    nb = toks.groupBy("doc_id").agg((F.count("*") - 1).alias("x")).agg(F.sum("x")).collect()[0][0]
    for _, r in pdf.head(3).iterrows():
        a, b = r.bigram.split(" ")
        expect = math.log2((r.c_ab / nb) / ((uni[a] / n) * (uni[b] / n)))
        assert abs(r.pmi - round(expect, 4)) < 1e-6


def test_compaction_reduces_file_count(spark, sf_dir):
    """Compaction must actually collapse the file count while preserving
    values (value preservation is the oracle's job; file count is ours)."""
    root = tempfile.mkdtemp(prefix="i2mr_compact_test_")
    o = spark.table("orders") if spark.catalog.tableExists("orders") else None
    from i2mapreduce_spark.catalog import load_tables

    load_tables(spark, sf_dir)
    spark.table("orders").repartition(COMPACT_SMALL).write.mode("overwrite").parquet(
        f"{root}/splintered"
    )
    n_small = len(glob.glob(f"{root}/splintered/part-*.parquet"))
    spark.read.parquet(f"{root}/splintered").repartition(COMPACT_TARGET).write.mode(
        "overwrite"
    ).parquet(f"{root}/compacted")
    n_big = len(glob.glob(f"{root}/compacted/part-*.parquet"))
    assert n_small == COMPACT_SMALL
    assert n_big == COMPACT_TARGET
    # and the query itself runs green end-to-end
    assert q_sink_compact_small_files(spark, sf_dir).count() == 5
