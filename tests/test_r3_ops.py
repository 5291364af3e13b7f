"""Semantic unit tests for the round-3 operators, on handmade inputs
(the oracle-parity suite covers them against DuckDB on the fixtures;
these pin the intended behavior on cases small enough to verify by hand).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from i2mapreduce_spark.operators import algorithms


def test_label_propagation_majority_and_ties(spark):
    # star: node 0 has neighbors 1,2,3 labeled 1,1,2 -> majority label 1.
    # node 4 is isolated (no in-edges) -> keeps its own label 3.
    edges = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (0, 1), (0, 2), (0, 3)], "src long, dst long"
    )
    labels0 = spark.createDataFrame(
        [(0, 0), (1, 1), (2, 1), (3, 2), (4, 3)], "node long, label long"
    )
    out = dict(
        algorithms.label_propagation(edges, labels0, iters=1)
        .collect()
    )
    assert out[0] == 1          # majority of {1,1,2}
    assert out[4] == 3          # isolated keeps its label
    # ties break toward the SMALLEST label: two neighbors, labels {0, 2}
    edges2 = spark.createDataFrame([(1, 9), (2, 9)], "src long, dst long")
    labels2 = spark.createDataFrame(
        [(9, 5), (1, 2), (2, 0)], "node long, label long"
    )
    out2 = dict(algorithms.label_propagation(edges2, labels2, iters=1).collect())
    assert out2[9] == 0


def test_funnel_stage_semantics(spark, sf_dir):
    """Stage is the longest ORDERED prefix: a click before the first view
    must not count, and every staged timestamp is strictly increasing."""
    from i2mapreduce_spark.queries.windows_q import q_window_funnel_stages

    rows = q_window_funnel_stages(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.stage == 1 + (r.t_click is not None) + (r.t_purchase is not None)
        if r.t_click is not None:
            assert r.t_click > r.t_view
        if r.t_purchase is not None:
            assert r.t_purchase > r.t_click


def test_scd2_intervals_partition_time(spark, sf_dir):
    """Per user: exactly one current row, intervals chain exactly
    (valid_to == next valid_from), and n_events sums to the user's
    event count."""
    from i2mapreduce_spark.queries.streaming_q import q_stream_scd2_compact

    pdf = q_stream_scd2_compact(spark, sf_dir).toPandas()
    ev = spark.table("events").groupBy("user_id").count().toPandas()
    ev_counts = dict(zip(ev.user_id, ev["count"]))
    for uid, grp in pdf.groupby("user_id"):
        grp = grp.sort_values("valid_from")
        assert int(grp.is_current.sum()) == 1
        assert grp.iloc[-1].is_current  # the last interval is the open one
        starts = grp.valid_from.tolist()
        ends = grp.valid_to.tolist()
        assert ends[:-1] == starts[1:]
        assert grp.n_events.sum() == ev_counts[uid]


def test_entropy_uniform_doc(spark):
    """A doc of n distinct tokens has entropy exactly log2(n)."""
    from i2mapreduce_spark.catalog import configure_session

    configure_session(spark)
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "x x x x")], "doc_id long, text string"
    )
    df.createOrReplaceTempView("ent_docs")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    cnt = (
        df.select("doc_id", F.explode(toks).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
    )
    from pyspark.sql import Window

    tot = cnt.withColumn("tot", F.sum("c").over(Window.partitionBy("doc_id")))
    p = F.col("c").cast("double") / F.col("tot")
    ent = dict(
        tot.groupBy("doc_id")
        .agg(F.round(-F.sum(p * F.log2(p)), 4).alias("h"))
        .collect()
    )
    assert math.isclose(ent[1], 2.0)   # 4 distinct tokens -> log2(4)
    assert ent[2] == 0.0               # constant doc -> zero entropy
