"""Regression test for the round-7 headline scale find: localCheckpoint
carries the pre-checkpoint plan's estimated Statistics onto the
LogicalRDD, and size-only join estimation MULTIPLIES child estimates —
so a loop that joins its state against itself squares the carried
estimate every iteration (measured 44 -> 9,915 bits of sizeInBytes in
8 CC iterations; per-iteration wall doubled past iter ~17 with the
driver serialized in BigInteger arithmetic).  checkpoint_without_stats
rebuilds the LogicalRDD with originStats=None; this test pins that the
estimate stays bounded across iterations."""

from __future__ import annotations

from pyspark.sql import functions as F

from i2mapreduce_spark.plans.iterate import checkpoint_without_stats, iterate


def _stats_bits(df) -> int:
    sz = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    return int(sz).bit_length()


def test_checkpoint_without_stats_resets_estimate(spark):
    df = spark.range(64).withColumn("v", F.col("id") % 7)
    j = df.alias("a").join(df.alias("b"), "id").join(df.alias("c"), "id")
    reset = checkpoint_without_stats(j)
    assert reset.count() == 64
    # the reset estimate is the BOUNDED default (<= 64-bit), independent
    # of how deep the pre-checkpoint plan was; the plain checkpoint's
    # carried estimate compounds with plan depth (see the iterate test)
    assert _stats_bits(reset) <= 64
    assert reset._jdf.queryExecution().analyzed().getClass().getSimpleName() == "LogicalRDD"


def test_iterate_keeps_stats_bounded_across_iterations(spark):
    edges = spark.range(200).select(
        F.col("id").alias("src"), ((F.col("id") + 1) % 200).alias("dst")
    ).localCheckpoint(eager=True)

    def step(state, _i):
        # join the state TWICE per iteration — the squaring shape
        msgs = state.alias("s").join(
            edges.alias("e"), F.col("s.node") == F.col("e.src")
        ).select(F.col("e.dst").alias("node"), F.col("s.val").alias("m"))
        agg = msgs.groupBy("node").agg(F.min("m").alias("m"))
        prop = state.alias("s").join(agg, "node", "left").select(
            "node", F.least(F.col("s.val"), F.coalesce("m", F.col("s.val"))).alias("val")
        )
        lut = prop.select(F.col("node").alias("l"), F.col("val").alias("lv"))
        return prop.alias("p").join(
            lut, F.col("p.val") == F.col("l"), "left"
        ).select("node", F.coalesce("lv", F.col("p.val")).alias("val"))

    state0 = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "val", F.col("node")
    )
    res = iterate(state0, step, max_iters=6, checkpoint_every=1)
    assert res.state.count() == 200
    # without the reset this is >1,200 bits by iteration 6 (doubles per
    # round from ~44); with it the estimate stays a sane 64-bit-ish size
    assert _stats_bits(res.state) < 128
