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


def test_ckpt_level_env_sets_serialized_storage_and_identical_results(
    spark, monkeypatch
):
    """$I2MR_CKPT_LEVEL reroutes EVERY loop checkpoint to the named
    pyspark StorageLevel (the sf100 local[8]x8g legs run serialized
    MEMORY_AND_DISK: deserialized object-vector unrolls OOM an 8 GiB
    real-executor heap, chunked serialized unrolls degrade to disk) —
    and the level is storage-only: results stay identical."""
    from i2mapreduce_spark.operators.algorithms import scc

    edges = spark.createDataFrame(
        # two 3-cycles bridged by a DAG path + a pendant trim target
        [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 6), (6, 4),
         (6, 7)],
        "src long, dst long",
    )
    monkeypatch.delenv("I2MR_CKPT_LEVEL", raising=False)
    base = {(r["node"], r["scc"]) for r in scc(edges).collect()}

    monkeypatch.setenv("I2MR_CKPT_LEVEL", "MEMORY_AND_DISK")
    ck = checkpoint_without_stats(spark.range(32).selectExpr("id", "id % 3 v"))
    lvl = ck._jdf.queryExecution().analyzed().rdd().getStorageLevel()
    assert not lvl.deserialized() and lvl.useDisk() and lvl.useMemory()

    ser = {(r["node"], r["scc"]) for r in scc(edges).collect()}
    assert ser == base
    # released superseded edge checkpoints must not be needed again: a
    # SECOND full read of the returned frame still works
    assert len(ser) == 8
