"""Plan-shape assertions (SURVEY §5.3): pin the physical properties the
100TB design depends on — pushdown, pruning, broadcast choice, partial
aggregation, codegen.  A regression here is a performance bug even when
results stay correct.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from i2mapreduce_spark.catalog import load_tables


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_filter_pushdown_reaches_parquet(spark, sf_dir):
    load_tables(spark, sf_dir)
    df = spark.table("orders").filter(F.col("o_totalprice") > 400000)
    plan = _plan(df)
    assert "PushedFilters" in plan and "o_totalprice" in plan.split("PushedFilters")[1][:200], plan


def test_column_pruning_reaches_parquet(spark, sf_dir):
    load_tables(spark, sf_dir)
    df = spark.table("lineitem").select("l_orderkey", "l_quantity")
    plan = _plan(df)
    read_schema = plan.split("ReadSchema")[1][:200]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema, "scan reads un-projected columns"


def test_small_dim_join_broadcasts(spark, sf_dir):
    load_tables(spark, sf_dir)
    n, r = spark.table("nation"), spark.table("region")
    df = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    assert "BroadcastHashJoin" in _plan(df)


def test_groupby_has_partial_agg(spark, sf_dir):
    """Map-side combine (ref op A2) must appear as a partial HashAggregate
    before the exchange."""
    load_tables(spark, sf_dir)
    df = spark.table("lineitem").groupBy("l_returnflag").agg(F.sum("l_quantity"))
    plan = _plan(df)
    assert plan.count("HashAggregate") >= 2, plan
    assert "Exchange" in plan


def test_whole_stage_codegen_active(spark, sf_dir):
    load_tables(spark, sf_dir)
    df = spark.table("lineitem").withColumn(
        "np", F.col("l_extendedprice") * (1 - F.col("l_discount"))
    )
    plan = _plan(df)
    # formatted mode annotates codegen stages as "[codegen id : N]"
    assert "WholeStageCodegen" in plan or "codegen id" in plan, plan


def test_topn_uses_take_ordered(spark, sf_dir):
    """orderBy().limit(n) must not globally sort (TakeOrderedAndProject)."""
    load_tables(spark, sf_dir)
    df = spark.table("orders").orderBy(F.col("o_totalprice").desc()).limit(10)
    assert "TakeOrderedAndProject" in _plan(df)
