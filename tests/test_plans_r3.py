"""Plan-shape assertions for round-3 operators: pin the physical
properties their 100 TB stories depend on (broadcast prefilters, per-key
partitioned windows, no accidental cartesian/global-sort)."""

from __future__ import annotations

from i2mapreduce_spark.catalog import load_tables
from tests.plan_util import plan_str as _plan


def test_prefilter_bitmap_broadcasts_both_stages(spark, sf_dir):
    """The bucket set AND the exact small side must broadcast — the fact
    table may never be the build side."""
    from i2mapreduce_spark.queries.joins import q_join_prefilter_bitmap

    plan = _plan(q_join_prefilter_bitmap(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_geo_radius_is_equi_join_on_cells(spark, sf_dir):
    """Grid binning must make the spatial join a plain equi-join —
    no BroadcastNestedLoopJoin / CartesianProduct fallback."""
    from i2mapreduce_spark.queries.joins import q_join_geo_radius

    plan = _plan(q_join_geo_radius(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_pack_sequences_window_is_per_source(spark, sf_dir):
    """The packing cumsum must partition by source (parallel shards), not
    run as one global window."""
    from i2mapreduce_spark.queries.pipelines import q_pipeline_pack_sequences

    plan = _plan(q_pipeline_pack_sequences(spark, sf_dir))
    # window spec carries the partition expression
    assert "source" in plan.split("Window")[1][:400], plan


def test_quantize_is_map_only(spark, sf_dir):
    """int8 quantization must not shuffle — array HOFs all run map-side
    (the self-join on vec_id collapses to scan-level projection)."""
    from i2mapreduce_spark.queries.llmops import q_embedding_quantize

    plan = _plan(q_embedding_quantize(spark, sf_dir))
    assert "BatchEvalPython" not in plan, plan
    assert "ArrowEvalPython" not in plan, plan


def test_heavy_hitters_recount_broadcasts_candidates(spark, sf_dir):
    from i2mapreduce_spark.queries.mapred_q import q_mr_heavy_hitters

    plan = _plan(q_mr_heavy_hitters(spark, sf_dir))
    assert "MapInPandas" in plan, plan           # the per-partition sketch
    assert "BroadcastHashJoin" in plan, plan     # candidates broadcast back
    assert "CartesianProduct" not in plan, plan


def test_inc_join_delta_merges_partials(spark, sf_dir):
    """The combine step must aggregate partials (HashAggregate above the
    union), and each contribution must aggregate before the merge."""
    from i2mapreduce_spark.queries.streaming_q import q_inc_join_delta

    plan = _plan(q_inc_join_delta(spark, sf_dir))
    assert "Union" in plan and "HashAggregate" in plan, plan


def test_dq_profile_single_aggregate_subtree(spark, sf_dir):
    """One scan + one aggregate chain — the profile must not re-scan per
    column (Expand handles the multi-distinct)."""
    from i2mapreduce_spark.queries.quality import q_dq_profile

    plan = _plan(q_dq_profile(spark, sf_dir))
    # count scan NODES in the tree section only (the formatted detail
    # section repeats each node name once more)
    tree = plan.split("(1)")[0]
    assert tree.count("Scan parquet") == 1, plan
    assert "Expand" in plan, plan
