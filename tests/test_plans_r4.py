"""Round-4 plan-hygiene asserts.

Two repo-wide scale guards added after the round-3 review:

1. every explicit ``F.broadcast(...)`` hint must sit on a PROVABLY
   BOUNDED table (dims, 1-row aggregates, k-row candidate sets) — a
   forced broadcast of a data-derived table is the one class of plan bug
   that turns into an executor OOM only at full scale, invisible to
   row-count correctness;
2. the Gini query (total order over base-table cardinality) must not
   plan an unpartitioned window — its global rank comes from the
   chunked-offset construction instead.
"""

from __future__ import annotations

import ast
import pathlib

from pyspark.sql import functions as F

from i2mapreduce_spark.catalog import load_tables

PKG = pathlib.Path(__file__).resolve().parents[1] / "i2mapreduce_spark"


def _broadcast_sites() -> set[tuple[str, str]]:
    """(module-relative-path, enclosing def name) for every F.broadcast
    call in non-test source, via AST (no false hits from docstrings)."""
    sites = set()
    for py in sorted(PKG.rglob("*.py")):
        tree = ast.parse(py.read_text(), filename=str(py))
        rel = str(py.relative_to(PKG.parent))

        def walk(node, fn_name):
            for child in ast.iter_child_nodes(node):
                name = fn_name
                if isinstance(child, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    name = child.name
                if (
                    isinstance(child, ast.Call)
                    and isinstance(child.func, ast.Attribute)
                    and child.func.attr == "broadcast"
                    and isinstance(child.func.value, ast.Name)
                    and child.func.value.id == "F"
                ):
                    sites.add((rel, fn_name))
                walk(child, name)

        walk(tree, "<module>")
    return sites


#: every approved forced-broadcast site, with why the build side is
#: bounded.  Adding a NEW F.broadcast hint fails this test until the
#: bound is argued here — that is the point.
APPROVED_BROADCASTS = {
    # 1-row global aggregates
    ("i2mapreduce_spark/operators/algorithms.py", "_l1_normalize"),  # sum total
    ("i2mapreduce_spark/queries/llmops.py", "q_text_tfidf_top_terms"),  # corpus size
    ("i2mapreduce_spark/queries/llmops.py", "q_text_collocations_pmi"),  # 2 totals
    ("i2mapreduce_spark/queries/mapred_q.py", "q_mr_heavy_hitters"),  # total + <=k*parts candidates
    ("i2mapreduce_spark/queries/quality.py", "q_dq_drift_psi"),  # 1-row min/max range
    ("i2mapreduce_spark/queries/quality.py", "q_dq_iqr_outliers"),  # per-event-type quantile fences: cardinality = #distinct event types (enum-like, 6 at any SF)
    ("i2mapreduce_spark/queries/tpch_q.py", "q_agg_part_concentration"),  # 1-row global total
    ("i2mapreduce_spark/queries/iterative.py", "q_iter_markov_walk"),  # 1-row frontier
    # fixed-size dimension tables (nation=25, region=5, supplier dim)
    ("i2mapreduce_spark/queries/aggregates.py", "q_agg_having"),  # nation dim
    ("i2mapreduce_spark/queries/aggregates.py", "q_agg_rollup"),
    ("i2mapreduce_spark/queries/aggregates.py", "q_agg_skew_kurt"),  # 3-row per-flag stats
    ("i2mapreduce_spark/queries/joins.py", "q_join_broadcast"),  # region dim (the declared surface)
    ("i2mapreduce_spark/queries/joins.py", "q_join_multiway"),  # nation+region dims
    ("i2mapreduce_spark/queries/joins.py", "q_join_skew_salted"),  # SALT_BUCKETS-row range
    ("i2mapreduce_spark/queries/joins.py", "q_join_prefilter_bitmap"),  # <=4096 buckets + supplier dim
    ("i2mapreduce_spark/queries/tpch_q.py", "q_agg_local_supplier_volume"),  # region-filtered nation dim (<=25)
    ("i2mapreduce_spark/queries/tpch_q.py", "q_agg_market_share"),  # nation dim (25)
    ("i2mapreduce_spark/queries/tpch_q.py", "q_join_top_supplier"),  # 1-row global max
    ("i2mapreduce_spark/queries/tpch_q.py", "q_join_nation_trade_volume"),  # 2-nation dim slices
    ("i2mapreduce_spark/queries/tpch_q.py", "q_agg_returned_revenue"),  # nation dim (25)
    ("i2mapreduce_spark/queries/tpch_q.py", "q_join_untapped_customers"),  # 1-row global avg
    ("i2mapreduce_spark/queries/tpch_q.py", "q_join_min_cost_supplier"),  # nation dim (25) only; part/supplier hints dropped in r6
    ("i2mapreduce_spark/queries/tpch_q.py", "q_agg_product_profit"),  # nation dim (25) only
    ("i2mapreduce_spark/queries/tpch_q.py", "q_join_potential_promotion"),  # nation dim (25) only
    ("i2mapreduce_spark/queries/windows_q.py", "q_window_percent_of_total"),  # nation+region dims
    # k-bounded candidate / block tables
    # (similarity.py's block-pair broadcast removed r11: the single-frame
    #  exploded feed has no join, hence no hint — see _block_pair_grouped)
    ("i2mapreduce_spark/queries/r6_ops.py", "q_sim_mmr_rerank"),  # fixed MMR_N_QUERIES=20-row query block
    ("i2mapreduce_spark/queries/r6b_ops.py", "q_text_ngram_coverage"),  # 1-row global bigram total
    ("i2mapreduce_spark/queries/r6b_ops.py", "q_agg_ks_test"),  # 1-row (n1, n2) totals
    ("i2mapreduce_spark/queries/r6c_ops.py", "q_ts_burst_days"),  # per-event-type moment rows: cardinality = #distinct event types (enum-like, ~6 at any SF)
    ("i2mapreduce_spark/queries/r6d_ops.py", "q_agg_decile_lift"),  # 1-row (n, total) aggregate
    ("i2mapreduce_spark/queries/r6d_ops.py", "q_pipeline_curriculum"),  # 1-row corpus count
    ("i2mapreduce_spark/queries/r6f_ops.py", "q_text_js_divergence"),  # 1-row (na, nb) totals
    ("i2mapreduce_spark/queries/r6j_ops.py", "q_agg_rfm_segments"),  # 1-row max-date/count/total aggregates
    ("i2mapreduce_spark/queries/r6l_ops.py", "q_agg_pareto_concentration"),  # 1-row (n,total) + 1-row top-decile aggregates
    ("i2mapreduce_spark/queries/r6m_ops.py", "q_text_bpe_merge_pairs"),  # 1-row global pair-count total
    ("i2mapreduce_spark/queries/r6n_ops.py", "q_dq_k_anonymity"),  # 1-row class-size total
    ("i2mapreduce_spark/queries/r6n_ops.py", "q_pipeline_target_encode"),  # 1-row (n_g, pos_g) global label moments
    ("i2mapreduce_spark/queries/r6o_ops.py", "q_iter_als_topitems"),  # LIMIT ALS_ITEMS=64 item spine (bounded by construction)
    ("i2mapreduce_spark/queries/r6q_ops.py", "q_dq_freshness"),  # 1-row global max-timestamp
    ("i2mapreduce_spark/queries/r6q_ops.py", "q_agg_survival_km"),  # 1-row dataset edge + 1-row customer total
    ("i2mapreduce_spark/queries/r6q_ops.py", "q_agg_bootstrap_ci"),  # 1-row point estimate
    ("i2mapreduce_spark/queries/r6q_ops.py", "q_ts_runs_test"),  # 1-row x2-cent median
    ("i2mapreduce_spark/queries/r6t_ops.py", "q_ts_theil_sen"),  # 1-row (n_pairs, n_days) totals
    ("i2mapreduce_spark/queries/r6w_ops.py", "q_agg_winsorized_mean"),  # 1-row count + 1-row (lo, hi) boundary pair
    ("i2mapreduce_spark/queries/r6y_ops.py", "q_agg_cuped_adjustment"),  # 1-row pooled moment aggregate
    ("i2mapreduce_spark/queries/r7a_ops.py", "q_agg_cvar_expected_shortfall"),  # 1-row count
    ("i2mapreduce_spark/queries/r7c_ops.py", "q_agg_abc_classification"),  # 1-row global total
    ("i2mapreduce_spark/queries/r7c_ops.py", "q_fn_holiday_observed"),  # 21-row literal holiday spine (7 years x 3 holidays)
    ("i2mapreduce_spark/queries/r7d_ops.py", "q_sample_neyman_allocation"),  # 1-row weight total
    ("i2mapreduce_spark/queries/r7f_ops.py", "q_agg_eb_beta_binomial"),  # 1-row (alpha, beta) prior
    ("i2mapreduce_spark/queries/r7h_ops.py", "q_agg_hhi_concentration"),  # nation dim (25)
    ("i2mapreduce_spark/queries/r7j_ops.py", "q_sample_balanced_downsample"),  # 1-row min class count
    ("i2mapreduce_spark/queries/r7r_ops.py", "q_window_control_chart"),  # 1-row frozen baseline moments
    ("i2mapreduce_spark/queries/r7k_ops.py", "q_agg_gini_by_segment"),  # 1-row global minimum
    ("i2mapreduce_spark/queries/r7l_ops.py", "q_agg_calibration_table"),  # 1-row row count
    ("i2mapreduce_spark/queries/r7l_ops.py", "q_agg_precision_at_k"),  # 1-row total positives
    ("i2mapreduce_spark/queries/r7m_ops.py", "q_agg_jackknife_se"),  # 1-row totals (twice)
    ("i2mapreduce_spark/queries/r7m_ops.py", "q_text_bpe_apply"),  # BPE_MERGES=20-entry merge list
    ("i2mapreduce_spark/queries/r7n_ops.py", "q_agg_brier_score"),  # 1-row row count
    ("i2mapreduce_spark/queries/r7o_ops.py", "q_agg_ece"),  # 1-row row count
    ("i2mapreduce_spark/queries/r7o_ops.py", "q_pipeline_interleave_order"),  # source-enum sizes + 1-row total
    ("i2mapreduce_spark/queries/r7o_ops.py", "q_window_longest_streak"),  # 1-row final-day scalar
    ("i2mapreduce_spark/queries/r7p_ops.py", "q_dq_catalog_census"),  # 1-row grand total
    ("i2mapreduce_spark/queries/r7s_ops.py", "q_agg_durbin_watson"),  # 1-row OLS moments
    ("i2mapreduce_spark/queries/r7t_ops.py", "q_agg_revenue_bridge"),  # 1-row absolute-delta total
    ("i2mapreduce_spark/queries/r7u_ops.py", "q_window_underwater_duration"),  # 1-row final-day scalar
    ("i2mapreduce_spark/queries/r7u_ops.py", "q_text_oov_rate"),  # 1-row split cut-off
    ("i2mapreduce_spark/queries/r7v_ops.py", "q_agg_cr4_concentration"),  # nation dim (25)
    ("i2mapreduce_spark/queries/r7w_ops.py", "q_join_basket_overlap"),  # nation dim + 25-row size tables
    ("i2mapreduce_spark/queries/r7w_ops.py", "q_dq_shard_balance"),  # 1-row (total, k) aggregate
    # eval-suite-sized by nature (benchmark contamination set, KBs-MBs)
    ("i2mapreduce_spark/queries/pipelines.py", "q_pipeline_decontaminate"),
}


def test_every_forced_broadcast_is_on_a_bounded_table():
    found = _broadcast_sites()
    new = found - APPROVED_BROADCASTS
    gone = APPROVED_BROADCASTS - found
    assert not new, (
        "unreviewed F.broadcast hint(s) — argue the build-side bound in "
        f"APPROVED_BROADCASTS or drop the hint: {sorted(new)}"
    )
    assert not gone, f"stale whitelist entries: {sorted(gone)}"


def test_gini_rank_is_distributed(spark, sf_dir):
    """agg_gini must not fall back to a single-partition global window:
    every Window node in its plan carries a partition spec (_pid), and
    the range-partitioned rank machinery is present."""
    from i2mapreduce_spark.queries.aggregates import q_agg_gini

    load_tables(spark, sf_dir)
    df = q_agg_gini(spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    for line in plan.splitlines():
        # formatted explain prints window args as
        #   Arguments: [fns], [partition spec], [order spec]
        if "row_number()" in line and "Arguments" in line:
            assert "_pid" in line, f"unpartitioned rank window: {line}"


def test_global_row_number_matches_global_window(spark, sf_dir):
    """The chunked-offset rank is bit-identical to row_number() over a
    global ORDER BY for a unique total order."""
    from pyspark.sql import Window

    from i2mapreduce_spark.operators.ranking import global_row_number

    load_tables(spark, sf_dir)
    rev = (
        spark.table("orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("x"))
    )
    got = (
        global_row_number(rev, ["x", "o_custkey"], out_col="i")
        .orderBy("i")
        .select("o_custkey", "i")
        .collect()
    )
    want = (
        rev.select(
            "o_custkey",
            F.row_number().over(Window.orderBy("x", "o_custkey")).alias("i"),
        )
        .orderBy("i")
        .collect()
    )
    assert got == want
