"""Query registry: merges every group's QUERIES/ORACLES dicts.

Each group module exposes
  QUERIES: dict[key, callable(spark, sf_dir) -> DataFrame]
  ORACLES: dict[key, str]     # DuckDB-runnable ANSI SQL; omit => rows-only
Keys map 1:1 to SURVEY.md §2B.
"""

from __future__ import annotations

from importlib import import_module

_GROUP_MODULES = [
    "windows_q",    # W  — window functions
    "sorts",        # F  — sort / limit / top-k
    "setops",       # U  — set operations
    "scalar_fns",   # X  — scalar function surface
    "mapred_q",     # I  — MapReduce-core surface
    "udfs",         # V  — UDF / UDAF / UDTF surface
    "llmops",       # L  — LLM-data-pipeline operators
    "pipelines",    # L  — corpus-construction pipeline operators (r3)
    "iterative",    # J  — iterative algorithms
    "streaming_q",  # K  — incremental / streaming
    "scans",        # S  — scans / sources / sinks
    "projection",   # P  — projection / filter / predicates
    "joins",        # C  — join shapes
    "aggregates",   # D  — aggregation
    "quality",      # Q  — data-quality audits (r3)
    "timeseries",   # T  — time-series analytics (r3)
    "tpch_q",       # H  — TPC-H-shaped composite analytics (r4)
    "r6_ops",       # mixed groups — round-6 additions
    "r6b_ops",      # mixed groups — round-6 additions, batch 2 (graded r7)
    "r6c_ops",      # mixed groups — round-6 additions, batch 3 (graded r7)
    "r6d_ops",      # mixed groups — round-6 additions, batch 4 (graded r7)
    "r6e_ops",      # mixed groups — round-6 additions, batch 5 (graded r7)
    "r6f_ops",      # mixed groups — round-6 additions, batch 6 (graded r7)
    "r6g_ops",      # mixed groups — round-6 additions, batch 7 (graded r7)
    "r6h_ops",      # mixed groups — round-6 additions, batch 8 (graded r7)
    "r6i_ops",      # mixed groups — round-6 additions, batch 9 (graded r7)
    "r6j_ops",      # mixed groups — round-6 additions, batch 10 (graded r7)
    "r6k_ops",      # mixed groups — round-6 additions, batch 11 (graded r7)
    "r6l_ops",      # mixed groups — round-6 additions, batch 12 (graded r7)
    "r6m_ops",      # mixed groups — round-6 additions, batch 13 (graded r7)
    "r6n_ops",      # mixed groups — round-6 additions, batch 14 (graded r7)
    "r6o_ops",      # mixed groups — round-6 additions, batch 15 (graded r7)
    "r6p_ops",      # mixed groups — round-6 additions, batch 16 (graded r7)
    "r6q_ops",      # mixed groups — round-6 additions, batch 17 (graded r7)
    "r6r_ops",      # mixed groups — round-6 additions, batch 18 (graded r7)
    "r6s_ops",      # mixed groups — round-6 additions, batch 19 (graded r7)
    "r6t_ops",      # mixed groups — round-6 additions, batch 20 (graded r7)
    "r6u_ops",      # mixed groups — round-6 additions, batch 21 (graded r7)
    "r6v_ops",      # mixed groups — round-6 additions, batch 22 (graded r7)
    "r6w_ops",      # mixed groups — round-6 additions, batch 23 (graded r7)
    "r6x_ops",      # mixed groups — round-6 additions, batch 24 (graded r7)
    "r6y_ops",      # mixed groups — round-6 additions, batch 25 (graded r7)
    "r6z_ops",      # mixed groups — round-6 additions, batch 26 (graded r7)
    "r7a_ops",      # mixed groups — round-6 additions, batch 27 (graded r7)
    "r7b_ops",      # mixed groups — round-6 additions, batch 28 (graded r7)
    "r7c_ops",      # mixed groups — round-6 additions, batch 29 (graded r7)
    "r7d_ops",      # mixed groups — round-6 additions, batch 30 (graded r7)
    "r7e_ops",      # mixed groups — round-6 additions, batch 31 (graded r7)
    "r7f_ops",      # mixed groups — round-6 additions, batch 32 (graded r7)
    "r7g_ops",      # mixed groups — round-6 additions, batch 33 (graded r7)
    "r7h_ops",      # mixed groups — round-6 additions, batch 34 (graded r7)
    "r7i_ops",      # mixed groups — round-6 additions, batch 35 (graded r7)
    "r7j_ops",      # mixed groups — round-6 additions, batch 36 (graded r7)
    "r7k_ops",      # mixed groups — round-6 additions, batch 37 (graded r7)
    "r7l_ops",      # mixed groups — round-6 additions, batch 38 (graded r7)
    "r7m_ops",      # mixed groups — round-6 additions, batch 39 (graded r7)
    "r7n_ops",      # mixed groups — round-6 additions, batch 40 (graded r7)
    "r7o_ops",      # mixed groups — round-6 additions, batch 41 (graded r7)
    "r7p_ops",      # mixed groups — round-6 additions, batch 42 (graded r7)
    "r7q_ops",      # mixed groups — round-6 additions, batch 43 (graded r7)
    "r7r_ops",      # mixed groups — round-6 additions, batch 44 (graded r7)
    "r7s_ops",      # mixed groups — round-6 additions, batch 45 (graded r7)
    "r7t_ops",      # mixed groups — round-6 additions, batch 46 (graded r7)
    "r7u_ops",      # mixed groups — round-6 additions, batch 47 (graded r7)
    "r7v_ops",      # mixed groups — round-6 additions, batch 48 (graded r7)
    "r7w_ops",      # mixed groups — round-6 additions, batch 49 (graded r7)
]

# R7 HANDOFF: every key in modules r6m_ops..r7w_ops (the later-session
# round-6 batches) plus the r6_ops..r6l_ops keys NOT in _R6_WINDOW has
# no driver CORRECTNESS row yet — the r7 session should rebuild the
# window from (registry keys) - (CORRECTNESS_r01..r06 union), ordered by
# measured sf0.01 warm cost ascending, exactly as below.
#
# Round-6 final state (2026-08-15): 469 keys / 452 hash-checked; every
# key added this session was verified with tools/check_oracle.py at
# sf0.001 AND sf0.01 AND sf0.1 the day it landed (the cross-SF sweep is
# the cheapest way to catch BIGINT overflow and rounding-scale drift —
# it caught five such bugs this session).  Rows-only additions:
# iter_maximal_matching (property tests in tests/test_r6x_matching.py);
# the rest of the rows-only set is the pre-existing golden/recall keys.
# New cross-engine gotchas live at the bottom of
# .claude/skills/verify/SKILL.md — read them before writing any
# fold/round/product expression.
#
# Ordering note: the driver grades the FIRST 50 registry keys each round
# (r1-r5 each produced exactly-50-key CORRECTNESS files cut at the 50th
# key in registry order).  After r5 all 245 keys that existed at r4 HEAD
# have a green driver row (CORRECTNESS_r01-r05 union; agg_freq_items
# rows-only by design).  Round 6's window = the 34 keys that have never
# had a driver CORRECTNESS row (the 17 r5 additions + the 11 late-r5
# TPC-H shapes + the TA-window trio and mr_inverted_index/
# mr_matrix_multiply/pipeline_epoch_shuffle/inc_cc_delta) ordered by
# measured sf0.01 warm harness cost ascending, then every key ADDED in
# round 6 (16 free slots).  Keys past slot 50 get graded in r7.
_R6_WINDOW = [
    # -- cheap keys (<0.5 s warm each at sf0.01, measured 2026-08-14) --
    "agg_forecast_revenue",
    "agg_hll_union",
    "ts_seasonal_profile",
    "stream_left_outer_join",
    "agg_customer_distribution",
    "join_large_volume_customers",
    "agg_priority_lateness",
    "agg_bracket_revenue",
    "join_potential_promotion",
    "join_min_cost_supplier",
    "agg_part_concentration",
    "join_parts_supplier_counts",
    "ts_autocorr",
    "agg_small_qty_revenue",
    "agg_product_profit",
    "stream_dedup_watermark",
    "source_csv_malformed",
    "ts_ohlc_bars",
    "dq_iqr_outliers",
    "fn_try_arith",
    # -- 0.5-1.5 s --
    "mr_inverted_index",
    "window_interval_merge",
    "mr_matrix_multiply",
    "fn_variant_json",
    "window_rsi",
    "window_rolling_corr",
    "join_waiting_suppliers",
    "sink_time_travel",
    "window_bollinger",
    "mr_multiple_outputs",
    "pipeline_epoch_shuffle",
    # -- heavy (accumulator merge / delta warm-start / Boruvka loop) --
    "mr_counters",
    "inc_cc_delta",
    "iter_mst_forest",
    # -- round-6 additions (fill toward slot 50, cheap-first) --
    "fn_uuid_deterministic",
    "pipeline_importance_sample",
    "ts_gap_stats",
    "ts_cross_correlation",
    "ts_mann_kendall",
    "ts_cusum_changepoint",
    "window_donchian",
    "window_vwap",
    "agg_weighted_percentile",
    "fn_zorder_interleave",
    "text_vocab_growth",
    "embedding_matryoshka_truncate",
    "dedup_paragraph",
    "agg_count_min_sketch",
    "source_csv_multiline",
    "join_bloom_prefilter",
]


def build_registry() -> tuple[dict, dict]:
    queries: dict = {}
    oracles: dict = {}
    for mod_name in _GROUP_MODULES:
        mod = import_module(f"{__name__}.{mod_name}")
        for k, fn in getattr(mod, "QUERIES", {}).items():
            if k in queries:
                raise ValueError(f"duplicate query key: {k}")
            queries[k] = fn
        for k, sql in getattr(mod, "ORACLES", {}).items():
            if k not in getattr(mod, "QUERIES", {}):
                raise ValueError(f"oracle without query: {k}")
            oracles[k] = sql
    ordered: dict = {}
    for k in _R6_WINDOW:
        ordered[k] = queries.pop(k)  # KeyError = stale window list; fail loud
    ordered.update(queries)          # everything already graded, module order
    return ordered, oracles
