"""Round-6 additions, batch 14: privacy auditing (k-anonymity) and ML
feature engineering (smoothed target encoding) — the two remaining
pipeline-adjacent classes: "may I release this projection" and "turn
categories into leak-free numeric features".

Same float discipline as the rest of the repo: exact integer counts and
cents, half-up per-mille quotients, one final double division per
displayed ratio.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_tables

#: k-anonymity threshold under audit
K_ANON = 5

#: target-encoding smoothing pseudo-count (additive / Laplace-style):
#: enc(c) = (sum_c + m * global_mean) / (n_c + m) — an integer-exact
#: blend once revenues are cents and the global mean is a cents ratio
TE_SMOOTH_M = 20


def q_dq_k_anonymity(spark, sf_dir):
    """k-anonymity audit of the customer projection (mktsegment,
    nation, acctbal sign) — the pre-release privacy check: for each
    quasi-identifier combination, its equivalence-class size; flagged
    when below k=5 (a released row in such a class re-identifies to ≤ 4
    candidates).  Reports per-class sizes plus each class's share of
    the table — the analyst's risk summary.

    One partial+final agg on the quasi-identifier tuple (a single
    shuffle at any scale; class count is bounded by the QI domain, not
    the row count), one broadcastable 1-row total for the share."""
    load_tables(spark, sf_dir)
    c = spark.table("customer")
    qi = c.select(
        "c_mktsegment",
        "c_nationkey",
        F.when(F.col("c_acctbal") < 0, "neg").otherwise("nonneg").alias(
            "bal_sign"
        ),
    )
    classes = qi.groupBy("c_mktsegment", "c_nationkey", "bal_sign").agg(
        F.count(F.lit(1)).alias("class_size")
    )
    total = classes.agg(F.sum("class_size").alias("total"))
    return classes.crossJoin(F.broadcast(total)).select(
        "c_mktsegment",
        "c_nationkey",
        "bal_sign",
        "class_size",
        (F.col("class_size") < K_ANON).alias("violates_k"),
        F.expr("(2000 * class_size + total) div (2 * total)")
        .cast("long")
        .alias("share_pm"),
    )


def q_pipeline_target_encode(spark, sf_dir):
    """Smoothed target encoding of order priority against the
    late-shipment label — the categorical-feature transform used when
    one-hot is too wide: enc(c) = (positives_c + m·global_rate) /
    (n_c + m) with pseudo-count m=20, shrinking rare categories toward
    the global rate (the leak-control that makes target encoding safe).

    Exact arithmetic: label sums and counts are integers and the
    encoding is a TWO-STAGE half-up composition — first the global rate
    as a x10^6 integer (bounded ≤ 10^6), then
    (10^6·pos_c + m·rate_x1e6) div (n_c + m).  The single-rational form
    (N·pos_c + m·P)/(N·(n_c+m)) is algebraically cleaner but its
    numerator grows O(rows²) and leaves BIGINT near sf1 (review
    finding); the staged form's intermediates stay ≤ 10^6·rows.  Both
    engines evaluate the identical two stages, so the key is still
    hash-exact by construction.  Two aggs and one 1-row broadcast; the
    category spine is the priority enum (bounded at any SF)."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem")
    o = spark.table("orders")
    lab = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_orderpriority",
        F.when(
            F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90), 1
        )
        .otherwise(0)
        .alias("late"),
    )
    per_cat = lab.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_c"),
        F.sum("late").alias("pos_c"),
    )
    glob = lab.agg(
        F.count(F.lit(1)).alias("n_g"), F.sum("late").alias("pos_g")
    )
    return per_cat.crossJoin(F.broadcast(glob)).select(
        "o_orderpriority",
        "n_c",
        "pos_c",
        # stage 1: rate_x1e6 = half-up(1e6*pos_g/n_g)  (bounded <= 1e6)
        # stage 2: enc_x1e6 = half-up((1e6*pos_c + m*rate_x1e6)/(n_c+m))
        (
            F.expr(
                "(2 * (1000000 * pos_c + "
                f"{TE_SMOOTH_M} * ((2 * 1000000 * pos_g + n_g) div (2 * n_g)))"
                f" + (n_c + {TE_SMOOTH_M})) div (2 * (n_c + {TE_SMOOTH_M}))"
            )
            / 1000000.0
        ).alias("target_enc"),
        (
            F.expr("(2 * 1000000 * pos_g + n_g) div (2 * n_g)") / 1000000.0
        ).alias("global_rate"),
    )


QUERIES = {
    "dq_k_anonymity": q_dq_k_anonymity,
    "pipeline_target_encode": q_pipeline_target_encode,
}

ORACLES = {
    "dq_k_anonymity": (
        "WITH qi AS (SELECT c_mktsegment, c_nationkey, "
        "CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'nonneg' END AS bal_sign "
        "FROM customer), "
        "classes AS (SELECT c_mktsegment, c_nationkey, bal_sign, "
        "count(*) AS class_size FROM qi GROUP BY 1, 2, 3), "
        "t AS (SELECT sum(class_size) AS total FROM classes) "
        "SELECT c_mktsegment, c_nationkey, bal_sign, class_size, "
        f"class_size < {K_ANON} AS violates_k, "
        "CAST((2000 * class_size + total) // (2 * total) AS BIGINT) "
        "AS share_pm FROM classes, t"
    ),
    "pipeline_target_encode": (
        "WITH lab AS (SELECT o_orderpriority, "
        "CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY "
        "THEN 1 ELSE 0 END AS late "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey), "
        "per_cat AS (SELECT o_orderpriority, count(*) AS n_c, "
        "sum(late) AS pos_c FROM lab GROUP BY 1), "
        "gtot AS (SELECT count(*) AS n_g, sum(late) AS pos_g FROM lab) "
        "SELECT o_orderpriority, n_c, CAST(pos_c AS BIGINT) AS pos_c, "
        "((2 * (1000000 * pos_c + "
        f"{TE_SMOOTH_M} * ((2 * 1000000 * pos_g + n_g) // (2 * n_g))) "
        f"+ (n_c + {TE_SMOOTH_M})) // (2 * (n_c + {TE_SMOOTH_M}))) "
        "/ 1000000.0 AS target_enc, "
        "((2 * 1000000 * pos_g + n_g) // (2 * n_g)) / 1000000.0 "
        "AS global_rate FROM per_cat, gtot"
    ),
}


# =================================================================
# Group C — blocked fuzzy join (entity resolution)
# =================================================================

FUZZY_T = 3  #: max edit distance for a match


def q_join_fuzzy_blocked(spark, sf_dir):
    """Entity-resolution fuzzy join over the part-name vocabulary:
    candidate pairs are generated ONLY within a blocking key (the name's
    last token — the head noun), then scored by exact Levenshtein and
    kept at distance ≤ 3 — the blocking+scoring shape of every record-
    linkage pipeline (never the quadratic all-pairs).

    Plan: names dedupe to the vocabulary first (64 names at any SF —
    name count is a fixture vocabulary, part count scales), so the pair
    join runs on the TINY distinct spine and the per-name part counts
    join back.  At 100 TB the same plan holds: block-keyed equi-join on
    the deduped vocabulary; a skewed block is re-blocked by a second key
    (length bucket), the standard ER mitigation.  Levenshtein semantics
    already hash-checked cross-engine by fn_levenshtein."""
    load_tables(spark, sf_dir)
    p = spark.table("part")
    names = p.groupBy("p_name").agg(F.count(F.lit(1)).alias("n_parts"))
    blocked = names.select(
        "p_name",
        "n_parts",
        F.element_at(F.split("p_name", " "), -1).alias("blk"),
    )
    a = blocked.select(
        F.col("p_name").alias("name_a"),
        F.col("n_parts").alias("parts_a"),
        "blk",
    )
    b = blocked.select(
        F.col("p_name").alias("name_b"),
        F.col("n_parts").alias("parts_b"),
        "blk",
    )
    pairs = (
        a.join(b, "blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= FUZZY_T)
    )
    return pairs.select("blk", "name_a", "name_b", "dist", "parts_a", "parts_b")


QUERIES["join_fuzzy_blocked"] = q_join_fuzzy_blocked

ORACLES["join_fuzzy_blocked"] = (
    "WITH names AS (SELECT p_name, count(*) AS n_parts FROM part "
    "GROUP BY p_name), "
    "blocked AS (SELECT p_name, n_parts, "
    "string_split(p_name, ' ')[-1] AS blk FROM names), "
    "pairs AS (SELECT a.blk, a.p_name AS name_a, b.p_name AS name_b, "
    "levenshtein(a.p_name, b.p_name) AS dist, "
    "a.n_parts AS parts_a, b.n_parts AS parts_b "
    "FROM blocked a JOIN blocked b ON a.blk = b.blk "
    "AND a.p_name < b.p_name) "
    f"SELECT blk, name_a, name_b, CAST(dist AS BIGINT) AS dist, "
    f"parts_a, parts_b FROM pairs WHERE dist <= {FUZZY_T}"
)


# =================================================================
# Group W — Parabolic SAR (nonlinear 4-field state machine)
# =================================================================

SAR_AF0 = 2    #: initial/post-flip acceleration (x0.01)
SAR_AFS = 2    #: acceleration step on a new extreme (x0.01)
SAR_AFM = 20   #: acceleration cap (x0.01)


def _sar_step(t: str, sar: str, ep: str, af: str, h: str, l: str,
              dialect: str) -> dict[str, str]:
    """One Parabolic SAR transition as four field expressions over the
    previous state (t=trend ±1, sar, ep, af x0.01 — all exact integer
    cents) and the day's bar (h, l).  The raw stop
    sar + af·(ep−sar)/100 uses the signed half-up integer quotient; the
    flip test and extreme updates are pure integer comparisons, so the
    machine is deterministic on any engine.  Variant notes (documented,
    both sides identical): seed long with sar=low₁/ep=high₁, no
    prior-low clamp."""
    d = "div" if dialect == "spark" else "//"
    v = f"({af} * ({ep} - {sar}))"
    raw = (
        f"({sar} + (CASE WHEN {v} < 0 THEN -((2 * -{v} + 100) {d} 200) "
        f"ELSE (2 * {v} + 100) {d} 200 END))"
    )
    flip = f"(({t} = 1 AND {l} < {raw}) OR ({t} = -1 AND {h} > {raw}))"
    new_ext = f"(({t} = 1 AND {h} > {ep}) OR ({t} = -1 AND {l} < {ep}))"
    return {
        "t": f"(CASE WHEN {flip} THEN -{t} ELSE {t} END)",
        "sar": f"(CASE WHEN {flip} THEN {ep} ELSE {raw} END)",
        "ep": (
            f"(CASE WHEN {t} = 1 AND {l} < {raw} THEN {l} "
            f"WHEN {t} = -1 AND {h} > {raw} THEN {h} "
            f"WHEN {t} = 1 AND {h} > {ep} THEN {h} "
            f"WHEN {t} = -1 AND {l} < {ep} THEN {l} ELSE {ep} END)"
        ),
        "af": (
            f"(CASE WHEN {flip} THEN {SAR_AF0} "
            f"WHEN {new_ext} THEN least({af} + {SAR_AFS}, {SAR_AFM}) "
            f"ELSE {af} END)"
        ),
    }


def q_window_parabolic_sar(spark, sf_dir):
    """Parabolic SAR over ship-day bars of lineitem prices — the
    trend-following stop-and-reverse system, and the one classic
    indicator that is a genuine nonlinear STATE MACHINE (trend flips,
    accelerating stop, extreme-point memory) rather than a smoothing:
    state (trend, sar, ep, af) evolves from the series start; outputs
    the stop level, trend and acceleration per day.

    Exactness: the whole machine is integer cents + the signed half-up
    quotient for af·(ep−sar)/100 — no float enters any branch decision.
    Spark folds the day-prefix per row (O(days²) integer steps, bounded
    by the ship calendar at any SF); the DuckDB oracle walks the same
    transitions with a RECURSIVE CTE over the MATERIALIZED day series
    (the ts_holt_linear lessons).  Python replay in pytest pins both."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem").select(
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("day"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    bars = li.groupBy("day").agg(
        F.max("cents").alias("h"), F.min("cents").alias("l")
    )
    from pyspark.sql import Window as W

    wf = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    framed = bars.select(
        "day",
        F.collect_list(F.struct("h", "l")).over(wf).alias("arr"),
    )
    s = _sar_step("acc.t", "acc.sar", "acc.ep", "acc.af", "x.h", "x.l",
                  "spark")
    fold = (
        "aggregate(slice(arr, 2, size(arr) - 1), "
        "named_struct('t', 1L, 'sar', element_at(arr, 1).l, "
        f"'ep', element_at(arr, 1).h, 'af', cast({SAR_AF0} as bigint)), "
        f"(acc, x) -> named_struct('t', cast({s['t']} as bigint), "
        f"'sar', {s['sar']}, 'ep', {s['ep']}, "
        f"'af', cast({s['af']} as bigint)))"
    )
    st = F.expr(fold)
    return framed.select(
        "day",
        st["t"].alias("trend"),
        (st["sar"] / 100.0).alias("sar"),
        (st["ep"] / 100.0).alias("ep"),
        st["af"].alias("af_x100"),
    )


QUERIES["window_parabolic_sar"] = q_window_parabolic_sar

_SAR_D = _sar_step("w.t", "w.sar", "w.ep", "w.af", "n.h", "n.l", "duckdb")

ORACLES["window_parabolic_sar"] = (
    "WITH RECURSIVE bars AS MATERIALIZED (SELECT "
    "strftime(l_shipdate, '%Y-%m-%d') AS day, "
    "max(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS h, "
    "min(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS l "
    "FROM lineitem GROUP BY 1), "
    "idx AS MATERIALIZED (SELECT day, h, l, "
    "row_number() OVER (ORDER BY day) AS i FROM bars), "
    "walk(i, day, t, sar, ep, af) AS ("
    "SELECT i, day, CAST(1 AS BIGINT), l, h, "
    f"CAST({SAR_AF0} AS BIGINT) FROM idx WHERE i = 1 "
    "UNION ALL SELECT n.i, n.day, "
    f"CAST({_SAR_D['t']} AS BIGINT), {_SAR_D['sar']}, {_SAR_D['ep']}, "
    f"CAST({_SAR_D['af']} AS BIGINT) "
    "FROM walk w JOIN idx n ON n.i = w.i + 1) "
    "SELECT day, t AS trend, sar / 100.0 AS sar, ep / 100.0 AS ep, "
    "af AS af_x100 FROM walk"
)
