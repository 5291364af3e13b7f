"""Round-6 additions, batch 21: the Pareto skyline (a classic DB
operator class — non-dominated multi-criteria selection — not covered
anywhere else in the registry), CCI (the first TA indicator needing a
NESTED window statistic: mean absolute deviation around the window's
own mean), tokenizer fertility telemetry (the tokens-per-char budget
table every training run is costed from), and a functional-dependency
audit (the TANE-style X -> Y violation counter behind schema-inference
tools).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..catalog import load_tables
from ..operators.ranking import global_running_max_excl

#: CCI lookback (days)
CCI_N = 20


def q_sort_skyline_pareto(spark, sf_dir):
    """Pareto SKYLINE of parts: cheapest-price / largest-size frontier —
    every part not DOMINATED by another (dominator: <= price, >= size,
    strictly better in one).  The multi-criteria shortlist operator
    (skyline / maximal-vector problem, Börzsönyi et al. ICDE'01).

    Plan — sort-based skyline, NO pairwise join: (1) one partial+final
    agg to per-price group max size; (2) EXCLUSIVE prefix max of group
    max over ascending price via the distributed chunked-offset scheme
    (ranking.global_running_max_excl — range partition, local window,
    one bounded per-partition collect; no single-partition window);
    (3) join back: a part survives iff its size equals its price
    group's max AND beats every strictly-cheaper group's max.  Two
    shuffles total, both on bounded-width keys.  The oracle is the
    O(n^2) NOT EXISTS dominance test — correct at fixture scale,
    impossible at 100 TB, which is exactly why the sort-based plan is
    the production path.  Equal (price, size) rows are mutually
    non-dominated and all kept, matching the oracle."""
    load_tables(spark, sf_dir)
    p = spark.table("part").select(
        "p_partkey",
        (F.col("p_retailprice").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("price_cents"),
        F.col("p_size").cast("int").alias("p_size"),
    )
    grp = p.groupBy("price_cents").agg(F.max("p_size").alias("mx"))
    pre = global_running_max_excl(grp, ["price_cents"], "mx")
    keep = pre.filter(
        F.col("pre_max").isNull() | (F.col("mx") > F.col("pre_max"))
    ).select("price_cents", "mx")
    # no forced broadcast: the frontier is usually tiny (O(log n) for
    # random data) but worst-case O(n) — AQE converts to broadcast from
    # runtime stats when it really is small (broadcast-governance rule)
    return (
        p.join(keep, ["price_cents"])
        .filter(F.col("p_size") == F.col("mx"))
        .select("p_partkey", "price_cents", "p_size")
    )


def q_window_cci(spark, sf_dir):
    """Commodity Channel Index over daily lineitem price bars:
    CCI = (TP - SMA_N(TP)) / (0.015 * meandev_N(TP)), TP=(H+L+C)/3 —
    the first indicator here whose denominator is a NESTED window
    statistic (mean |deviation| around the window's OWN mean), which no
    flat window sum can express: the frame collects once per row and
    folds twice.

    Exact arithmetic: with integer cents and TP3 = H+L+C (3x TP, scale
    cancels), CCI = 200*N*(N*tp3 - S) / (3 * sum_j |N*tp3_j - S|) — an
    exact integer ratio divided ONCE for display; no float enters
    before the final division.  Single-partition window on the bounded
    ~2,406-day grain (TA-window precedent)."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem").select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("day"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    wd = Window.partitionBy("day").orderBy(F.col("ok").desc(), F.col("ln").desc())
    r = li.withColumn("rn_d", F.row_number().over(wd))
    bars = r.groupBy("day").agg(
        (
            F.max("cents")
            + F.min("cents")
            + F.max(F.when(F.col("rn_d") == 1, F.col("cents")))
        ).alias("tp3")
    )
    wf = Window.orderBy("day").rowsBetween(-(CCI_N - 1), 0)
    framed = bars.select(
        "day",
        "tp3",
        F.collect_list("tp3").over(wf).alias("arr"),
        F.count(F.lit(1)).over(wf).alias("n"),
    ).filter(F.col("n") == CCI_N)
    s = F.expr("aggregate(arr, 0L, (acc, x) -> acc + x)")
    scored = framed.select("day", "tp3", s.alias("s"), "arr")
    d = F.expr(
        f"aggregate(arr, 0L, (acc, x) -> acc + abs({CCI_N} * x - s))"
    )
    return scored.select(
        "day",
        (F.col("tp3") / 3.0 / 100.0).alias("tp"),
        F.round(
            200.0
            * CCI_N
            * (CCI_N * F.col("tp3") - F.col("s"))
            / (3.0 * d),
            6,
        ).alias("cci"),
    )


def q_pipeline_tokenizer_fertility(spark, sf_dir):
    """Tokenizer fertility table per (lang, source): docs, whitespace
    tokens, chars, tokens-per-1000-chars and mean chars-per-token — the
    budget telemetry that converts a corpus's bytes into a training
    token count (and flags languages whose tokenizer fragments text).
    One partial+final agg; all counts exact integers, ratios half-up
    fixed-point quotients of the group SUMS (never means of means)."""
    load_tables(spark, sf_dir)
    d = spark.table("documents")
    per = d.select(
        "lang",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("toks"),
        F.col("n_chars").cast("long").alias("chars"),
    )
    g = per.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("toks").alias("tokens"),
        F.sum("chars").alias("chars"),
    )
    return g.select(
        "lang",
        "source",
        "n_docs",
        "tokens",
        "chars",
        F.expr("(2 * 1000 * tokens + chars) div (2 * chars)").alias(
            "toks_per_kchar"
        ),
        (
            F.expr("(2 * 1000 * chars + tokens) div (2 * tokens)") / 1000.0
        ).alias("chars_per_tok"),
    )


def q_dq_functional_dependency(spark, sf_dir):
    """Functional-dependency audit: does o_custkey -> o_orderpriority
    hold?  The TANE-style single-FD check behind schema-inference and
    key-discovery tools: per LHS value count DISTINCT RHS values, then
    report how many LHS keys violate (>1 RHS), the worst variant count,
    and the violation rate.  One partial+final agg pair, all integers;
    the per-mille is a half-up integer quotient."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    per = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("o_orderpriority").alias("n_rhs"),
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_lhs"),
        F.sum((F.col("n_rhs") > 1).cast("long")).alias("n_violating"),
        F.max("n_rhs").alias("max_variants"),
        F.expr(
            "(2 * 1000 * sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) "
            "+ count(*)) div (2 * count(*))"
        ).alias("violation_pm"),
    )


QUERIES = {
    "sort_skyline_pareto": q_sort_skyline_pareto,
    "window_cci": q_window_cci,
    "pipeline_tokenizer_fertility": q_pipeline_tokenizer_fertility,
    "dq_functional_dependency": q_dq_functional_dependency,
}

ORACLES = {
    "sort_skyline_pareto": (
        "WITH p AS (SELECT p_partkey, "
        "CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT) "
        "AS price_cents, CAST(p_size AS INT) AS p_size FROM part) "
        "SELECT p_partkey, price_cents, p_size FROM p a "
        "WHERE NOT EXISTS (SELECT 1 FROM p b "
        "WHERE b.price_cents <= a.price_cents AND b.p_size >= a.p_size "
        "AND (b.price_cents < a.price_cents OR b.p_size > a.p_size))"
    ),
    "window_cci": (
        "WITH li AS (SELECT l_orderkey AS ok, l_linenumber AS ln, "
        "strftime(l_shipdate, '%Y-%m-%d') AS day, "
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) "
        "AS cents FROM lineitem), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY day "
        "ORDER BY ok DESC, ln DESC) AS rn_d FROM li), "
        "bars AS (SELECT day, max(cents) + min(cents) "
        "+ max(CASE WHEN rn_d = 1 THEN cents END) AS tp3 FROM r GROUP BY 1), "
        "framed AS (SELECT day, tp3, "
        f"list(tp3) OVER (ORDER BY day ROWS BETWEEN {CCI_N - 1} PRECEDING "
        "AND CURRENT ROW) AS arr, "
        f"count(*) OVER (ORDER BY day ROWS BETWEEN {CCI_N - 1} PRECEDING "
        "AND CURRENT ROW) AS n FROM bars), "
        "scored AS (SELECT day, tp3, "
        "list_reduce(list_prepend(CAST(0 AS BIGINT), arr), "
        "(acc, x) -> acc + x) AS s, arr "
        f"FROM framed WHERE n = {CCI_N}) "
        "SELECT day, tp3 / 3.0 / 100.0 AS tp, "
        f"round(200.0 * {CCI_N} * ({CCI_N} * tp3 - s) / "
        "(3.0 * list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(arr, x -> abs({CCI_N} * x - s))), "
        "(acc, v) -> acc + v)), 6) AS cci FROM scored"
    ),
    "pipeline_tokenizer_fertility": (
        "WITH per AS (SELECT lang, source, "
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS toks, "
        "CAST(n_chars AS BIGINT) AS chars FROM documents), "
        "g AS (SELECT lang, source, count(*) AS n_docs, "
        "CAST(sum(toks) AS BIGINT) AS tokens, "
        "CAST(sum(chars) AS BIGINT) AS chars FROM per GROUP BY 1, 2) "
        "SELECT lang, source, n_docs, tokens, chars, "
        "(2 * 1000 * tokens + chars) // (2 * chars) AS toks_per_kchar, "
        "((2 * 1000 * chars + tokens) // (2 * tokens)) / 1000.0 "
        "AS chars_per_tok FROM g"
    ),
    "dq_functional_dependency": (
        "WITH per AS (SELECT o_custkey, count(*) AS n_rows, "
        "count(DISTINCT o_orderpriority) AS n_rhs FROM orders GROUP BY 1) "
        "SELECT CAST(count(*) AS BIGINT) AS n_lhs, "
        "CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_violating, "
        "CAST(max(n_rhs) AS BIGINT) AS max_variants, "
        "CAST((2 * 1000 * sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) "
        "+ count(*)) // (2 * count(*)) AS BIGINT) AS violation_pm FROM per"
    ),
}
