"""Round-6 additions, batch 13: training-data span dedup, BPE merge
statistics, hierarchical (recursive-CTE-class) rollup, and the Ichimoku
cloud — each a capability class the surface lacked (repeated-span
contamination measurement, tokenizer-training statistics, recursion,
multi-horizon midpoint channels).

Float discipline matches the repo: integer cents / exact counts
end-to-end, one final double division per displayed ratio, half-up
quotients in pure integer space.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..catalog import load_tables

#: duplicated-span shingle width (tokens) — the training-data-dedup
#: literature's "repeated n-gram" grain (C4/RefinedWeb use 3-13; 8 keeps
#: the fixture's collision rate informative at every SF)
SPAN_W = 8

#: BPE statistics: top-k adjacent-symbol pairs reported
BPE_TOPK = 20

#: Ichimoku horizons (days) — tenkan/kijun/senkou-B lookbacks and the
#: cloud displacement
ICHI_TENKAN = 9
ICHI_KIJUN = 26
ICHI_SENKOU = 52


# =================================================================
# Group L — repeated n-gram span detection (training-data dedup)
# =================================================================


def q_dedup_ngram_spans(spark, sf_dir):
    """Per-document duplicated-span fraction: the share of a document's
    8-token shingles that occur in MORE THAN ONE document — the
    repeated-n-gram contamination signal behind C4-style span dedup
    ("how much of this page is boilerplate shared with other pages").

    Plan: ONE generate (shingles via a sequence/slice lambda — no
    self-join, and the explode is never repeated: an earlier join-back
    formulation made Spark regenerate the shingle stream twice), then
    (doc, shingle) occurrence counts, a shingle-partitioned window for
    the cross-doc flag (no join), and one per-doc agg.  Both shuffles
    key on the shingle string; at 100 TB the grouping key would be
    xxhash64(shingle) (16-byte key, bodies never shuffled) — kept as
    the raw string here so the oracle comparison is collision-free by
    construction.  The ratio is a half-up per-mille integer; docs
    shorter than 8 tokens report 0 shingles and 0 coverage."""
    load_tables(spark, sf_dir)
    d = spark.table("documents")
    toks = F.array_remove(F.split(F.col("text"), " "), "")
    sh = d.select(
        "doc_id",
        F.explode(
            F.when(
                F.size(toks) >= SPAN_W,
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - (SPAN_W - 1)),
                    lambda i: F.array_join(F.slice(toks, i, SPAN_W), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("shingle"),
    )
    # collapse to per-(doc, shingle) occurrence counts first; a shingle
    # repeated WITHIN one doc is not cross-doc duplication, so the dup
    # flag is "this shingle has >1 (doc, shingle) row" — a count over
    # the shingle partition, no join back
    occ = sh.groupBy("doc_id", "shingle").agg(F.count(F.lit(1)).alias("occ"))
    wsh = Window.partitionBy("shingle")
    flagged = occ.withColumn("n_docs", F.count(F.lit(1)).over(wsh))
    per_doc = flagged.groupBy("doc_id").agg(
        F.sum("occ").alias("n_shingles"),
        F.sum(F.when(F.col("n_docs") > 1, F.col("occ")).otherwise(0)).alias(
            "n_dup"
        ),
    )
    base = d.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
        F.coalesce("n_dup", F.lit(0)).alias("n_dup"),
    )
    return base.select(
        "doc_id",
        "n_shingles",
        "n_dup",
        F.expr(
            "CASE WHEN n_shingles = 0 THEN 0 "
            "ELSE (2000 * n_dup + n_shingles) div (2 * n_shingles) END"
        )
        .cast("long")
        .alias("dup_pm"),
    )


# =================================================================
# Group L — BPE merge-candidate statistics (tokenizer training)
# =================================================================


def q_text_bpe_merge_pairs(spark, sf_dir):
    """First-iteration BPE merge candidates: the corpus-wide top-20
    adjacent CHARACTER pairs inside words, ranked by frequency (ties →
    lexicographic) — exactly the statistic a byte-pair-encoding
    tokenizer trainer computes before its first merge.  One generate
    (char bigrams via sequence/substring — JVM-side lambdas, no Python),
    one partial+final count, one bounded top-k.  Counts are exact
    integers; the corpus share is one double division per output row."""
    load_tables(spark, sf_dir)
    d = spark.table("documents")
    words = d.select(
        F.explode(F.array_remove(F.split(F.col("text"), " "), "")).alias("w")
    )
    # substring with a DYNAMIC position needs expr(): the Python DSL
    # binds substring's pos/len as literals only
    pairs = words.select(
        F.explode(
            F.when(
                F.length("w") >= 2,
                F.expr(
                    "transform(sequence(1, length(w) - 1), "
                    "i -> substring(w, i, 2))"
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pair")
    )
    counted = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("cnt"))
    total = counted.agg(F.sum("cnt").alias("total"))
    ranked = counted.withColumn(
        "rank", F.row_number().over(Window.orderBy(F.col("cnt").desc(), "pair"))
    ).filter(F.col("rank") <= BPE_TOPK)
    return ranked.crossJoin(F.broadcast(total)).select(
        "rank",
        "pair",
        "cnt",
        # half-up x10^6 integer quotient — round(cnt/total, 6) on the
        # raw double lands 1 ulp apart across engines at some SFs (the
        # same drift class the r6 cross-SF sweep caught elsewhere)
        (
            F.expr("(2 * 1000000 * cnt + total) div (2 * total)") / 1000000.0
        ).alias("share"),
    )


# =================================================================
# Group C/J — hierarchical rollup (the recursive-CTE query class)
# =================================================================


def q_cte_recursive_rollup(spark, sf_dir):
    """Hierarchical subtree rollup over the implicit decimal tree on
    customer keys (parent(k) = k div 10, roots 1-9): every customer's
    descendant count and total subtree order revenue — the recursive-CTE
    query class (org charts, BOM explosions, category trees).

    Plan: recursion is REWRITTEN as a bounded ancestor-explode — each
    customer emits (ancestor, revenue) for its div-10 ancestors — 18
    levels, enough for ANY int64 key (10^18 > 2^63/10), so the bound is
    type-derived, not data-derived — then one partial+final
    agg on the ancestor key.  That is the scale-appropriate plan: a
    loop of self-joins runs depth sequential shuffles, while this is
    ONE generate + ONE shuffle regardless of depth; the DuckDB oracle
    keeps the textbook WITH RECURSIVE form to pin identical semantics.
    Revenue is exact integer cents."""
    load_tables(spark, sf_dir)
    c = spark.table("customer").select("c_custkey")
    o = spark.table("orders").select(
        "o_custkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    rev = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.coalesce(F.sum("cents"), F.lit(0)).alias("own_cents"))
    )
    # ancestors of k: always k itself, then k div 10, k div 100, ... while
    # > 0 (custkeys start at 0 — key 0 is a single-node root, so self
    # membership cannot hinge on the a > 0 walk condition)
    anc = rev.select(
        F.explode(
            F.expr(
                "array_distinct(concat(array(c_custkey), "
                "filter(transform(sequence(1, 18), "
                "p -> c_custkey div cast(pow(10, p) as bigint)), a -> a > 0)))"
            )
        ).alias("anc_key"),
        "own_cents",
    )
    rolled = anc.groupBy("anc_key").agg(
        F.count(F.lit(1)).alias("n_desc"),
        F.sum("own_cents").alias("subtree_cents"),
    )
    # report only keys that are actual customers (interior synthetic
    # ancestors like 12 exist as customers too under TPC-H dense keys)
    return (
        rolled.join(rev, rolled.anc_key == rev.c_custkey)
        .select(
            F.col("c_custkey").alias("custkey"),
            "n_desc",
            (F.col("subtree_cents") / 100.0).alias("subtree_revenue"),
        )
    )


# =================================================================
# Group W — Ichimoku cloud (multi-horizon midpoint channels)
# =================================================================


def q_window_ichimoku(spark, sf_dir):
    """Ichimoku Kinko Hyo over ship-day bars of lineitem prices: tenkan
    (9-day midpoint), kijun (26-day midpoint), senkou A (midpoint of
    tenkan/kijun displaced 26 days forward), senkou B (52-day midpoint
    displaced 26 forward), chikou (close displaced 26 back), and the
    price-vs-cloud classification.  Completes the TA family with the
    one indicator built from MULTI-HORIZON channel midpoints plus
    lead/lag displacement.

    Every midpoint is a half-up integer-cents quotient ((h+l+1) div 2 on
    nonneg cents); day-grain pre-aggregation bounds all five ordered
    frames at any SF (ship-day calendar ≈ 2.5k days at every scale)."""
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
        F.max("cents").alias("h"),
        F.min("cents").alias("l"),
        F.max(F.when(F.col("rn_d") == 1, F.col("cents"))).alias("c"),
    )
    w = Window.orderBy("day")

    def chan(n):
        f = w.rowsBetween(-(n - 1), 0)
        return F.max("h").over(f), F.min("l").over(f), F.count(F.lit(1)).over(f)

    h9, l9, n9 = chan(ICHI_TENKAN)
    h26, l26, n26 = chan(ICHI_KIJUN)
    h52, l52, n52 = chan(ICHI_SENKOU)
    lined = bars.select(
        "day",
        "c",
        ((h9 + l9 + 1).cast("long")).alias("t2"),
        ((h26 + l26 + 1).cast("long")).alias("k2"),
        ((h52 + l52 + 1).cast("long")).alias("b2"),
        n52.alias("n52"),
    ).filter(F.col("n52") == ICHI_SENKOU)
    lined = lined.select(
        "day",
        "c",
        F.expr("t2 div 2").alias("tenkan_c"),
        F.expr("k2 div 2").alias("kijun_c"),
        F.expr("b2 div 2").alias("senkoub_c"),
    )
    w2 = Window.orderBy("day")
    disp = lined.select(
        "day",
        "c",
        "tenkan_c",
        "kijun_c",
        # senkou spans: values computed 26 days AGO project onto today
        F.lag(
            F.expr("(tenkan_c + kijun_c + 1) div 2"), ICHI_KIJUN
        ).over(w2).alias("senkou_a_c"),
        F.lag("senkoub_c", ICHI_KIJUN).over(w2).alias("senkou_b_c"),
        # chikou: today's close plotted 26 back == close from 26 ahead
        F.lead("c", ICHI_KIJUN).over(w2).alias("chikou_c"),
    ).filter(F.col("senkou_a_c").isNotNull())
    top = F.greatest("senkou_a_c", "senkou_b_c")
    bot = F.least("senkou_a_c", "senkou_b_c")
    return disp.select(
        "day",
        (F.col("c") / 100.0).alias("close_v"),
        (F.col("tenkan_c") / 100.0).alias("tenkan"),
        (F.col("kijun_c") / 100.0).alias("kijun"),
        (F.col("senkou_a_c") / 100.0).alias("senkou_a"),
        (F.col("senkou_b_c") / 100.0).alias("senkou_b"),
        (F.col("chikou_c") / 100.0).alias("chikou"),
        F.when(F.col("c") > top, "above_cloud")
        .when(F.col("c") < bot, "below_cloud")
        .otherwise("in_cloud")
        .alias("position"),
    )


QUERIES = {
    "dedup_ngram_spans": q_dedup_ngram_spans,
    "text_bpe_merge_pairs": q_text_bpe_merge_pairs,
    "cte_recursive_rollup": q_cte_recursive_rollup,
    "window_ichimoku": q_window_ichimoku,
}

ORACLES = {
    "dedup_ngram_spans": (
        "WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), "
        "x -> x <> '') AS ts FROM documents), "
        "sh AS (SELECT doc_id, unnest(CASE WHEN len(ts) >= "
        f"{SPAN_W} THEN list_transform(generate_series(1, len(ts) - "
        f"{SPAN_W - 1}), i -> array_to_string(ts[i : i + {SPAN_W - 1}], ' ')) "
        "ELSE [] END) AS shingle FROM toks), "
        "dup AS (SELECT shingle, count(DISTINCT doc_id) > 1 AS is_dup "
        "FROM sh GROUP BY shingle), "
        "per_doc AS (SELECT s.doc_id, count(*) AS n_shingles, "
        "sum(CASE WHEN d.is_dup THEN 1 ELSE 0 END) AS n_dup "
        "FROM sh s JOIN dup d USING (shingle) GROUP BY s.doc_id) "
        "SELECT doc_id, "
        "CAST(coalesce(n_shingles, 0) AS BIGINT) AS n_shingles, "
        "CAST(coalesce(n_dup, 0) AS BIGINT) AS n_dup, "
        "CAST(CASE WHEN coalesce(n_shingles, 0) = 0 THEN 0 ELSE "
        "(2000 * n_dup + n_shingles) // (2 * n_shingles) END AS BIGINT) "
        "AS dup_pm "
        "FROM documents LEFT JOIN per_doc USING (doc_id)"
    ),
    "text_bpe_merge_pairs": (
        "WITH words AS (SELECT unnest(list_filter(string_split(text, ' '), "
        "x -> x <> '')) AS w FROM documents), "
        "pairs AS (SELECT unnest(CASE WHEN length(w) >= 2 THEN "
        "list_transform(generate_series(1, length(w) - 1), "
        "i -> w[i : i + 1]) ELSE [] END) AS pair FROM words), "
        "counted AS (SELECT pair, count(*) AS cnt FROM pairs GROUP BY pair), "
        "total AS (SELECT sum(cnt) AS total FROM counted), "
        "ranked AS (SELECT pair, cnt, row_number() OVER "
        "(ORDER BY cnt DESC, pair) AS rank FROM counted) "
        "SELECT rank, pair, cnt, "
        "((2 * 1000000 * cnt + total) // (2 * total)) / 1000000.0 "
        f"AS share FROM ranked, total WHERE rank <= {BPE_TOPK}"
    ),
    "cte_recursive_rollup": (
        "WITH RECURSIVE rev AS (SELECT c_custkey, coalesce(sum("
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)), 0) "
        "AS own_cents FROM customer LEFT JOIN orders "
        "ON c_custkey = o_custkey GROUP BY c_custkey), "
        # pairs (node, member-of-subtree): seed with self, walk child->parent
        "walk AS (SELECT c_custkey AS anc_key, c_custkey AS node, "
        "own_cents FROM rev "
        "UNION ALL SELECT anc_key // 10, node, own_cents FROM walk "
        "WHERE anc_key // 10 > 0), "
        "rolled AS (SELECT anc_key, count(*) AS n_desc, "
        "sum(own_cents) AS subtree_cents FROM walk GROUP BY anc_key) "
        "SELECT r.c_custkey AS custkey, CAST(n_desc AS BIGINT) AS n_desc, "
        "subtree_cents / 100.0 AS subtree_revenue "
        "FROM rolled JOIN rev r ON anc_key = r.c_custkey"
    ),
    "window_ichimoku": (
        "WITH li AS (SELECT l_orderkey AS ok, l_linenumber AS ln, "
        "strftime(l_shipdate, '%Y-%m-%d') AS day, "
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents "
        "FROM lineitem), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY day "
        "ORDER BY ok DESC, ln DESC) AS rn_d FROM li), "
        "bars AS (SELECT day, max(cents) AS h, min(cents) AS l, "
        "max(CASE WHEN rn_d = 1 THEN cents END) AS c FROM r GROUP BY 1), "
        "lined AS (SELECT day, c, "
        "(max(h) OVER w9 + min(l) OVER w9 + 1) // 2 AS tenkan_c, "
        "(max(h) OVER w26 + min(l) OVER w26 + 1) // 2 AS kijun_c, "
        "(max(h) OVER w52 + min(l) OVER w52 + 1) // 2 AS senkoub_c, "
        "count(*) OVER w52 AS n52 FROM bars "
        f"WINDOW w9 AS (ORDER BY day ROWS BETWEEN {ICHI_TENKAN - 1} "
        "PRECEDING AND CURRENT ROW), "
        f"w26 AS (ORDER BY day ROWS BETWEEN {ICHI_KIJUN - 1} "
        "PRECEDING AND CURRENT ROW), "
        f"w52 AS (ORDER BY day ROWS BETWEEN {ICHI_SENKOU - 1} "
        "PRECEDING AND CURRENT ROW)), "
        f"full_ AS (SELECT * FROM lined WHERE n52 = {ICHI_SENKOU}), "
        "disp AS (SELECT day, c, tenkan_c, kijun_c, "
        f"lag((tenkan_c + kijun_c + 1) // 2, {ICHI_KIJUN}) OVER "
        "(ORDER BY day) AS senkou_a_c, "
        f"lag(senkoub_c, {ICHI_KIJUN}) OVER (ORDER BY day) AS senkou_b_c, "
        f"lead(c, {ICHI_KIJUN}) OVER (ORDER BY day) AS chikou_c FROM full_) "
        "SELECT day, c / 100.0 AS close_v, tenkan_c / 100.0 AS tenkan, "
        "kijun_c / 100.0 AS kijun, senkou_a_c / 100.0 AS senkou_a, "
        "senkou_b_c / 100.0 AS senkou_b, chikou_c / 100.0 AS chikou, "
        "CASE WHEN c > greatest(senkou_a_c, senkou_b_c) THEN 'above_cloud' "
        "WHEN c < least(senkou_a_c, senkou_b_c) THEN 'below_cloud' "
        "ELSE 'in_cloud' END AS position "
        "FROM disp WHERE senkou_a_c IS NOT NULL"
    ),
}


# =================================================================
# Group T — Holt linear-trend smoothing (coupled fixed-point fold)
# =================================================================

#: Holt smoothing: alpha = beta = 1/2 as EXACT rationals, so every
#: recurrence step is one signed half-up integer halving.
#:
#: CROSS-ENGINE PITFALL (measured, duckdb v1.0): ``list_reduce`` with a
#: STRUCT accumulator mutates the accumulator IN PLACE field-by-field —
#: the second field's expression already sees the first field
#: overwritten (a fold of {'l': f(acc.l, acc.b), 'b': g(acc.l, acc.b)}
#: computes g against the NEW l).  Folds whose fields each read only
#: their own slot (window_adx) are immune; Holt's coupled (level, trend)
#: recurrence is not, so its DuckDB oracle uses a RECURSIVE CTE (plain
#: functional projection) instead of a struct lambda.


def _half2(v: str, dialect: str) -> str:
    """Signed half-up (away-from-zero) integer halving of expression
    ``v`` — the alpha=1/2 smoothing step.  Float halving would be exact
    too, but the trend recurrence SUBTRACTS levels, and float
    sum-then-halve drifts across engines once values mix signs; integer
    div keeps every state transition identical everywhere."""
    d = "div" if dialect == "spark" else "//"
    return f"(CASE WHEN ({v}) < 0 THEN -((1 - ({v})) {d} 2) ELSE (({v}) + 1) {d} 2 END)"


def _holt_fold_spark(list_col: str) -> str:
    """Holt's linear trend as a LEFT fold with a STRUCT accumulator
    (level l, trend b), seeded (l=x_1, b=0):
        l' = half((x + l + b))          -- alpha = 1/2
        b' = half((l' - l) + b)         -- beta  = 1/2
    l' appears inside b' — HOF lambdas have no let-binding, so the l'
    expression is inlined twice (Spark's ``aggregate`` evaluates the
    merge lambda functionally, all fields against the OLD accumulator —
    verified against a python reference; see the module-level note on
    why DuckDB's list_reduce cannot run this shape)."""
    lp = _half2("x + acc.l + acc.b", "spark")
    return (
        f"aggregate(slice({list_col}, 2, size({list_col}) - 1), "
        f"named_struct('l', element_at({list_col}, 1), "
        "'b', cast(0 as bigint)), "
        f"(acc, x) -> named_struct('l', {lp}, "
        f"'b', {_half2(f'({lp} - acc.l) + acc.b', 'spark')}))"
    )


def q_ts_holt_linear(spark, sf_dir):
    """Holt's linear-trend smoothing of daily order revenue: level +
    trend state evolved from the series start by the coupled recurrence
    (alpha=beta=1/2), plus the one-step-ahead forecast l + b — the
    simplest trend-aware forecaster (one step up from the EMA family,
    which has no trend state).

    The recurrence is a FIXED-POINT STRUCT fold over the full day
    prefix: signed half-up integer halvings keep every state transition
    identical across engines.  The prefix frame is bounded by the
    CALENDAR, not the data volume (≈2.4k order days at any SF — the
    bollinger argument), so the per-row fold is O(days²) integer steps
    on a day-grain table, independent of fact-table size.  The DuckDB
    oracle evolves the same state with a RECURSIVE CTE."""
    load_tables(spark, sf_dir)
    # complete-case: a day whose orders all lack a price is a series gap,
    # same as a day with no orders (collect_list would skip the NULL
    # where DuckDB's list() keeps it)
    o = spark.table("orders").filter(F.col("o_totalprice").isNotNull())
    daily = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day")
    ).agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
        ).alias("cents")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    framed = daily.select(
        "day",
        F.collect_list("cents").over(w).alias("xs"),
    )
    st = F.expr(_holt_fold_spark("xs"))
    return framed.select(
        "day",
        (st["l"] / 100.0).alias("level"),
        (st["b"] / 100.0).alias("trend"),
        ((st["l"] + st["b"]) / 100.0).alias("forecast_next"),
    )


# =================================================================
# Group W — ADX / directional movement (triple parallel Wilder fold)
# =================================================================

ADX_N = 14       #: Wilder smoothing span
ADX_TRUNC = 64   #: fold horizon (days)


def _wilder(s: str, x: str, dialect: str) -> str:
    """One Wilder smoothing step s' = s - s/n + x with the s/n quotient
    half-up in pure integers — inputs are nonnegative by construction
    (running sums of nonnegative DM/TR), so the unsigned form suffices."""
    d = "div" if dialect == "spark" else "//"
    return f"(({s}) - ((2 * ({s}) + {ADX_N}) {d} {2 * ADX_N}) + ({x}))"


def _wilder_fold3(list_col: str, dialect: str) -> str:
    """Fold a list of (p, m, t) structs through THREE parallel Wilder
    smoothings (plus-DM, minus-DM, true range), seeded with the first
    element — one pass, one accumulator."""
    if dialect == "spark":
        return (
            f"aggregate(slice({list_col}, 2, size({list_col}) - 1), "
            f"element_at({list_col}, 1), "
            "(acc, x) -> named_struct("
            f"'p', {_wilder('acc.p', 'x.p', 'spark')}, "
            f"'m', {_wilder('acc.m', 'x.m', 'spark')}, "
            f"'t', {_wilder('acc.t', 'x.t', 'spark')}))"
        )
    return (
        f"list_reduce({list_col}, (acc, x) -> {{"
        f"'p': {_wilder('acc.p', 'x.p', 'duckdb')}, "
        f"'m': {_wilder('acc.m', 'x.m', 'duckdb')}, "
        f"'t': {_wilder('acc.t', 'x.t', 'duckdb')}}})"
    )


def _wilder_fold1(list_col: str, dialect: str) -> str:
    """Scalar Wilder fold (for the second smoothing pass over DX)."""
    if dialect == "spark":
        return (
            f"aggregate(slice({list_col}, 2, size({list_col}) - 1), "
            f"element_at({list_col}, 1), "
            f"(acc, x) -> {_wilder('acc', 'x', 'spark')})"
        )
    return (
        f"list_reduce({list_col}, "
        f"(acc, x) -> {_wilder('acc', 'x', 'duckdb')})"
    )


def q_window_adx(spark, sf_dir):
    """ADX(14) directional-movement system over ship-day bars of
    lineitem prices: +DM/−DM/TR per day from the bar-to-bar moves, three
    PARALLEL Wilder smoothings as ONE struct-accumulator fold, DI+/DI−
    as half-up x10^4 integer ratios, DX from the DI pair, and ADX as a
    second Wilder fold over the DX series — trend-strength measurement,
    the one classic indicator whose state is a VECTOR (the repo's other
    folds smooth scalars).

    Every arithmetic step is integer-exact cross-engine; both fold
    passes run over day-grain trailing frames bounded by ADX_TRUNC at
    any SF.  Seeding is EMA-style (first frame element) rather than
    Wilder's textbook first-n sum — documented variant, chosen so both
    fold passes share one uniform shape."""
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
        F.max("cents").alias("h"),
        F.min("cents").alias("l"),
        F.max(F.when(F.col("rn_d") == 1, F.col("cents"))).alias("c"),
    )
    w = Window.orderBy("day")
    ph, pl, pc = F.lag("h").over(w), F.lag("l").over(w), F.lag("c").over(w)
    up, dn = F.col("h") - ph, pl - F.col("l")
    dm = bars.select(
        "day",
        F.when(ph.isNull() | ~((up > dn) & (up > 0)), F.lit(0))
        .otherwise(up)
        .cast("long")
        .alias("p"),
        F.when(pl.isNull() | ~((dn > up) & (dn > 0)), F.lit(0))
        .otherwise(dn)
        .cast("long")
        .alias("m"),
        F.when(pc.isNull(), F.col("h") - F.col("l"))
        .otherwise(
            F.greatest(
                F.col("h") - F.col("l"),
                F.abs(F.col("h") - pc),
                F.abs(F.col("l") - pc),
            )
        )
        .cast("long")
        .alias("t"),
    )
    wf = Window.orderBy("day").rowsBetween(-(ADX_TRUNC - 1), 0)
    framed = dm.select(
        "day",
        F.count(F.lit(1)).over(wf).alias("n"),
        F.collect_list(F.struct("p", "m", "t")).over(wf).alias("arr"),
    ).filter(F.col("n") == ADX_TRUNC)
    sm = F.expr(_wilder_fold3("arr", "spark"))
    di = framed.select(
        "day",
        sm["p"].alias("sp"),
        sm["m"].alias("sm_"),
        sm["t"].alias("st"),
    ).filter(F.col("st") > 0)
    di = di.select(
        "day",
        F.expr("(2 * 10000 * sp + st) div (2 * st)").alias("dip"),
        F.expr("(2 * 10000 * sm_ + st) div (2 * st)").alias("dim"),
    ).filter(F.col("dip") + F.col("dim") > 0)
    dx = di.select(
        "day",
        "dip",
        "dim",
        F.expr(
            "(2 * 10000 * abs(dip - dim) + (dip + dim)) div (2 * (dip + dim))"
        ).alias("dx"),
    )
    wf2 = Window.orderBy("day").rowsBetween(-(ADX_TRUNC - 1), 0)
    framed2 = dx.select(
        "day",
        "dip",
        "dim",
        "dx",
        F.count(F.lit(1)).over(wf2).alias("n2"),
        F.collect_list("dx").over(wf2).alias("dxs"),
    ).filter(F.col("n2") == ADX_TRUNC)
    adx = F.expr(_wilder_fold1("dxs", "spark"))
    return framed2.select(
        "day",
        (F.col("dip") / 100.0).alias("di_plus"),
        (F.col("dim") / 100.0).alias("di_minus"),
        (F.col("dx") / 100.0).alias("dx_v"),
        (adx / 100.0).alias("adx"),
    )


QUERIES.update(
    {
        "ts_holt_linear": q_ts_holt_linear,
        "window_adx": q_window_adx,
    }
)

ORACLES.update(
    {
        "ts_holt_linear": (
            "WITH RECURSIVE daily AS (SELECT "
            "strftime(o_orderdate, '%Y-%m-%d') AS day, "
            "sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) "
            "AS cents FROM orders WHERE o_totalprice IS NOT NULL "
            "GROUP BY 1), "
            "idx AS MATERIALIZED (SELECT day, cents, "
            "row_number() OVER (ORDER BY day) AS i FROM daily), "
            # walk carries (l, b); lp must appear twice (no let-binding in
            # SQL), a plain functional projection per recursion step
            "walk(i, day, l, b) AS ("
            "SELECT i, day, cents, CAST(0 AS BIGINT) FROM idx WHERE i = 1 "
            "UNION ALL SELECT n.i, n.day, "
            f"{_half2('n.cents + w.l + w.b', 'duckdb')}, "
            + _half2(
                f"({_half2('n.cents + w.l + w.b', 'duckdb')} - w.l) + w.b",
                "duckdb",
            )
            + " FROM walk w JOIN idx n ON n.i = w.i + 1) "
            "SELECT day, l / 100.0 AS level, b / 100.0 AS trend, "
            "(l + b) / 100.0 AS forecast_next FROM walk"
        ),
        "window_adx": (
            "WITH li AS (SELECT l_orderkey AS ok, l_linenumber AS ln, "
            "strftime(l_shipdate, '%Y-%m-%d') AS day, "
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) "
            "AS cents FROM lineitem), "
            "r AS (SELECT *, row_number() OVER (PARTITION BY day "
            "ORDER BY ok DESC, ln DESC) AS rn_d FROM li), "
            "bars AS (SELECT day, max(cents) AS h, min(cents) AS l, "
            "max(CASE WHEN rn_d = 1 THEN cents END) AS c FROM r GROUP BY 1), "
            "dm AS (SELECT day, "
            "CAST(CASE WHEN lag(h) OVER w IS NULL OR NOT "
            "(h - lag(h) OVER w > lag(l) OVER w - l AND h - lag(h) OVER w > 0) "
            "THEN 0 ELSE h - lag(h) OVER w END AS BIGINT) AS p, "
            "CAST(CASE WHEN lag(l) OVER w IS NULL OR NOT "
            "(lag(l) OVER w - l > h - lag(h) OVER w AND lag(l) OVER w - l > 0) "
            "THEN 0 ELSE lag(l) OVER w - l END AS BIGINT) AS m, "
            "CAST(CASE WHEN lag(c) OVER w IS NULL THEN h - l ELSE "
            "greatest(h - l, abs(h - lag(c) OVER w), abs(l - lag(c) OVER w)) "
            "END AS BIGINT) AS t FROM bars WINDOW w AS (ORDER BY day)), "
            "framed AS (SELECT day, count(*) OVER wf AS n, "
            "list({'p': p, 'm': m, 't': t}) OVER wf AS arr FROM dm "
            f"WINDOW wf AS (ORDER BY day ROWS BETWEEN {ADX_TRUNC - 1} "
            "PRECEDING AND CURRENT ROW)), "
            f"sm AS (SELECT day, {_wilder_fold3('arr', 'duckdb')} AS s "
            f"FROM framed WHERE n = {ADX_TRUNC}), "
            "di AS (SELECT day, "
            "(2 * 10000 * s.p + s.t) // (2 * s.t) AS dip, "
            "(2 * 10000 * s.m + s.t) // (2 * s.t) AS dim "
            "FROM sm WHERE s.t > 0), "
            "dx AS (SELECT day, dip, dim, "
            "(2 * 10000 * abs(dip - dim) + (dip + dim)) // (2 * (dip + dim)) "
            "AS dx FROM di WHERE dip + dim > 0), "
            "framed2 AS (SELECT day, dip, dim, dx, count(*) OVER wf2 AS n2, "
            "list(dx) OVER wf2 AS dxs FROM dx "
            f"WINDOW wf2 AS (ORDER BY day ROWS BETWEEN {ADX_TRUNC - 1} "
            "PRECEDING AND CURRENT ROW)) "
            "SELECT day, dip / 100.0 AS di_plus, dim / 100.0 AS di_minus, "
            f"dx / 100.0 AS dx_v, {_wilder_fold1('dxs', 'duckdb')} / 100.0 "
            f"AS adx FROM framed2 WHERE n2 = {ADX_TRUNC}"
        ),
    }
)


# =================================================================
# Group T — SAX symbolic series encoding (quartile variant)
# =================================================================

SAX_W = 8  #: PAA segments per user series (symbols per word)


def q_ts_sax_symbols(spark, sf_dir):
    """Symbolic Aggregate approXimation of each user's event-value
    series — the motif/novelty-mining preprocessing step: the series is
    piecewise-aggregated into 8 equal-count segments and each segment's
    MEAN is coded a/b/c/d against the user's own value QUARTILES
    (quartile breakpoints instead of the textbook Gaussian ones: the
    z-normalize step would put a cross-engine float boundary under
    every symbol).

    Exactness: values are integer cents; quartiles of n ints are
    multiples of 1/4 (linear interpolation at quarter positions), so
    q×4 is an exact BIGINT, and "segment mean vs quartile" compares as
    4·sum vs q4·len — pure integer cross-multiplication, no division
    anywhere.  One ranked window per user + two grouped aggs; per-user
    series bound the segment table, the word concat is per-user
    (SAX_W rows max)."""
    load_tables(spark, sf_dir)
    ev = spark.table("events").select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    qs = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.expr("percentile(cents, 0.25) * 4")).cast("long").alias("q1_4"),
        F.round(F.expr("percentile(cents, 0.5)  * 4")).cast("long").alias("q2_4"),
        F.round(F.expr("percentile(cents, 0.75) * 4")).cast("long").alias("q3_4"),
    )
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    idx = ev.withColumn("i", F.row_number().over(wu))
    seg = (
        idx.join(qs.select("user_id", "n_events"), "user_id")
        .withColumn("seg", F.expr(f"((i - 1) * {SAX_W}) div n_events"))
        .groupBy("user_id", "seg")
        .agg(F.sum("cents").alias("s"), F.count(F.lit(1)).alias("m"))
    )
    sym = (
        seg.join(qs, "user_id")
        .select(
            "user_id",
            "seg",
            "n_events",
            F.when(4 * F.col("s") < F.col("q1_4") * F.col("m"), "a")
            .when(4 * F.col("s") < F.col("q2_4") * F.col("m"), "b")
            .when(4 * F.col("s") < F.col("q3_4") * F.col("m"), "c")
            .otherwise("d")
            .alias("sym"),
        )
    )
    return sym.groupBy("user_id", "n_events").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg", "sym"))),
                lambda st: st["sym"],
            ),
            "",
        ).alias("sax")
    )


QUERIES["ts_sax_symbols"] = q_ts_sax_symbols

ORACLES["ts_sax_symbols"] = (
    "WITH ev AS (SELECT user_id, event_id, ts, "
    "CAST(round(value * 100) AS BIGINT) AS cents FROM events), "
    "qs AS (SELECT user_id, count(*) AS n_events, "
    "CAST(round(quantile_cont(cents, 0.25) * 4) AS BIGINT) AS q1_4, "
    "CAST(round(quantile_cont(cents, 0.5)  * 4) AS BIGINT) AS q2_4, "
    "CAST(round(quantile_cont(cents, 0.75) * 4) AS BIGINT) AS q3_4 "
    "FROM ev GROUP BY user_id), "
    "idx AS (SELECT e.*, q.n_events, row_number() OVER "
    "(PARTITION BY e.user_id ORDER BY ts, event_id) AS i "
    "FROM ev e JOIN qs q USING (user_id)), "
    f"seg AS (SELECT user_id, ((i - 1) * {SAX_W}) // n_events AS seg, "
    "sum(cents) AS s, count(*) AS m FROM idx GROUP BY 1, 2), "
    "sym AS (SELECT g.user_id, seg, q.n_events, "
    "CASE WHEN 4 * s < q1_4 * m THEN 'a' "
    "WHEN 4 * s < q2_4 * m THEN 'b' "
    "WHEN 4 * s < q3_4 * m THEN 'c' ELSE 'd' END AS sym "
    "FROM seg g JOIN qs q USING (user_id)) "
    "SELECT user_id, n_events, string_agg(sym, '' ORDER BY seg) AS sax "
    "FROM sym GROUP BY user_id, n_events"
)


# =================================================================
# Group L — embedding whitening (retrieval preprocessing)
# =================================================================

WHITEN_EPS = 1e-6  #: eigenvalue floor (degenerate-direction guard)
WHITEN_OUT = 4     #: whitened components reported per vector


def q_embedding_whitening(spark, sf_dir):
    """ZCA whitening of the embedding corpus — the standard retrieval
    preprocessing that decorrelates dimensions and equalizes variance
    (BERT-flow/whitening-BERT lineage): W = U·diag(1/sqrt(λ+ε))·Uᵀ of
    the corpus covariance; outputs each vector's first 4 whitened
    components.

    Scale plan: covariance is ONE distributed pass — mapInPandas emits
    per-partition moment PARTIALS (count, 64-vector sum, 64×64 Gram),
    the driver collects only #partitions × (64 + 4096) floats (bounded
    by partition count, never corpus size), eigendecomposes the 64×64
    covariance (driver-side, O(d³) with d=64), and broadcasts W for one
    Arrow-batched projection pass.  Partials are summed in sorted
    partition order so the float reduction is deterministic.  Rows-only
    key (a trained float artifact SQL can't replay); pytest replays the
    numpy computation and checks whitened covariance ≈ identity."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    load_tables(spark, sf_dir)
    emb = spark.table("embeddings")

    # arrays-of-double carry the packed moments
    partial_schema = StructType(
        [
            StructField("pid", IntegerType()),
            StructField("n", LongType()),
            StructField("s", ArrayType(DoubleType())),
            StructField("g", ArrayType(DoubleType())),
        ]
    )

    def moments(it):
        pid = -1
        n = 0
        s = None
        g = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            A = np.stack(pdf["embedding"].values).astype(np.float64)
            pid = int(pdf["pid"].iloc[0])
            n += len(A)
            s = A.sum(axis=0) if s is None else s + A.sum(axis=0)
            g = A.T @ A if g is None else g + A.T @ A
        if n:
            yield pd.DataFrame(
                {"pid": [pid], "n": [n], "s": [list(s)], "g": [list(g.ravel())]}
            )

    parts = (
        emb.select(F.spark_partition_id().alias("pid"), "embedding")
        .mapInPandas(moments, partial_schema)
        .collect()
    )
    # deterministic float reduction: fixed partition order
    parts = sorted(parts, key=lambda r: r["pid"])
    if not parts:
        # empty corpus: no moments, no whitening matrix — return the
        # empty projection with the declared schema
        return spark.createDataFrame(
            [],
            "vec_id long, " + ", ".join(
                f"w{i} double" for i in range(WHITEN_OUT)
            ),
        )
    n = sum(r["n"] for r in parts)
    d = len(parts[0]["s"])
    s = np.zeros(d)
    g = np.zeros((d, d))
    for r in parts:
        s += np.asarray(r["s"])
        g += np.asarray(r["g"]).reshape(d, d)
    mu = s / n
    cov = g / n - np.outer(mu, mu)
    lam, U = np.linalg.eigh(cov)
    W = U @ np.diag(1.0 / np.sqrt(lam + WHITEN_EPS)) @ U.T
    bc = spark.sparkContext.broadcast((mu, W))

    out_schema = StructType(
        [StructField("vec_id", LongType())]
        + [StructField(f"w{i}", DoubleType()) for i in range(WHITEN_OUT)]
    )

    def project(it):
        m, Wm = bc.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            A = np.stack(pdf["embedding"].values).astype(np.float64)
            Z = (A - m) @ Wm.T
            out = {"vec_id": pdf["vec_id"].astype("int64").values}
            for i in range(WHITEN_OUT):
                out[f"w{i}"] = np.round(Z[:, i], 4)
            yield pd.DataFrame(out)

    return emb.select("vec_id", "embedding").mapInPandas(project, out_schema)


QUERIES["embedding_whitening"] = q_embedding_whitening
# rows-only: no ORACLES entry — the whitening matrix is a trained float
# artifact; tests/test_r6m_ops.py replays the numpy computation
