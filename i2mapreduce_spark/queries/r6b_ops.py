"""Round-6 additions, batch 2: two-sample statistics, chi-square
independence, MACD, and n-gram coverage.  Same float discipline as the
rest of the repo: exact integer/DECIMAL accumulation, and where a value
is irreducibly float (EMA folds), a SEQUENTIAL ordered fold evaluated
with the identical operand order on both engines.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..catalog import load_tables

# =================================================================
# Group D — statistical tests
# =================================================================

TT_A, TT_B = "click", "purchase"


def q_agg_welch_ttest(spark, sf_dir):
    """Welch's two-sample t-test between the click and purchase `value`
    populations — the A/B-comparison primitive.  Moments come from exact
    DECIMAL sums (s, ss per group; one partial+final agg over the fact),
    and the t statistic and Welch-Satterthwaite df are a handful of
    double ops on those identical exact operands — deterministic on both
    engines.  Output: one row (n/mean per arm, t_stat, df)."""
    load_tables(spark, sf_dir)
    e = spark.table("events").filter(F.col("event_type").isin(TT_A, TT_B))
    v = F.col("value").cast("decimal(18,6)")
    g = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).alias("s"),
        # (38,6), not (18,6): value² passes 1e13 at 1e6-scaled values
        # (r10 extreme-magnitude sweep) — the double product itself is
        # the shared deterministic quantity; only its decimal container
        # needed widening
        F.sum((F.col("value") * F.col("value")).cast("decimal(38,6)")).alias(
            "ss"
        ),
    )
    a = g.filter(F.col("event_type") == TT_A).select(
        F.col("n").alias("n1"), F.col("s").alias("s1"), F.col("ss").alias("ss1")
    )
    b = g.filter(F.col("event_type") == TT_B).select(
        F.col("n").alias("n2"), F.col("s").alias("s2"), F.col("ss").alias("ss2")
    )
    j = a.crossJoin(b)  # 1x1
    m1 = F.col("s1").cast("double") / F.col("n1")
    m2 = F.col("s2").cast("double") / F.col("n2")
    # sample variance from the exact integer identity, one double cast
    v1 = (F.col("n1") * F.col("ss1") - F.col("s1") * F.col("s1")).cast(
        "double"
    ) / (F.col("n1") * (F.col("n1") - 1))
    v2 = (F.col("n2") * F.col("ss2") - F.col("s2") * F.col("s2")).cast(
        "double"
    ) / (F.col("n2") * (F.col("n2") - 1))
    se1 = v1 / F.col("n1")
    se2 = v2 / F.col("n2")
    t = (m1 - m2) / F.sqrt(se1 + se2)
    df = (se1 + se2) * (se1 + se2) / (
        se1 * se1 / (F.col("n1") - 1) + se2 * se2 / (F.col("n2") - 1)
    )
    return j.select(
        F.col("n1"),
        F.col("n2"),
        F.round(m1, 6).alias("mean1"),
        F.round(m2, 6).alias("mean2"),
        F.round(t, 6).alias("t_stat"),
        F.round(df, 4).alias("df"),
    )


def q_agg_chi_square(spark, sf_dir):
    """Chi-square independence cells for event_type x day-of-week: per
    cell the observed count, expected count e = row*col/N and the
    contribution (o-e)^2/e — the seasonality-independence audit.
    Per-cell output only (the keyspace is types x 7, bounded): summing
    the contributions would be an unordered float reduction, which is
    exactly the cross-engine trap; each cell's value is a deterministic
    expression of four exact integers.  The N/row/col marginals are
    window sums over the tiny cell table."""
    load_tables(spark, sf_dir)
    e = spark.table("events")
    cells = e.groupBy(
        "event_type", F.dayofweek("ts").alias("dow")
    ).agg(F.count(F.lit(1)).alias("o"))
    wr = Window.partitionBy("event_type")
    wc = Window.partitionBy("dow")
    wt = Window.partitionBy()
    scored = cells.select(
        "event_type",
        "dow",
        "o",
        F.sum("o").over(wr).alias("r"),
        F.sum("o").over(wc).alias("c"),
        F.sum("o").over(wt).alias("n"),
    )
    exp = F.col("r") * F.col("c") / F.col("n").cast("double")
    return scored.select(
        "event_type",
        "dow",
        "o",
        F.round(exp, 6).alias("expected"),
        F.round((F.col("o") - exp) * (F.col("o") - exp) / exp, 6).alias(
            "contribution"
        ),
    )


# =================================================================
# Group W — MACD
# =================================================================

#: EMA spans (days) and the truncation horizon (the residual weight of
#: data past 64 steps is ~3e-5 of the signal for the fastest span; the
#: truncation bounds per-row work at any SF and both engines compute the
#: IDENTICAL truncated definition).
MACD_FAST, MACD_SLOW, MACD_SIGNAL = 12, 26, 9
MACD_TRUNC = 64
#: shift applied before the signal fold so every accumulator stays
#: positive (macd cents go negative; Spark's `div` truncates while
#: DuckDB's `//` floors — they agree only on non-negatives).  Fixed-
#: point EMA is EXACTLY shift-invariant: (s+1)·C divides out of the
#: half-up quotient, so the offset subtracts back out losslessly.
MACD_OFFSET = 10 ** 12


def _ema_fix(list_col: str, span: int, dialect: str) -> str:
    """Fixed-point integer-cents EMA as a LEFT fold, seeded with the
    first element: acc' = round_half_up((2·x + (s−1)·acc) / (s+1)) with
    the half-up quotient in pure integers ((2v+d) div 2d).  Float EMA
    folds are NOT reproducible across engines (measured: DuckDB's
    vectorized lambda contracts the multiply-add, drifting ~1 ulp/step
    vs Spark/python), so this key defines the indicator in exact
    fixed-point — deterministic everywhere by construction."""
    s1 = span + 1
    body = f"(2 * (2 * x + {span - 1} * acc) + {s1})"
    if dialect == "spark":
        return (
            f"aggregate(slice({list_col}, 2, size({list_col}) - 1), "
            f"element_at({list_col}, 1), "
            f"(acc, x) -> {body} div {2 * s1})"
        )
    return (
        f"list_reduce({list_col}, (acc, x) -> {body} // {2 * s1})"
    )


def q_window_macd(spark, sf_dir):
    """MACD(12,26,9) over the daily-revenue series in FIXED-POINT integer
    cents: fast/slow EMAs as half-up integer folds over the trailing-64-
    day ordered frame list, signal = EMA-9 of the (offset-shifted) MACD
    cents, histogram = macd − signal, standard cross classification.
    Day-grain pre-aggregation bounds the window input by the SPAN at any
    SF, and every arithmetic step is integer-exact cross-engine (see
    _ema_fix: float EMA folds drift per-engine)."""
    load_tables(spark, sf_dir)
    # complete-case: a day whose orders all lack a price is a gap in the
    # series, same as a day with no orders (and collect_list skips NULLs
    # where DuckDB's list() keeps them — the series must not carry NULL)
    o = spark.table("orders").filter(F.col("o_totalprice").isNotNull())
    daily = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day")
    ).agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
        ).alias("cents")
    )
    w = Window.orderBy("day").rowsBetween(-(MACD_TRUNC - 1), 0)
    framed = daily.select(
        "day",
        F.count(F.lit(1)).over(w).alias("n"),
        F.collect_list("cents").over(w).alias("xs"),
    ).filter(F.col("n") == MACD_TRUNC)
    lined = framed.select(
        "day",
        (
            F.expr(_ema_fix("xs", MACD_FAST, "spark"))
            - F.expr(_ema_fix("xs", MACD_SLOW, "spark"))
        ).alias("mc"),
    )
    w2 = Window.orderBy("day").rowsBetween(-(MACD_TRUNC - 1), 0)
    sig = lined.select(
        "day",
        "mc",
        F.count(F.lit(1)).over(w2).alias("n2"),
        F.collect_list(F.col("mc") + MACD_OFFSET).over(w2).alias("ms"),
    ).filter(F.col("n2") == MACD_TRUNC)
    sc = F.expr(_ema_fix("ms", MACD_SIGNAL, "spark")) - MACD_OFFSET
    return sig.select(
        "day",
        (F.col("mc") / 100.0).alias("macd"),
        (sc / 100.0).alias("signal"),
        ((F.col("mc") - sc) / 100.0).alias("hist"),
        F.when(F.col("mc") > sc, "bullish")
        .when(F.col("mc") < sc, "bearish")
        .otherwise("cross")
        .alias("stance"),
    )


# =================================================================
# Group L — n-gram coverage
# =================================================================

NGRAM_COVER_TOPK = 20


def q_text_ngram_coverage(spark, sf_dir):
    """Bigram coverage curve: the top-20 corpus bigrams ranked by count
    (ties -> lexicographic) with each rank's CUMULATIVE share of all
    bigram occurrences — 'how much of the corpus do the top-k patterns
    explain', the compression/boilerplate diagnostic.  Counts and the
    cumulative sum are exact integers over the top-20 spine (bounded);
    one double division per row."""
    load_tables(spark, sf_dir)
    d = spark.table("documents")
    toks = d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "w")
    ).filter(F.col("w") != "")
    nxt = toks.select(
        "doc_id", (F.col("pos") - 1).alias("pos"), F.col("w").alias("w2")
    )
    bg = (
        toks.join(nxt, ["doc_id", "pos"])
        .select(F.concat_ws(" ", "w", "w2").alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = bg.agg(F.sum("cnt").alias("total"))
    ranked = (
        bg.withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.col("cnt").desc(), "bigram")),
        )
        .filter(F.col("rank") <= NGRAM_COVER_TOPK)
    )
    wcum = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    return (
        ranked.crossJoin(F.broadcast(total))
        .select(
            "rank",
            "bigram",
            "cnt",
            F.round(
                F.sum("cnt").over(wcum).cast("double") / F.col("total"), 6
            ).alias("cum_share"),
        )
    )


QUERIES = {
    "agg_welch_ttest": q_agg_welch_ttest,
    "agg_chi_square": q_agg_chi_square,
    "window_macd": q_window_macd,
    "text_ngram_coverage": q_text_ngram_coverage,
}

ORACLES = {
    "agg_welch_ttest": (
        "WITH g AS (SELECT event_type, count(*) AS n, "
        "sum(CAST(value AS DECIMAL(18,6))) AS s, "
        "sum(CAST(value * value AS DECIMAL(25,6))) AS ss FROM events "
        f"WHERE event_type IN ('{TT_A}', '{TT_B}') GROUP BY 1), "
        f"a AS (SELECT n AS n1, s AS s1, ss AS ss1 FROM g WHERE event_type = '{TT_A}'), "
        f"b AS (SELECT n AS n2, s AS s2, ss AS ss2 FROM g WHERE event_type = '{TT_B}'), "
        "j AS (SELECT *, CAST(s1 AS DOUBLE) / n1 AS m1, "
        "CAST(s2 AS DOUBLE) / n2 AS m2, "
        "CAST(n1 * ss1 - s1 * s1 AS DOUBLE) / (n1 * (n1 - 1)) / n1 AS se1, "
        "CAST(n2 * ss2 - s2 * s2 AS DOUBLE) / (n2 * (n2 - 1)) / n2 AS se2 "
        "FROM a, b) "
        "SELECT n1, n2, round(m1, 6) AS mean1, round(m2, 6) AS mean2, "
        "round((m1 - m2) / sqrt(se1 + se2), 6) AS t_stat, "
        "round((se1 + se2) * (se1 + se2) / "
        "(se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1)), 4) AS df FROM j"
    ),
    "agg_chi_square": (
        "WITH cells AS (SELECT event_type, dayofweek(ts) + 1 AS dow, "
        "count(*) AS o FROM events GROUP BY 1, 2), "
        "scored AS (SELECT event_type, dow, o, "
        "sum(o) OVER (PARTITION BY event_type) AS r, "
        "sum(o) OVER (PARTITION BY dow) AS c, "
        "sum(o) OVER () AS n FROM cells) "
        "SELECT event_type, dow, o, "
        "round(r * c / CAST(n AS DOUBLE), 6) AS expected, "
        "round((o - r * c / CAST(n AS DOUBLE)) * "
        "(o - r * c / CAST(n AS DOUBLE)) / (r * c / CAST(n AS DOUBLE)), 6) "
        "AS contribution FROM scored"
    ),
    "window_macd": (
        "WITH daily AS (SELECT strftime(o_orderdate, '%Y-%m-%d') AS day, "
        "sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) "
        "AS cents FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1), "
        "framed AS (SELECT day, count(*) OVER w AS n, "
        "list(cents) OVER w AS xs FROM daily "
        f"WINDOW w AS (ORDER BY day ROWS BETWEEN {MACD_TRUNC - 1} PRECEDING "
        "AND CURRENT ROW)), "
        "lined AS (SELECT day, "
        f"{_ema_fix('xs', MACD_FAST, 'duckdb')} - "
        f"{_ema_fix('xs', MACD_SLOW, 'duckdb')} AS mc "
        f"FROM framed WHERE n = {MACD_TRUNC}), "
        "sig AS (SELECT day, mc, count(*) OVER w2 AS n2, "
        f"list(mc + {MACD_OFFSET}) OVER w2 AS ms FROM lined "
        f"WINDOW w2 AS (ORDER BY day ROWS BETWEEN {MACD_TRUNC - 1} PRECEDING "
        "AND CURRENT ROW)), "
        "fin AS (SELECT day, mc, "
        f"{_ema_fix('ms', MACD_SIGNAL, 'duckdb')} - {MACD_OFFSET} AS sc "
        f"FROM sig WHERE n2 = {MACD_TRUNC}) "
        "SELECT day, mc / 100.0 AS macd, sc / 100.0 AS signal, "
        "(mc - sc) / 100.0 AS hist, "
        "CASE WHEN mc > sc THEN 'bullish' WHEN mc < sc "
        "THEN 'bearish' ELSE 'cross' END AS stance FROM fin"
    ),
    "text_ngram_coverage": (
        "WITH toks AS (SELECT doc_id, "
        "generate_subscripts(string_split(text, ' '), 1) AS pos, "
        "unnest(string_split(text, ' ')) AS w FROM documents), "
        "tf AS (SELECT doc_id, pos, w FROM toks WHERE w <> ''), "
        "bg AS (SELECT a.w || ' ' || b.w AS bigram, count(*) AS cnt "
        "FROM tf a JOIN tf b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1 "
        "GROUP BY 1), "
        "t AS (SELECT sum(cnt) AS total FROM bg), "
        "ranked AS (SELECT bigram, cnt, "
        "row_number() OVER (ORDER BY cnt DESC, bigram) AS rank FROM bg "
        f"QUALIFY rank <= {NGRAM_COVER_TOPK}) "
        "SELECT rank, bigram, cnt, "
        "round(CAST(sum(cnt) OVER (ORDER BY rank) AS DOUBLE) / total, 6) "
        "AS cum_share FROM ranked, t"
    ),
}


def q_agg_ks_test(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov between the click and purchase
    `value` distributions: D = max_v |F1(v) - F2(v)|, the
    distribution-shift detector behind data-drift monitoring.  Exact
    formulation: maximize |c1(v)*n2 - c2(v)*n1| in INTEGERS over the
    distinct-value spine (cumulative counts via the distributed
    chunked-offset prefix sum - the spine scales with data, so no
    unpartitioned window), one double division at the end.  Argmax ties
    break to the smallest value via a lexicographic min(struct).
    Output: one row (n1, n2, d_num, ks_d, at_value)."""
    from ..operators.ranking import global_running_sum

    load_tables(spark, sf_dir)
    # complete-case: NULL values cannot be ranked on the value spine
    # (engines' default NULL orders differ) — excluded on both sides
    e = spark.table("events").filter(
        F.col("event_type").isin(TT_A, TT_B) & F.col("value").isNotNull()
    )
    g = e.groupBy("value").agg(
        F.sum((F.col("event_type") == TT_A).cast("long")).alias("c1"),
        F.sum((F.col("event_type") == TT_B).cast("long")).alias("c2"),
    )
    pref = global_running_sum(g, ["value"], ["c1", "c2"])
    tot = g.agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    scored = pref.crossJoin(F.broadcast(tot)).select(
        "value",
        "n1",
        "n2",
        F.abs(
            F.col("cum_c1") * F.col("n2") - F.col("cum_c2") * F.col("n1")
        ).alias("score"),
    )
    best = scored.groupBy("n1", "n2").agg(
        F.min(F.struct((-F.col("score")).alias("ns"), F.col("value").alias("v"))).alias("m")
    )
    return best.select(
        "n1",
        "n2",
        (-F.col("m.ns")).alias("d_num"),
        F.round(
            (-F.col("m.ns")).cast("double") / (F.col("n1") * F.col("n2")), 6
        ).alias("ks_d"),
        F.col("m.v").alias("at_value"),
    )


def q_agg_mann_whitney(spark, sf_dir):
    """Mann-Whitney U (rank-sum) between click and purchase values with
    tie-corrected normal approximation — the non-parametric A/B test.
    All rank arithmetic in exact integers on the distinct-value spine:
    tied groups contribute c1·(a+b) to 2·R1 (twice the average rank is
    the integer a+b), U from 2U1 = 2R1 − n1(n1+1), tie term T = Σ(t³−t);
    prefix positions via the distributed chunked-offset sum.  The z
    statistic is a handful of double ops on those identical exact
    integers.  Output: one row (n1, n2, u1, z)."""
    from ..operators.ranking import global_running_sum

    load_tables(spark, sf_dir)
    # complete-case: NULL values cannot be ranked on the value spine
    # (engines' default NULL orders differ) — excluded on both sides
    e = spark.table("events").filter(
        F.col("event_type").isin(TT_A, TT_B) & F.col("value").isNotNull()
    )
    g = e.groupBy("value").agg(
        F.sum((F.col("event_type") == TT_A).cast("long")).alias("c1"),
        F.sum((F.col("event_type") == TT_B).cast("long")).alias("c2"),
    ).withColumn("t", F.col("c1") + F.col("c2"))
    pref = global_running_sum(g, ["value"], ["t"])
    terms = pref.select(
        "c1",
        "t",
        # tied group occupies ranks [cum_t - t + 1 .. cum_t]; a+b below
        (2 * F.col("cum_t") - F.col("t") + 1).alias("ab"),
    )
    agg = terms.agg(
        F.sum(F.col("c1") * F.col("ab")).alias("two_r1"),
        F.sum("c1").alias("n1"),
        F.sum(F.col("t") - F.col("c1")).alias("n2"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("tie_t"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    nn = n1 + n2
    u1 = (F.col("two_r1") - n1 * (n1 + 1)) / 2.0
    mu = n1.cast("double") * n2 / 2.0
    var = (
        n1.cast("double") * n2 / 12.0
        * ((nn + 1) - F.col("tie_t").cast("double") / (nn * (nn - 1)))
    )
    return agg.select(
        "n1",
        "n2",
        u1.alias("u1"),
        F.round((u1 - mu) / F.sqrt(var), 6).alias("z"),
    )


QUERIES["agg_ks_test"] = q_agg_ks_test
QUERIES["agg_mann_whitney"] = q_agg_mann_whitney

ORACLES["agg_ks_test"] = (
    "WITH g AS (SELECT value, "
    f"sum(CASE WHEN event_type = '{TT_A}' THEN 1 ELSE 0 END) AS c1, "
    f"sum(CASE WHEN event_type = '{TT_B}' THEN 1 ELSE 0 END) AS c2 "
    f"FROM events WHERE event_type IN ('{TT_A}', '{TT_B}') AND value IS NOT NULL GROUP BY 1), "
    "pref AS (SELECT value, "
    "sum(c1) OVER (ORDER BY value) AS cc1, sum(c2) OVER (ORDER BY value) AS cc2 "
    "FROM g), "
    "tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2 FROM g), "
    "scored AS (SELECT value, n1, n2, abs(cc1 * n2 - cc2 * n1) AS score "
    "FROM pref, tot) "
    "SELECT n1, n2, CAST(score AS BIGINT) AS d_num, "
    "round(CAST(score AS DOUBLE) / (n1 * n2), 6) AS ks_d, value AS at_value "
    "FROM scored ORDER BY score DESC, value LIMIT 1"
)

ORACLES["agg_mann_whitney"] = (
    "WITH g AS (SELECT value, "
    f"sum(CASE WHEN event_type = '{TT_A}' THEN 1 ELSE 0 END) AS c1, "
    f"sum(CASE WHEN event_type = '{TT_B}' THEN 1 ELSE 0 END) AS c2, "
    "count(*) AS t "
    f"FROM events WHERE event_type IN ('{TT_A}', '{TT_B}') AND value IS NOT NULL GROUP BY 1), "
    "pref AS (SELECT c1, t, 2 * sum(t) OVER (ORDER BY value) - t + 1 AS ab "
    "FROM g), "
    "agg AS (SELECT CAST(sum(c1 * ab) AS BIGINT) AS two_r1, "
    "CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(t - c1) AS BIGINT) AS n2, "
    "CAST(sum(t * t * t - t) AS BIGINT) AS tie_t FROM pref) "
    "SELECT n1, n2, (two_r1 - n1 * (n1 + 1)) / 2.0 AS u1, "
    "round(((two_r1 - n1 * (n1 + 1)) / 2.0 - CAST(n1 AS DOUBLE) * n2 / 2.0) / "
    "sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0 * ((n1 + n2 + 1) - "
    "CAST(tie_t AS DOUBLE) / ((n1 + n2) * (n1 + n2 - 1)))), 6) AS z "
    "FROM agg"
)
