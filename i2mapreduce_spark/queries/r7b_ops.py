"""Round-6 additions, batch 28: greedy bigram-LM text generation (the
decode side of the n-gram stack — deterministic argmax, a tiny language
model running INSIDE the engine), statistical power / sample-size
planning (the pre-experiment calculator for the A/B stack), the Money
Flow Index (volume-weighted TA in pure integers), and ViT-style patch
tiling over the multimodal metadata (grid plumbing the image encoder
consumes, no codec needed).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..catalog import load_tables
from ..plans.iterate import checkpoint_without_stats

#: greedy generation length (tokens after the seed)
GEN_STEPS = 20

#: power analysis: z(alpha/2=0.025) and z(power=0.80), python literals
Z_ALPHA = 1.959963984540054
Z_BETA = 0.8416212335729143
POWER_EFFECTS_PM = (10, 20, 50)   # relative MDE: 1%, 2%, 5% of the mean

#: MFI lookback (days)
MFI_N = 14

#: ViT patch size (pixels)
TILE_P = 16


def q_text_greedy_generate(spark, sf_dir):
    """GREEDY text generation from the corpus bigram LM: seed with the
    globally most-frequent token, then 20 steps of argmax next-token
    (ties break lexicographically) — deterministic decoding, the
    inference half of the n-gram stack (text_bigram_lm_score is the
    scoring half).  The successor table is one rank-1 window over the
    bigram counts (vocab-bounded); the unrolled chain is GEN_STEPS
    joins against that bounded table.  Oracle: a recursive CTE walks
    the same successor function."""
    load_tables(spark, sf_dir)
    d = spark.table("documents")
    ws = F.split("text", " ")
    big = (
        # the size >= 2 guard matters: Spark's sequence(1, 0) counts DOWN
        # ([1, 0]), which would fabricate an invalid bigram for a 1-word doc
        d.filter(F.size(ws) >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(split(text, ' ')) - 1), "
                    "i -> struct(element_at(split(text, ' '), i) as w1, "
                    "element_at(split(text, ' '), i + 1) as w2))"
                )
            ).alias("b")
        )
        .select(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wsucc = Window.partitionBy("w1").orderBy(F.col("cnt").desc(), "w2")
    succ = (
        big.withColumn("rn", F.row_number().over(wsucc))
        .filter(F.col("rn") == 1)
        .select("w1", "w2")
        .transform(checkpoint_without_stats)
    )
    uni = (
        d.select(F.explode(ws).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wseed = Window.orderBy(F.col("c").desc(), "w")
    seed = (
        uni.withColumn("rn", F.row_number().over(wseed))
        .filter(F.col("rn") == 1)
        .select(F.lit(0).alias("step"), F.col("w").alias("word"))
        .transform(checkpoint_without_stats)
    )
    chain = seed
    cur = seed
    for i in range(1, GEN_STEPS + 1):
        cur = (
            cur.join(succ, cur.word == succ.w1)
            .select(F.lit(i).alias("step"), F.col("w2").alias("word"))
            .transform(checkpoint_without_stats)
        )
        chain = chain.unionAll(cur)
    return chain


def q_agg_power_sample_size(spark, sf_dir):
    """Pre-experiment POWER ANALYSIS: for relative minimum detectable
    effects of 1/2/5% of mean order value, the per-variant sample size
    n = ceil((z_a + z_b)^2 * 2 * s^2 / delta^2) at alpha 5% two-sided,
    power 80% — the calculator every A/B platform runs before assigning
    traffic (pairs with agg_cuped_adjustment downstream).

    Variance comes from exact integer-cents moments summed in
    DECIMAL(38)/HUGEINT (sum of squared cents leaves BIGINT near sf1),
    z constants enter as python literals, and the per-effect rows are a
    literal explode — both engines stream identical numbers into the
    final fixed-shape double expression."""
    load_tables(spark, sf_dir)
    o = spark.table("orders").select(
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents")
    )
    mom = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("s1"),
        F.sum(
            (F.col("cents").cast("decimal(38,0)") * F.col("cents")).cast(
                "decimal(38,0)"
            )
        ).alias("s2"),
    )
    eff = mom.select(
        "n",
        "s1",
        "s2",
        F.explode(
            F.array(*[F.lit(e) for e in POWER_EFFECTS_PM])
        ).alias("effect_pm"),
    )
    # try_divide: with n <= 1 the sample variance is undefined — NULL
    # on both engines (DuckDB x/0 is NULL; Spark ANSI / would throw)
    mean = F.try_divide(F.col("s1").cast("double"), F.col("n"))
    var = F.try_divide(
        F.col("n").cast("double") * F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double"),
        F.col("n").cast("double") * (F.col("n") - 1),
    )
    delta = F.col("effect_pm") * mean / 1000.0
    zz = (Z_ALPHA + Z_BETA) ** 2
    return eff.select(
        "effect_pm",
        F.round(mean / 100.0, 6).alias("mean_value"),
        F.round(F.sqrt(var) / 100.0, 6).alias("sd_value"),
        F.ceil(zz * 2.0 * var / (delta * delta)).cast("long").alias(
            "n_per_variant"
        ),
    )


def q_window_mfi(spark, sf_dir):
    """Money Flow Index — the volume-weighted RSI: raw money flow =
    typical price x volume, split into positive/negative by the typical
    price's direction, MFI = 100 * pos / (pos + neg) over 14 days.
    Entirely exact integers: TP stays as the x3 cents sum (H+L+C, scale
    cancels in the ratio), volume is the integer quantity sum, and the
    index is ONE half-up per-mille quotient of two exact window sums.
    Bounded daily grain (TA precedent)."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem").select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("day"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    wd = Window.partitionBy("day").orderBy(F.col("ok").desc(), F.col("ln").desc())
    r = li.withColumn("rn_d", F.row_number().over(wd))
    bars = r.groupBy("day").agg(
        (
            F.max("cents")
            + F.min("cents")
            + F.max(F.when(F.col("rn_d") == 1, F.col("cents")))
        ).alias("tp3"),
        F.sum("qty").alias("vol"),
    )
    w = Window.orderBy("day")
    flows = bars.select(
        "day",
        "tp3",
        (F.col("tp3") * F.col("vol")).alias("mf"),
        F.lag("tp3").over(w).alias("ptp3"),
    ).filter(F.col("ptp3").isNotNull())
    wf = Window.orderBy("day").rowsBetween(-(MFI_N - 1), 0)
    summed = flows.select(
        "day",
        F.sum(F.when(F.col("tp3") > F.col("ptp3"), F.col("mf")).otherwise(0))
        .over(wf)
        .alias("pos"),
        F.sum(F.when(F.col("tp3") < F.col("ptp3"), F.col("mf")).otherwise(0))
        .over(wf)
        .alias("neg"),
        F.count(F.lit(1)).over(wf).alias("nw"),
    ).filter(F.col("nw") == MFI_N)
    return summed.select(
        "day",
        "pos",
        "neg",
        # the x1000 product widens to DECIMAL(38,0) (r10: 14-day money
        # flow passes 1e17 at hostile magnitudes, so 2000x overflows
        # int64); the per-mille quotient <= 1000 keeps div's long result
        # safe
        F.expr(
            "CASE WHEN pos + neg = 0 THEN 500 "
            "ELSE (2 * 1000 * CAST(pos AS DECIMAL(38,0)) + (pos + neg)) "
            "div (2 * (pos + neg)) END"
        ).alias("mfi_pm"),
    )


def q_multimodal_tile_grid(spark, sf_dir):
    """ViT-style PATCH TILING over the multimodal metadata: from each
    payload's (width, height), emit the 16x16 patch grid — patch index,
    pixel box (clamped at the right/bottom edges), and per-image patch
    count — the exact plumbing a vision encoder's preprocessing step
    feeds from, with no codec in the loop (the fixture adapter derives
    width/height from the payload length, the same contract the other
    multimodal keys use).  One generate, embarrassingly parallel."""
    from ..operators.multimodal import attach_binary_payload

    load_tables(spark, sf_dir)
    d = attach_binary_payload(spark.table("documents"))
    g = d.select(
        "doc_id",
        F.col("meta")["width"].alias("w"),
        F.col("meta")["height"].alias("h"),
    ).select(
        "doc_id",
        "w",
        "h",
        F.expr(f"(w + {TILE_P} - 1) div {TILE_P}").alias("nx"),
        F.expr(f"(h + {TILE_P} - 1) div {TILE_P}").alias("ny"),
    )
    t = g.select(
        "doc_id",
        "w",
        "h",
        (F.col("nx") * F.col("ny")).alias("n_patches"),
        F.explode(F.expr("sequence(0, nx * ny - 1)")).alias("p"),
        F.col("nx"),
    )
    px = F.col("p") % F.col("nx")
    py = F.expr("p div nx")
    return t.select(
        "doc_id",
        "n_patches",
        F.col("p").alias("patch_idx"),
        (px * TILE_P).alias("x0"),
        (py * TILE_P).alias("y0"),
        F.least(px * TILE_P + TILE_P, F.col("w")).alias("x1"),
        F.least(py * TILE_P + TILE_P, F.col("h")).alias("y1"),
    )


QUERIES = {
    "text_greedy_generate": q_text_greedy_generate,
    "agg_power_sample_size": q_agg_power_sample_size,
    "window_mfi": q_window_mfi,
    "multimodal_tile_grid": q_multimodal_tile_grid,
}

ORACLES = {
    "text_greedy_generate": (
        "WITH RECURSIVE big AS (SELECT w1, w2, count(*) AS cnt FROM ("
        "SELECT ws[i] AS w1, ws[i + 1] AS w2 FROM "
        "(SELECT string_split(text, ' ') AS ws FROM documents), "
        "unnest(range(1, len(ws))) AS t(i)) GROUP BY 1, 2), "
        "succ AS (SELECT w1, w2 FROM (SELECT w1, w2, row_number() OVER "
        "(PARTITION BY w1 ORDER BY cnt DESC, w2) AS rn FROM big) "
        "WHERE rn = 1), "
        "seed AS (SELECT w FROM (SELECT w, row_number() OVER "
        "(ORDER BY count(*) DESC, w) AS rn FROM (SELECT unnest("
        "string_split(text, ' ')) AS w FROM documents) GROUP BY w) "
        "WHERE rn = 1), "
        "gen(step, word) AS ("
        "SELECT 0, w FROM seed "
        "UNION ALL "
        "SELECT g.step + 1, s.w2 FROM gen g JOIN succ s ON s.w1 = g.word "
        f"WHERE g.step < {GEN_STEPS}) "
        "SELECT CAST(step AS INT) AS step, word FROM gen"
    ),
    "agg_power_sample_size": (
        "WITH o AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 "
        "AS BIGINT) AS cents FROM orders), "
        "mom AS (SELECT count(*) AS n, sum(cents::HUGEINT) AS s1, "
        "sum(cents::HUGEINT * cents) AS s2 FROM o), "
        "eff AS (SELECT n, s1, s2, unnest(["
        + ", ".join(str(e) for e in POWER_EFFECTS_PM)
        + "]) AS effect_pm FROM mom) "
        "SELECT CAST(effect_pm AS INT) AS effect_pm, "
        "round(CAST(s1 AS DOUBLE) / n / 100.0, 6) AS mean_value, "
        "round(sqrt((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE) "
        "- CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) "
        "/ (CAST(n AS DOUBLE) * (n - 1))) / 100.0, 6) AS sd_value, "
        f"CAST(ceil({(Z_ALPHA + Z_BETA) ** 2!r} * 2.0 * "
        "((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE) "
        "- CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) "
        "/ (CAST(n AS DOUBLE) * (n - 1))) "
        "/ ((effect_pm * (CAST(s1 AS DOUBLE) / n) / 1000.0) "
        "* (effect_pm * (CAST(s1 AS DOUBLE) / n) / 1000.0))) AS BIGINT) "
        "AS n_per_variant FROM eff"
    ),
    "window_mfi": (
        "WITH li AS (SELECT l_orderkey AS ok, l_linenumber AS ln, "
        "strftime(l_shipdate, '%Y-%m-%d') AS day, "
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) "
        "AS cents, CAST(l_quantity AS BIGINT) AS qty FROM lineitem), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY day "
        "ORDER BY ok DESC, ln DESC) AS rn_d FROM li), "
        "bars AS (SELECT day, max(cents) + min(cents) "
        "+ max(CASE WHEN rn_d = 1 THEN cents END) AS tp3, "
        "CAST(sum(qty) AS BIGINT) AS vol FROM r GROUP BY 1), "
        "flows AS (SELECT day, tp3, tp3 * vol AS mf, "
        "lag(tp3) OVER (ORDER BY day) AS ptp3 FROM bars), "
        "summed AS (SELECT day, "
        "CAST(sum(CASE WHEN tp3 > ptp3 THEN mf ELSE 0 END) OVER w "
        "AS BIGINT) AS pos, "
        "CAST(sum(CASE WHEN tp3 < ptp3 THEN mf ELSE 0 END) OVER w "
        "AS BIGINT) AS neg, count(*) OVER w AS nw "
        "FROM flows WHERE ptp3 IS NOT NULL "
        f"WINDOW w AS (ORDER BY day ROWS BETWEEN {MFI_N - 1} PRECEDING "
        "AND CURRENT ROW)) "
        "SELECT day, pos, neg, "
        "CAST(CASE WHEN pos + neg = 0 THEN 500 "
        "ELSE (2 * 1000 * pos::HUGEINT + (pos + neg)) // (2 * (pos + neg)) END "
        f"AS BIGINT) AS mfi_pm FROM summed WHERE nw = {MFI_N}"
    ),
    "multimodal_tile_grid": (
        # encode(), not CAST(text AS BLOB): the cast demands ASCII and
        # hard-errors on any multibyte character (r8 unicode sweep)
        "WITH d AS (SELECT doc_id, "
        "(octet_length(encode(text)) % 64) + 1 AS w, "
        "(octet_length(encode(text)) % 48) + 1 AS h FROM documents "
        "WHERE text IS NOT NULL), "
        f"g AS (SELECT doc_id, w, h, (w + {TILE_P} - 1) // {TILE_P} AS nx, "
        f"(h + {TILE_P} - 1) // {TILE_P} AS ny FROM d), "
        "t AS (SELECT doc_id, w, h, nx * ny AS n_patches, "
        "CAST(i AS INT) AS p, nx FROM g, unnest(range(nx * ny)) AS u(i)) "
        "SELECT doc_id, CAST(n_patches AS INT) AS n_patches, "
        "p AS patch_idx, "
        f"CAST((p % nx) * {TILE_P} AS INT) AS x0, "
        f"CAST((p // nx) * {TILE_P} AS INT) AS y0, "
        f"CAST(least((p % nx) * {TILE_P} + {TILE_P}, w) AS INT) AS x1, "
        f"CAST(least((p // nx) * {TILE_P} + {TILE_P}, h) AS INT) AS y1 "
        "FROM t"
    ),
}
