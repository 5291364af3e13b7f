"""Round-6 additions, batch 36: Oaxaca-Blinder decomposition (the
econometric split of a group gap into explained vs unexplained),
Burrows' stylometric z-scores (authorship attribution's workhorse over
relative word rates), the Hull moving average (a nested WEIGHTED MA
kept exact by decomposing linear weights into two plain window sums),
and class-balanced downsampling (the deterministic majority-class
subsample every imbalanced-training pipeline runs).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..catalog import load_tables

#: Oaxaca segment split
OAX_SEG = "BUILDING"

#: Burrows: number of top corpus words profiled
BURROWS_K = 10

#: Hull MA lookbacks: n, n/2, sqrt(n)
HMA_N, HMA_H, HMA_S = 16, 8, 4
_D_N = HMA_N * (HMA_N + 1) // 2      # 136
_D_H = HMA_H * (HMA_H + 1) // 2      # 36
_D_S = HMA_S * (HMA_S + 1) // 2      # 10


def q_agg_oaxaca_blinder(spark, sf_dir):
    """OAXACA-BLINDER decomposition of the order-value gap between
    BUILDING-segment customers and everyone else: how much of the mean
    difference is EXPLAINED by account balance (the covariate) at the
    reference group's coefficient, and how much is UNEXPLAINED
    (coefficient + intercept differences) — the econometric audit
    behind wage-gap and pricing-disparity studies.

    Per-group OLS of order cents on customer balance cents runs on
    exact DECIMAL(38)/HUGEINT moments (the xy product leaves BIGINT at
    fixture scale); the two-fold decomposition gap = beta_B*(xA - xB) +
    [(beta_A - beta_B)*xA + (alpha_A - alpha_B)] is a fixed-shape
    double expression and reconciles with the raw gap exactly (OLS
    passes through the means)."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    c = spark.table("customer")
    base = o.join(c, F.col("o_custkey") == F.col("c_custkey")).select(
        (F.col("c_mktsegment") == OAX_SEG).cast("int").alias("g"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("y"),
        (F.col("c_acctbal").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("x"),
    )
    m = base.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum(
            (F.col("x").cast("decimal(38,0)") * F.col("y")).cast(
                "decimal(38,0)"
            )
        ).alias("sxy"),
        F.sum(
            (F.col("x").cast("decimal(38,0)") * F.col("x")).cast(
                "decimal(38,0)"
            )
        ).alias("sxx"),
    )

    def grp(gv, col):
        return F.max(F.when(F.col("g") == gv, F.col(col)))

    wide = m.agg(
        *[
            grp(gv, cname).alias(f"{cname}{gv}")
            for gv in (1, 0)
            for cname in ("n", "sx", "sy", "sxy", "sxx")
        ]
    )

    def beta(tag):
        n, sx, sy = (
            F.col(f"n{tag}").cast("double"),
            F.col(f"sx{tag}").cast("double"),
            F.col(f"sy{tag}").cast("double"),
        )
        sxy, sxx = (
            F.col(f"sxy{tag}").cast("double"),
            F.col(f"sxx{tag}").cast("double"),
        )
        return (n * sxy - sx * sy) / (n * sxx - sx * sx)

    def mean(col, tag):
        return F.col(f"{col}{tag}").cast("double") / F.col(f"n{tag}")

    ba, bb = beta(1), beta(0)
    xa, xb = mean("sx", 1), mean("sx", 0)
    ya, yb = mean("sy", 1), mean("sy", 0)
    aa = ya - ba * xa
    ab = yb - bb * xb
    explained = bb * (xa - xb)
    unexplained = (ba - bb) * xa + (aa - ab)
    return wide.select(
        F.round((ya - yb) / 100.0, 6).alias("gap"),
        F.round(explained / 100.0, 6).alias("explained"),
        F.round(unexplained / 100.0, 6).alias("unexplained"),
        F.round(ba, 6).alias("beta_a"),
        F.round(bb, 6).alias("beta_b"),
    )


def q_text_burrows_delta(spark, sf_dir):
    """BURROWS' stylometric z-score table: for the corpus's top-K words,
    each source's relative rate (per-million tokens, half-up quantized)
    standardized against the across-source mean and standard deviation
    — the feature table Burrows' Delta authorship attribution sums.
    Rates quantize to exact integers BEFORE any cross-source moment, so
    the mean/sd run on identical integers in both engines (the source
    enum is bounded, the z is one fixed-shape double)."""
    load_tables(spark, sf_dir)
    d = spark.table("documents")
    toks = d.select(
        "source", F.explode(F.split("text", " ")).alias("w")
    )
    topk = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.col("c").desc(), F.col("w"))
            ),
        )
        .filter(F.col("rk") <= BURROWS_K)
        .select("w")
    )
    per_src = toks.groupBy("source").agg(F.count(F.lit(1)).alias("tot"))
    cnt = (
        toks.join(topk, "w")
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .join(per_src, "source")
    )
    rated = cnt.select(
        "source",
        "w",
        F.expr("(2 * 1000000 * c + tot) div (2 * tot)").alias("r6"),
    )
    ww = Window.partitionBy("w")
    scored = rated.select(
        "source",
        "w",
        "r6",
        F.sum("r6").over(ww).alias("s1"),
        F.sum(F.col("r6") * F.col("r6")).over(ww).alias("s2"),
        F.count(F.lit(1)).over(ww).alias("k"),
    )
    # try_divide: with a single source (k = 1) the cross-source spread
    # is undefined — NULL on both engines (DuckDB x/0 is NULL)
    mean = F.try_divide(F.col("s1").cast("double"), F.col("k"))
    sd = F.sqrt(
        F.try_divide(
            F.col("k").cast("double") * F.col("s2").cast("double")
            - F.col("s1").cast("double") * F.col("s1").cast("double"),
            F.col("k").cast("double") * (F.col("k") - 1),
        )
    )
    return scored.select(
        "w",
        "source",
        (F.col("r6") / 1000000.0).alias("rate"),
        F.round((F.col("r6") - mean) / sd, 6).alias("z"),
    )


def q_window_hull_ma(spark, sf_dir):
    """HULL moving average — the low-lag nested WEIGHTED MA:
    HMA = WMA_sqrt(n)(2*WMA_n/2 - WMA_n).  Weighted MAs are not plain
    window sums, but LINEAR weights decompose: with consecutive row
    positions rn, sum_j (k - rn_t + rn_j) * x_j = (k - rn_t) * S0 +
    S1 where S0, S1 are ORDINARY window sums of x and rn*x — so every
    stage stays an EXACT integer numerator over a constant denominator
    (36, 136, then 10), and only the display division is floating.
    Bounded daily grain (TA precedent)."""
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
        F.max(F.when(F.col("rn_d") == 1, F.col("cents"))).alias("c")
    )
    wo = Window.orderBy("day")
    pos = bars.select(
        "day", "c", F.row_number().over(wo).cast("long").alias("rn")
    )

    def wma_num(xcol, k):
        # numerators in DECIMAL(38,0) (r10 extreme-magnitude sweep):
        # cents*rn alone passes 1e17 and the staged rawn/hman
        # numerators 1e20+ at hostile value scales
        wf = Window.orderBy("day").rowsBetween(-(k - 1), 0)
        s0 = F.sum(xcol.cast("decimal(38,0)")).over(wf)
        s1 = F.sum((xcol * F.col("rn")).cast("decimal(38,0)")).over(wf)
        return (F.lit(k) - F.col("rn")) * s0 + s1

    staged = pos.select(
        "day",
        "rn",
        F.count(F.lit(1))
        .over(Window.orderBy("day").rowsBetween(-(HMA_N - 1), 0))
        .alias("nw"),
        wma_num(F.col("c"), HMA_H).alias("nh"),
        wma_num(F.col("c"), HMA_N).alias("nn"),
    ).filter(F.col("nw") == HMA_N)
    # raw_t = 2*nh/36 - nn/136 = (2*136*nh - 36*nn) / 4896, keep numerator
    raw = staged.select(
        "day",
        "rn",
        (2 * _D_N * F.col("nh") - _D_H * F.col("nn"))
        .cast("decimal(38,0)")
        .alias("rawn"),
    )
    wf2 = Window.orderBy("day").rowsBetween(-(HMA_S - 1), 0)
    final = raw.select(
        "day",
        (
            (F.lit(HMA_S) - F.col("rn")) * F.sum("rawn").over(wf2)
            + F.sum(F.col("rawn") * F.col("rn")).over(wf2)
        ).alias("hman"),
        F.count(F.lit(1)).over(wf2).alias("sw"),
    ).filter(F.col("sw") == HMA_S)
    return final.select(
        "day",
        (F.col("hman") / float(_D_N * _D_H * 2 * _D_S) * 2.0 / 100.0).alias(
            "hma"
        ),
    )


def q_sample_balanced_downsample(spark, sf_dir):
    """CLASS-BALANCED downsampling: keep exactly min-class-count rows of
    EVERY event type, chosen by deterministic md5 rank within the class
    — the majority-class subsample imbalanced training pipelines apply
    (and reproducibly: same data -> same sample, any partitioning).
    One per-class ranked window (co-partitioned by class), one bounded
    1-row minimum, and a rank filter; the output is the per-class
    before/after audit."""
    load_tables(spark, sf_dir)
    e = spark.table("events")
    wc = Window.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string")), "event_id"
    )
    ranked = e.select(
        "event_type",
        "event_id",
        F.row_number().over(wc).cast("long").alias("rk"),
    )
    counts = ranked.groupBy("event_type").agg(F.max("rk").alias("n"))
    mn = counts.agg(F.min("n").alias("m"))
    kept = ranked.crossJoin(F.broadcast(mn)).filter(
        F.col("rk") <= F.col("m")
    )
    return (
        kept.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_kept"))
        .join(counts, "event_type")
        .select(
            "event_type",
            F.col("n").alias("n_original"),
            "n_kept",
        )
    )


QUERIES = {
    "agg_oaxaca_blinder": q_agg_oaxaca_blinder,
    "text_burrows_delta": q_text_burrows_delta,
    "window_hull_ma": q_window_hull_ma,
    "sample_balanced_downsample": q_sample_balanced_downsample,
}

ORACLES = {
    "agg_oaxaca_blinder": (
        "WITH base AS (SELECT "
        f"CASE WHEN c_mktsegment = '{OAX_SEG}' THEN 1 ELSE 0 END AS g, "
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y, "
        "CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS x "
        "FROM orders JOIN customer ON o_custkey = c_custkey), "
        "m AS (SELECT g, count(*) AS n, sum(CAST(x AS HUGEINT)) AS sx, "
        "sum(CAST(y AS HUGEINT)) AS sy, "
        "sum(CAST(x AS HUGEINT) * y) AS sxy, "
        "sum(CAST(x AS HUGEINT) * x) AS sxx FROM base GROUP BY 1), "
        "w AS (SELECT "
        + ", ".join(
            f"max(CASE WHEN g = {gv} THEN {c} END) AS {c}{gv}"
            for gv in (1, 0)
            for c in ("n", "sx", "sy", "sxy", "sxx")
        )
        + " FROM m), "
        "d AS (SELECT *, "
        "(CAST(n1 AS DOUBLE) * CAST(sxy1 AS DOUBLE) "
        "- CAST(sx1 AS DOUBLE) * CAST(sy1 AS DOUBLE)) "
        "/ (CAST(n1 AS DOUBLE) * CAST(sxx1 AS DOUBLE) "
        "- CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE)) AS ba, "
        "(CAST(n0 AS DOUBLE) * CAST(sxy0 AS DOUBLE) "
        "- CAST(sx0 AS DOUBLE) * CAST(sy0 AS DOUBLE)) "
        "/ (CAST(n0 AS DOUBLE) * CAST(sxx0 AS DOUBLE) "
        "- CAST(sx0 AS DOUBLE) * CAST(sx0 AS DOUBLE)) AS bb, "
        "CAST(sx1 AS DOUBLE) / n1 AS xa, CAST(sx0 AS DOUBLE) / n0 AS xb, "
        "CAST(sy1 AS DOUBLE) / n1 AS ya, CAST(sy0 AS DOUBLE) / n0 AS yb "
        "FROM w) "
        "SELECT round((ya - yb) / 100.0, 6) AS gap, "
        "round(bb * (xa - xb) / 100.0, 6) AS explained, "
        "round(((ba - bb) * xa + ((ya - ba * xa) - (yb - bb * xb))) "
        "/ 100.0, 6) AS unexplained, "
        "round(ba, 6) AS beta_a, round(bb, 6) AS beta_b FROM d"
    ),
    "text_burrows_delta": (
        "WITH toks AS (SELECT source, unnest(string_split(text, ' ')) "
        "AS w FROM documents), "
        "topk AS (SELECT w FROM (SELECT w, row_number() OVER "
        "(ORDER BY count(*) DESC, w) AS rk FROM toks GROUP BY w) "
        f"WHERE rk <= {BURROWS_K}), "
        "ps AS (SELECT source, count(*) AS tot FROM toks GROUP BY 1), "
        "cnt AS (SELECT t.source, t.w, count(*) AS c FROM toks t "
        "JOIN topk USING (w) GROUP BY 1, 2), "
        "rated AS (SELECT cnt.source, w, "
        "(2 * 1000000 * c + tot) // (2 * tot) AS r6 "
        "FROM cnt JOIN ps ON cnt.source = ps.source), "
        "scored AS (SELECT source, w, r6, "
        "sum(r6) OVER (PARTITION BY w) AS s1, "
        "sum(r6 * r6) OVER (PARTITION BY w) AS s2, "
        "count(*) OVER (PARTITION BY w) AS k FROM rated) "
        "SELECT w, source, r6 / 1000000.0 AS rate, "
        "round((r6 - CAST(s1 AS DOUBLE) / k) / "
        "sqrt((CAST(k AS DOUBLE) * CAST(s2 AS DOUBLE) "
        "- CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) "
        "/ (CAST(k AS DOUBLE) * (k - 1))), 6) AS z FROM scored"
    ),
    "window_hull_ma": (
        "WITH li AS (SELECT l_orderkey AS ok, l_linenumber AS ln, "
        "strftime(l_shipdate, '%Y-%m-%d') AS day, "
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) "
        "AS cents FROM lineitem), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY day "
        "ORDER BY ok DESC, ln DESC) AS rn_d FROM li), "
        "bars AS (SELECT day, max(CASE WHEN rn_d = 1 THEN cents END) AS c "
        "FROM r GROUP BY 1), "
        "pos AS (SELECT day, c, CAST(row_number() OVER (ORDER BY day) "
        "AS BIGINT) AS rn FROM bars), "
        "staged AS (SELECT day, rn, "
        f"count(*) OVER wn AS nw, "
        f"({HMA_H} - rn) * sum(c::HUGEINT) OVER wh "
        "+ sum(c::HUGEINT * rn) OVER wh AS nh, "
        f"({HMA_N} - rn) * sum(c::HUGEINT) OVER wn "
        "+ sum(c::HUGEINT * rn) OVER wn AS nn "
        "FROM pos "
        f"WINDOW wh AS (ORDER BY day ROWS BETWEEN {HMA_H - 1} PRECEDING "
        "AND CURRENT ROW), "
        f"wn AS (ORDER BY day ROWS BETWEEN {HMA_N - 1} PRECEDING "
        "AND CURRENT ROW)), "
        f"raw AS (SELECT day, rn, 2 * {_D_N} * nh - {_D_H} * nn AS rawn "
        f"FROM staged WHERE nw = {HMA_N}), "
        "final AS (SELECT day, "
        f"({HMA_S} - rn) * sum(rawn) OVER ws + sum(rawn * rn) OVER ws "
        "AS hman, count(*) OVER ws AS sw FROM raw "
        f"WINDOW ws AS (ORDER BY day ROWS BETWEEN {HMA_S - 1} PRECEDING "
        "AND CURRENT ROW)) "
        f"SELECT day, CAST(hman AS DOUBLE) / {float(_D_N * _D_H * 2 * _D_S)!r} "
        f"* 2.0 / 100.0 AS hma FROM final WHERE sw = {HMA_S}"
    ),
    "sample_balanced_downsample": (
        "WITH ranked AS (SELECT event_type, event_id, "
        "CAST(row_number() OVER (PARTITION BY event_type "
        "ORDER BY md5(event_id::VARCHAR), event_id) AS BIGINT) AS rk "
        "FROM events), "
        "counts AS (SELECT event_type, max(rk) AS n FROM ranked "
        "GROUP BY 1), "
        "mn AS (SELECT min(n) AS m FROM counts) "
        "SELECT r.event_type, CAST(c.n AS BIGINT) AS n_original, "
        "CAST(count(*) AS BIGINT) AS n_kept "
        "FROM ranked r, mn JOIN counts c ON r.event_type = c.event_type "
        "WHERE r.rk <= mn.m GROUP BY 1, 2"
    ),
}
