"""Round-6 additions, batch 35: the chain-ladder development triangle
(actuarial IBNR estimation — cohort x age cumulative factors), the
accumulation/distribution line (volume-flow TA with signed exact
increments), a monotonicity audit (does key order track time order),
and the hashing-trick featurizer (fixed-width sparse features from
unbounded vocab — the ML feature-prep primitive).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..catalog import load_tables

#: feature hashing: slot count (power of two)
FH_SLOTS = 64


def q_agg_chain_ladder(spark, sf_dir):
    """CHAIN-LADDER development factors: orders cohorted by placement
    month, 'paid' amounts developing by months-to-ship — the cumulative
    triangle whose volume-weighted age-to-age factors
    f_d = sum_c C(c, d+1) / sum_c C(c, d) are the actuarial IBNR
    machinery (and in data engineering: cohort maturation curves).

    The triangle is one partial+final agg to (cohort, dev) integer
    cents, the cumulative runs over the tiny per-cohort dev axis, and
    each factor is ONE ratio of two exact BIGINT sums restricted to
    cohorts that have reached age d+1 (the standard all-available-
    cohorts estimator)."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem").join(
        spark.table("orders"), F.col("l_orderkey") == F.col("o_orderkey")
    )
    base = li.select(
        (
            (F.year("o_orderdate") - 1992) * 12
            + F.month("o_orderdate")
            - 1
        ).alias("cohort"),
        (
            (F.year("l_shipdate") - F.year("o_orderdate")) * 12
            + F.month("l_shipdate")
            - F.month("o_orderdate")
        ).alias("dev"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    tri = base.groupBy("cohort", "dev").agg(F.sum("cents").alias("inc"))
    wc = (
        Window.partitionBy("cohort")
        .orderBy("dev")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = tri.select(
        "cohort", "dev", F.sum("inc").over(wc).alias("c")
    )
    nxt = cum.select(
        F.col("cohort").alias("cohort2"),
        (F.col("dev") - 1).alias("dev"),
        F.col("c").alias("c_next"),
    )
    j = cum.join(
        nxt,
        (F.col("cohort") == F.col("cohort2"))
        & (cum.dev == nxt.dev),
    )
    g = j.groupBy(cum.dev.alias("dev")).agg(
        F.count(F.lit(1)).alias("n_cohorts"),
        F.sum("c").alias("den"),
        F.sum("c_next").alias("num"),
    )
    return g.select(
        "dev",
        "n_cohorts",
        F.round(
            F.col("num").cast("double") / F.col("den").cast("double"), 6
        ).alias("age_to_age_factor"),
    )


def q_window_acc_dist(spark, sf_dir):
    """Accumulation/Distribution line: per day, the close-location value
    CLV = ((C-L) - (H-C)) / (H-L) weighted by volume, accumulated over
    time — the volume-flow indicator answering 'is money entering or
    leaving'.  The daily increment is a SIGN-DECOMPOSED half-up x100
    integer (the numerator (2C-L-H) is signed, and truncating div vs
    flooring // agree only on non-negatives), so the running total is
    an EXACT integer prefix sum; flat days (H=L) contribute 0 by
    declared convention.  Bounded daily grain (TA precedent)."""
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
        F.max("cents").alias("h"),
        F.min("cents").alias("l"),
        F.max(F.when(F.col("rn_d") == 1, F.col("cents"))).alias("c"),
        F.sum("qty").alias("v"),
    )
    inc = F.expr(
        "CASE WHEN h = l THEN 0 "
        "WHEN 2 * c - l - h >= 0 THEN "
        "(2 * 100 * (2 * c - l - h) * v + (h - l)) div (2 * (h - l)) "
        "ELSE -((2 * 100 * (l + h - 2 * c) * v + (h - l)) "
        "div (2 * (h - l))) END"
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    scored = bars.select("day", inc.alias("inc_x"))
    return scored.select(
        "day",
        (F.col("inc_x") / 100.0).alias("ad_increment"),
        (F.sum("inc_x").over(w) / 100.0).alias("ad_line"),
    )


def q_dq_monotonic_violations(spark, sf_dir):
    """MONOTONICITY audit: within each priority stream, does key order
    track time order?  Counts adjacent inversions (previous key's date
    later than this one) under the (priority, key) order — the check
    that validates k-sortable id schemes (fn_snowflake_id's property)
    and append-only ingestion assumptions.  One co-partitioned lag
    window and a per-mille summary in exact integers."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_orderkey")
    lagged = o.select(
        "o_orderpriority",
        (F.col("o_orderdate") < F.lag("o_orderdate").over(w))
        .cast("long")
        .alias("inv"),
    ).filter(F.col("inv").isNotNull())
    g = lagged.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("inv").alias("n_inversions"),
    )
    return g.select(
        "o_orderpriority",
        "n_pairs",
        "n_inversions",
        F.expr(
            "(2 * 1000 * n_inversions + n_pairs) div (2 * n_pairs)"
        ).alias("inversion_pm"),
    )


def q_text_feature_hashing(spark, sf_dir):
    """HASHING-TRICK featurizer: every document's character trigrams
    hash into a FIXED 64-slot vector (slot = 16 md5 bits mod 64) — the
    feature-hashing primitive that gives unbounded vocabularies a
    bounded, join-free feature space (Weinberger et al.).  Output is
    the sparse (doc, slot, count) triple table; collisions are part of
    the declared semantics.  Pure string/hash builtins, one explode +
    one agg keyed by doc — embarrassingly parallel."""
    load_tables(spark, sf_dir)
    d = spark.table("documents")
    tri = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(length(text) - 2, 1)), "
                "i -> substring(text, i, 3))"
            )
        ).alias("t"),
    )
    slot = (
        F.conv(F.substring(F.md5("t"), 1, 4), 16, 10).cast("long")
        % FH_SLOTS
    )
    return tri.select("doc_id", slot.alias("slot")).groupBy(
        "doc_id", "slot"
    ).agg(F.count(F.lit(1)).alias("cnt"))


QUERIES = {
    "agg_chain_ladder": q_agg_chain_ladder,
    "window_acc_dist": q_window_acc_dist,
    "dq_monotonic_violations": q_dq_monotonic_violations,
    "text_feature_hashing": q_text_feature_hashing,
}

ORACLES = {
    "agg_chain_ladder": (
        "WITH base AS (SELECT "
        "(year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1 "
        "AS cohort, "
        "(year(l_shipdate) - year(o_orderdate)) * 12 "
        "+ month(l_shipdate) - month(o_orderdate) AS dev, "
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) "
        "AS cents FROM lineitem JOIN orders ON l_orderkey = o_orderkey), "
        "tri AS (SELECT cohort, dev, sum(cents) AS inc "
        "FROM base GROUP BY 1, 2), "
        "cum AS (SELECT cohort, dev, sum(inc) OVER (PARTITION BY cohort "
        "ORDER BY dev ROWS UNBOUNDED PRECEDING) AS c FROM tri), "
        "j AS (SELECT a.dev, a.c AS c, b.c AS c_next FROM cum a "
        "JOIN cum b ON a.cohort = b.cohort AND b.dev = a.dev + 1) "
        "SELECT CAST(dev AS INT) AS dev, "
        "CAST(count(*) AS BIGINT) AS n_cohorts, "
        "round(CAST(sum(c_next) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6) "
        "AS age_to_age_factor FROM j GROUP BY 1"
    ),
    "window_acc_dist": (
        "WITH li AS (SELECT l_orderkey AS ok, l_linenumber AS ln, "
        "strftime(l_shipdate, '%Y-%m-%d') AS day, "
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) "
        "AS cents, CAST(l_quantity AS BIGINT) AS qty FROM lineitem), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY day "
        "ORDER BY ok DESC, ln DESC) AS rn_d FROM li), "
        "bars AS (SELECT day, max(cents) AS h, min(cents) AS l, "
        "max(CASE WHEN rn_d = 1 THEN cents END) AS c, "
        "CAST(sum(qty) AS BIGINT) AS v FROM r GROUP BY 1), "
        "scored AS (SELECT day, CASE WHEN h = l THEN 0 "
        "WHEN 2 * c - l - h >= 0 THEN "
        "(2 * 100 * (2 * c - l - h) * v + (h - l)) // (2 * (h - l)) "
        "ELSE -((2 * 100 * (l + h - 2 * c) * v + (h - l)) "
        "// (2 * (h - l))) END AS inc_x FROM bars) "
        "SELECT day, inc_x / 100.0 AS ad_increment, "
        "CAST(sum(inc_x) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) "
        "AS BIGINT) / 100.0 AS ad_line FROM scored"
    ),
    "dq_monotonic_violations": (
        "WITH lagged AS (SELECT o_orderpriority, "
        "CASE WHEN o_orderdate < lag(o_orderdate) OVER "
        "(PARTITION BY o_orderpriority ORDER BY o_orderkey) "
        "THEN 1 ELSE 0 END AS inv, "
        "lag(o_orderdate) OVER (PARTITION BY o_orderpriority "
        "ORDER BY o_orderkey) AS prev FROM orders) "
        "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_pairs, "
        "CAST(sum(inv) AS BIGINT) AS n_inversions, "
        "CAST((2 * 1000 * sum(inv) + count(*)) // (2 * count(*)) "
        "AS BIGINT) AS inversion_pm "
        "FROM lagged WHERE prev IS NOT NULL GROUP BY 1"
    ),
    "text_feature_hashing": (
        "WITH tri AS (SELECT doc_id, unnest(list_transform("
        "range(1, greatest(length(text) - 2, 1) + 1), "
        "i -> substr(text, CAST(i AS INT), 3))) AS t FROM documents) "
        "SELECT doc_id, "
        f"(('0x' || substr(md5(t), 1, 4))::BIGINT % {FH_SLOTS}) AS slot, "
        "CAST(count(*) AS BIGINT) AS cnt FROM tri GROUP BY 1, 2"
    ),
}
