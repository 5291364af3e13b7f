"""Round-6 additions, batch 42: growth accounting (the new/retained/
resurrected/churned DAU ledger — product analytics' core identity),
boxplot five-number summaries per group (exact order statistics, the
visualization primitive), the Choppiness Index (trend-vs-range TA from
one log ratio of exact sums), and a whole-catalog census (every
table's row count in one result — the first query anyone runs on a new
warehouse).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..catalog import TABLES, load_tables

#: choppiness lookback (days)
CHOP_N = 14


def q_agg_growth_accounting(spark, sf_dir):
    """GROWTH ACCOUNTING of daily active users: each (day, user) is NEW
    (first day ever), RETAINED (also active yesterday) or RESURRECTED
    (active before, but not yesterday); users active yesterday but not
    today are CHURNED.  The ledger obeys DAU_t = new + retained +
    resurrected and DAU_{t-1} = retained + churned — the identity every
    growth team reports (and a pure-relational formulation: one
    distinct, two self-joins co-partitioned by user, one min window).
    All exact integer counts."""
    load_tables(spark, sf_dir)
    e = spark.table("events")
    au = e.select(
        F.expr("datediff(CAST(ts AS DATE), DATE '2024-01-01')").alias("d"),
        "user_id",
    ).distinct()
    wmin = Window.partitionBy("user_id")
    flagged = au.select(
        "d",
        "user_id",
        (F.col("d") == F.min("d").over(wmin)).alias("is_new"),
    )
    prev = au.select((F.col("d") + 1).alias("d"), F.col("user_id").alias("pu"))
    today = flagged.join(
        prev,
        (flagged.d == prev.d) & (flagged.user_id == prev.pu),
        "left",
    ).select(
        flagged.d.alias("day"),
        "is_new",
        F.col("pu").isNotNull().alias("was_active"),
    )
    per_day = today.groupBy("day").agg(
        F.sum(F.col("is_new").cast("long")).alias("new_users"),
        F.sum(
            ((~F.col("is_new")) & F.col("was_active")).cast("long")
        ).alias("retained"),
        F.sum(
            ((~F.col("is_new")) & (~F.col("was_active"))).cast("long")
        ).alias("resurrected"),
    )
    nxt = au.select(
        (F.col("d") - 1).alias("nd"), F.col("user_id").alias("nu")
    )
    churn = (
        au.join(
            nxt,
            (au.d == F.col("nd")) & (au.user_id == F.col("nu")),
            "left",
        )
        .filter(F.col("nu").isNull())
        .groupBy((au.d + 1).alias("day"))
        .agg(F.count(F.lit(1)).alias("churned"))
    )
    return (
        per_day.join(churn, "day", "left")
        .select(
            "day",
            "new_users",
            "retained",
            "resurrected",
            F.coalesce("churned", F.lit(0)).alias("churned"),
        )
    )


def q_agg_boxplot_stats(spark, sf_dir):
    """BOXPLOT five-number summary per order priority: min, Q1, median,
    Q3, max as EXACT order statistics (the ceil(p*n) element by
    co-partitioned rank — no interpolation ambiguity), plus the Tukey
    outlier count above Q3 + 1.5 IQR — the statistics every boxplot
    visualization is drawn from, per group in one pass family.
    Everything exact integer cents until display division."""
    load_tables(spark, sf_dir)
    # complete-case: unpriced orders have no value to rank (the engines'
    # default NULL sort orders differ) — excluded on both sides
    o = spark.table("orders").filter(F.col("o_totalprice").isNotNull()).select(
        "o_orderpriority",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("c"),
        "o_orderkey",
    )
    wg = Window.partitionBy("o_orderpriority").orderBy("c", "o_orderkey")
    ranked = o.withColumn("rk", F.row_number().over(wg).cast("long"))
    n = ranked.groupBy("o_orderpriority").agg(F.max("rk").alias("n"))
    j = ranked.join(n, "o_orderpriority")

    def at(pm):  # the ceil(pm*n/1000)-th smallest
        return F.max(
            F.when(
                F.col("rk") == F.expr(f"({pm} * n + 999) div 1000"),
                F.col("c"),
            )
        )

    g = j.groupBy("o_orderpriority").agg(
        F.max("n").alias("n"),
        F.min("c").alias("mn"),
        at(250).alias("q1"),
        at(500).alias("med"),
        at(750).alias("q3"),
        F.max("c").alias("mx"),
    )
    fenced = j.join(
        g.select(
            F.col("o_orderpriority").alias("p2"),
            F.col("q1"),
            F.col("q3"),
        ),
        F.col("o_orderpriority") == F.col("p2"),
    ).filter(
        # upper Tukey fence: c > q3 + 1.5*iqr  <=>  2c > 2*q3 + 3*(q3-q1)
        2 * F.col("c") > 2 * F.col("q3") + 3 * (F.col("q3") - F.col("q1"))
    ).groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_outliers")
    )
    return (
        g.join(fenced, "o_orderpriority", "left")
        .select(
            "o_orderpriority",
            "n",
            (F.col("mn") / 100.0).alias("min_v"),
            (F.col("q1") / 100.0).alias("q1"),
            (F.col("med") / 100.0).alias("median"),
            (F.col("q3") / 100.0).alias("q3"),
            (F.col("mx") / 100.0).alias("max_v"),
            F.coalesce("n_outliers", F.lit(0)).alias("n_outliers"),
        )
    )


def q_window_choppiness(spark, sf_dir):
    """CHOPPINESS INDEX: 100 * log10(sum(TR_14) / (maxH14 - minL14)) /
    log10(14) — is the market trending (low) or ranging (high)?  The
    ratio inside the log is exact integer cents (window sum of true
    ranges over window max/min), both engines evaluate the identical
    log10 of the identical double, and 6dp rounding of a 0-100-range
    value sits far inside double precision.  Bounded daily grain."""
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
    pc = F.lag("c").over(w)
    tr = bars.select(
        "day",
        "h",
        "l",
        (F.greatest(F.col("h"), pc) - F.least(F.col("l"), pc)).alias("tr"),
        pc.alias("pc"),
    ).filter(F.col("pc").isNotNull())
    wf = Window.orderBy("day").rowsBetween(-(CHOP_N - 1), 0)
    s = tr.select(
        "day",
        F.sum("tr").over(wf).alias("trs"),
        F.max("h").over(wf).alias("hh"),
        F.min("l").over(wf).alias("ll"),
        F.count(F.lit(1)).over(wf).alias("nw"),
    ).filter((F.col("nw") == CHOP_N) & (F.col("hh") > F.col("ll")))
    import math

    return s.select(
        "day",
        F.round(
            100.0
            * F.log10(
                F.col("trs").cast("double")
                / (F.col("hh") - F.col("ll")).cast("double")
            )
            / math.log10(CHOP_N),
            6,
        ).alias("choppiness"),
    )


def q_dq_catalog_census(spark, sf_dir):
    """Whole-CATALOG census: one result with every fixture table's row
    count and its share of total rows — the first query anyone runs
    against a new warehouse, and the sanity anchor for every other
    count in the repo.  A union of ten 1-row aggregates (each a
    parallel scan-count with no shuffle beyond the final 10-row agg);
    shares are half-up per-mille integers."""
    load_tables(spark, sf_dir)
    counts = None
    for t in TABLES:
        c = spark.table(t).agg(
            F.lit(t).alias("tbl"), F.count(F.lit(1)).alias("n_rows")
        )
        counts = c if counts is None else counts.unionAll(c)
    tot = counts.agg(F.sum("n_rows").alias("total"))
    return counts.crossJoin(F.broadcast(tot)).select(
        "tbl",
        "n_rows",
        # the zero-total guard matches DuckDB, where x // 0 is NULL (an
        # all-empty catalog has no shares); Spark ANSI div would throw
        F.expr(
            "CASE WHEN total = 0 THEN CAST(NULL AS BIGINT) "
            "ELSE (2 * 1000 * n_rows + total) div (2 * total) END"
        ).alias("share_pm"),
    )


QUERIES = {
    "agg_growth_accounting": q_agg_growth_accounting,
    "agg_boxplot_stats": q_agg_boxplot_stats,
    "window_choppiness": q_window_choppiness,
    "dq_catalog_census": q_dq_catalog_census,
}

import math as _math

ORACLES = {
    "agg_growth_accounting": (
        "WITH au AS (SELECT DISTINCT "
        "date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d, "
        "user_id FROM events), "
        "f AS (SELECT d, user_id, "
        "d = min(d) OVER (PARTITION BY user_id) AS is_new FROM au), "
        "today AS (SELECT f.d AS day, is_new, "
        "p.user_id IS NOT NULL AS was_active FROM f "
        "LEFT JOIN au p ON p.d + 1 = f.d AND p.user_id = f.user_id), "
        "per AS (SELECT day, "
        "CAST(sum(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT) "
        "AS new_users, "
        "CAST(sum(CASE WHEN NOT is_new AND was_active THEN 1 ELSE 0 END) "
        "AS BIGINT) AS retained, "
        "CAST(sum(CASE WHEN NOT is_new AND NOT was_active THEN 1 ELSE 0 "
        "END) AS BIGINT) AS resurrected FROM today GROUP BY 1), "
        "ch AS (SELECT a.d + 1 AS day, CAST(count(*) AS BIGINT) "
        "AS churned FROM au a LEFT JOIN au n "
        "ON n.d = a.d + 1 AND n.user_id = a.user_id "
        "WHERE n.user_id IS NULL GROUP BY 1) "
        "SELECT CAST(per.day AS INT) AS day, new_users, retained, "
        "resurrected, CAST(coalesce(churned, 0) AS BIGINT) AS churned "
        "FROM per LEFT JOIN ch ON per.day = ch.day"
    ),
    "agg_boxplot_stats": (
        "WITH o AS (SELECT o_orderpriority, "
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c, "
        "o_orderkey FROM orders WHERE o_totalprice IS NOT NULL), "
        "r AS (SELECT o_orderpriority, c, CAST(row_number() OVER "
        "(PARTITION BY o_orderpriority ORDER BY c, o_orderkey) "
        "AS BIGINT) AS rk FROM o), "
        "n AS (SELECT o_orderpriority, max(rk) AS n FROM r GROUP BY 1), "
        "g AS (SELECT r.o_orderpriority, max(n.n) AS n, min(c) AS mn, "
        "max(CASE WHEN rk = (250 * n.n + 999) // 1000 THEN c END) AS q1, "
        "max(CASE WHEN rk = (500 * n.n + 999) // 1000 THEN c END) AS med, "
        "max(CASE WHEN rk = (750 * n.n + 999) // 1000 THEN c END) AS q3, "
        "max(c) AS mx FROM r JOIN n ON r.o_orderpriority = "
        "n.o_orderpriority GROUP BY 1), "
        "fen AS (SELECT r.o_orderpriority, count(*) AS n_outliers "
        "FROM r JOIN g ON r.o_orderpriority = g.o_orderpriority "
        "WHERE 2 * c > 2 * q3 + 3 * (q3 - q1) GROUP BY 1) "
        "SELECT g.o_orderpriority, CAST(n AS BIGINT) AS n, "
        "mn / 100.0 AS min_v, q1 / 100.0 AS q1, med / 100.0 AS median, "
        "q3 / 100.0 AS q3, mx / 100.0 AS max_v, "
        "CAST(coalesce(n_outliers, 0) AS BIGINT) AS n_outliers "
        "FROM g LEFT JOIN fen ON g.o_orderpriority = fen.o_orderpriority"
    ),
    "window_choppiness": (
        "WITH li AS (SELECT l_orderkey AS ok, l_linenumber AS ln, "
        "strftime(l_shipdate, '%Y-%m-%d') AS day, "
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) "
        "AS cents FROM lineitem), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY day "
        "ORDER BY ok DESC, ln DESC) AS rn_d FROM li), "
        "bars AS (SELECT day, max(cents) AS h, min(cents) AS l, "
        "max(CASE WHEN rn_d = 1 THEN cents END) AS c FROM r GROUP BY 1), "
        "tr AS (SELECT day, h, l, "
        "greatest(h, lag(c) OVER (ORDER BY day)) "
        "- least(l, lag(c) OVER (ORDER BY day)) AS tr, "
        "lag(c) OVER (ORDER BY day) AS pc FROM bars), "
        "s AS (SELECT day, sum(tr) OVER wf AS trs, max(h) OVER wf AS hh, "
        "min(l) OVER wf AS ll, count(*) OVER wf AS nw "
        "FROM tr WHERE pc IS NOT NULL "
        f"WINDOW wf AS (ORDER BY day ROWS BETWEEN {CHOP_N - 1} PRECEDING "
        "AND CURRENT ROW)) "
        "SELECT day, round(100.0 * log10(CAST(trs AS DOUBLE) "
        f"/ CAST(hh - ll AS DOUBLE)) / {_math.log10(CHOP_N)!r}, 6) "
        f"AS choppiness FROM s WHERE nw = {CHOP_N} AND hh > ll"
    ),
    "dq_catalog_census": (
        "WITH counts AS ("
        + " UNION ALL ".join(
            f"SELECT '{t}' AS tbl, count(*) AS n_rows FROM {t}"
            for t in TABLES
        )
        + "), t AS (SELECT sum(n_rows) AS total FROM counts) "
        "SELECT tbl, CAST(n_rows AS BIGINT) AS n_rows, "
        "CAST((2 * 1000 * n_rows + total) // (2 * total) AS BIGINT) "
        "AS share_pm FROM counts, t"
    ),
}
