"""Round-6 additions, batch 29: the two-proportion z-test (the
conversion-rate A/B readout completing the experimentation trio with
power analysis and CUPED), ABC inventory classification (cumulative
revenue-share banding over the distributed prefix sum), Williams
fractals (the swing-point detector — pure lag/lead window logic), and
observed-holiday calendar flags (the Sat->Fri / Sun->Mon shifting rule
plain date functions don't know).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..catalog import load_tables
from ..operators.ranking import global_running_sum

#: ABC bands: cumulative revenue share cut-offs (per-mille)
ABC_A_PM = 800
ABC_B_PM = 950

#: fractal wing width (bars on each side)
FRACTAL_K = 2

#: fixed-date holidays (month, day, name) with observed shifting
HOLIDAYS = ((1, 1, "new_year"), (7, 4, "independence"), (12, 25, "christmas"))


def q_agg_two_proportion_ztest(spark, sf_dir):
    """Two-proportion z-test on conversion: does the user_id-parity
    'variant' change the share of purchase events?  The categorical
    counterpart of agg_welch_ttest and the readout agg_power_sample_size
    plans for: z = (p1 - p2) / sqrt(p_pool (1 - p_pool) (1/n1 + 1/n2)).
    Every count is an exact integer from ONE partial+final agg; the z
    statistic is a single fixed-shape double expression of six exact
    integers, so both engines agree bit-for-bit."""
    load_tables(spark, sf_dir)
    e = spark.table("events")
    g = e.groupBy((F.col("user_id") % 2).alias("variant")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("k"),
    )
    wide = g.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("variant") == 0, F.col("k"))).alias("k1"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n2"),
        F.max(F.when(F.col("variant") == 1, F.col("k"))).alias("k2"),
    )
    n1, k1 = F.col("n1").cast("double"), F.col("k1").cast("double")
    n2, k2 = F.col("n2").cast("double"), F.col("k2").cast("double")
    pp = (k1 + k2) / (n1 + n2)
    # try_divide: pooled p of 0 or 1 (no successes anywhere, or all
    # successes) makes the denominator 0 — Spark ANSI '/' would throw
    # DIVIDE_BY_ZERO where DuckDB's x/0 yields NULL; NULL z / NULL
    # verdict is the right undefined-test answer on both engines
    z = F.try_divide(
        k1 / n1 - k2 / n2, F.sqrt(pp * (1 - pp) * (1 / n1 + 1 / n2))
    )
    # the test needs BOTH variants observed; on empty/one-armed input
    # there is no comparison to report (oracle mirrors with WHERE)
    return wide.filter(
        F.col("n1").isNotNull() & F.col("n2").isNotNull()
    ).select(
        "n1",
        "k1",
        "n2",
        "k2",
        F.round(z, 6).alias("z_stat"),
        # coalesce: with z undefined (pooled p = 0 or 1) the test cannot
        # reject — and a NULL boolean renders engine-differently through
        # pandas (Spark None vs DuckDB NaN), so keep the verdict NOT NULL
        F.coalesce(
            F.abs(z) > 1.959963984540054, F.lit(False)
        ).alias("reject_05"),
    )


def q_agg_abc_classification(spark, sf_dir):
    """ABC inventory classification: rank parts by revenue, band them
    where cumulative revenue share crosses 80% (A) and 95% (B), rest C —
    the Pareto stock-control analysis behind every inventory policy.

    Plan: one partial+final agg to per-part revenue cents, then the
    DISTRIBUTED chunked-offset prefix sum over (revenue desc, partkey)
    (ranking.global_running_sum — no single-partition window), then the
    band test 1000 * cum <= pm * total in EXACT integers (no division
    at all), and a bounded 3-row roll-up."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem")
    per_part = li.groupBy("l_partkey").agg(
        (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")) * 100)
        .cast("long")
        .alias("cents")
    )
    # order by revenue DESC via negated cents (exact integer key)
    keyed = per_part.select(
        "l_partkey", "cents", (-F.col("cents")).alias("neg")
    )
    cum = global_running_sum(keyed, ["neg", "l_partkey"], ["cents"])
    tot = cum.agg(F.max("cum_cents").alias("total"))
    # band test cross-multiplied in DECIMAL(38,0) (r10: 1000 x total
    # cents passes 1e19 at hostile magnitudes)
    cumD = F.col("cum_cents").cast("decimal(38,0)")
    totD = F.col("total").cast("decimal(38,0)")
    banded = cum.crossJoin(F.broadcast(tot)).select(
        "cents",
        F.when(1000 * cumD <= ABC_A_PM * totD, "A")
        .when(1000 * cumD <= ABC_B_PM * totD, "B")
        .otherwise("C")
        .alias("abc"),
    )
    return (
        banded.groupBy("abc")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("cents").alias("band_cents"),
        )
        .select(
            "abc",
            "n_parts",
            (F.col("band_cents") / 100.0).alias("band_revenue"),
        )
    )


def q_window_fractals(spark, sf_dir):
    """Williams FRACTALS over daily high/low bars: a fractal high is a
    bar whose high exceeds the highs of the FRACTAL_K bars on each side
    (strictly, ties lose), symmetrically for lows — the swing-point
    primitive breakout/support-resistance systems are built on.  Pure
    lag/lead comparisons on exact integer cents over the bounded daily
    grain; rows missing a full wing are excluded by construction."""
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
    w = Window.orderBy("day")
    cond_h = F.lit(True)
    cond_l = F.lit(True)
    for k in range(1, FRACTAL_K + 1):
        cond_h = (
            cond_h
            & (F.col("h") > F.lag("h", k).over(w))
            & (F.col("h") > F.lead("h", k).over(w))
        )
        cond_l = (
            cond_l
            & (F.col("l") < F.lag("l", k).over(w))
            & (F.col("l") < F.lead("l", k).over(w))
        )
    scored = bars.select(
        "day",
        (F.col("h") / 100.0).alias("high"),
        (F.col("l") / 100.0).alias("low"),
        F.coalesce(cond_h, F.lit(False)).alias("fractal_high"),
        F.coalesce(cond_l, F.lit(False)).alias("fractal_low"),
    )
    return scored.filter(F.col("fractal_high") | F.col("fractal_low"))


def q_fn_holiday_observed(spark, sf_dir):
    """OBSERVED-holiday calendar: fixed-date holidays shift to Friday
    when they fall on Saturday and to Monday when on Sunday (the US
    federal observance rule) — the calendar-join primitive behind
    settlement dates, SLA clocks and staffing models; plain date
    functions cannot express the shift.  Weekday from pure day-number
    arithmetic (anchor Monday, (x % 7): 5 = Sat, 6 = Sun); orders gain
    (is_holiday_observed, holiday_name).  One small equi-join on the
    synthesized holiday spine (bounded: years x holidays)."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    years = range(1992, 1999)
    rows = ", ".join(
        f"(DATE '{y}-{m:02d}-{d:02d}', '{name}')"
        for y in years
        for (m, d, name) in HOLIDAYS
    )
    spine = spark.sql(
        f"SELECT raw, name, "
        "CASE datediff(raw, DATE '1991-12-30') % 7 "
        "WHEN 5 THEN date_sub(raw, 1) "
        "WHEN 6 THEN date_add(raw, 1) "
        "ELSE raw END AS observed "
        f"FROM VALUES {rows} AS t(raw, name)"
    )
    return (
        o.join(
            F.broadcast(spine), F.col("o_orderdate") == F.col("observed")
        )
        .groupBy(
            # string, not DATE: Spark DATE -> datetime.date but DuckDB
            # DATE -> pandas Timestamp, and the value-hash renders them
            # differently ('1996-01-01' vs '1996-01-01T00:00:00')
            F.date_format("observed", "yyyy-MM-dd").alias("holiday_date"),
            "name",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("rev_cents"),
        )
        .select(
            "holiday_date",
            "name",
            "n_orders",
            (F.col("rev_cents") / 100.0).alias("holiday_revenue"),
        )
    )


QUERIES = {
    "agg_two_proportion_ztest": q_agg_two_proportion_ztest,
    "agg_abc_classification": q_agg_abc_classification,
    "window_fractals": q_window_fractals,
    "fn_holiday_observed": q_fn_holiday_observed,
}

_HOLIDAY_ROWS = ", ".join(
    f"(DATE '{y}-{m:02d}-{d:02d}', '{name}')"
    for y in range(1992, 1999)
    for (m, d, name) in HOLIDAYS
)

ORACLES = {
    "agg_two_proportion_ztest": (
        "WITH g AS (SELECT user_id % 2 AS variant, count(*) AS n, "
        "sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS k "
        "FROM events GROUP BY 1), "
        "w AS (SELECT "
        "CAST(max(CASE WHEN variant = 0 THEN n END) AS BIGINT) AS n1, "
        "CAST(max(CASE WHEN variant = 0 THEN k END) AS BIGINT) AS k1, "
        "CAST(max(CASE WHEN variant = 1 THEN n END) AS BIGINT) AS n2, "
        "CAST(max(CASE WHEN variant = 1 THEN k END) AS BIGINT) AS k2 "
        "FROM g) "
        "SELECT n1, k1, n2, k2, "
        "round((CAST(k1 AS DOUBLE) / n1 - CAST(k2 AS DOUBLE) / n2) / "
        "sqrt((CAST(k1 + k2 AS DOUBLE) / (n1 + n2)) "
        "* (1 - CAST(k1 + k2 AS DOUBLE) / (n1 + n2)) "
        "* (1.0 / n1 + 1.0 / n2)), 6) AS z_stat, "
        "coalesce(abs((CAST(k1 AS DOUBLE) / n1 - CAST(k2 AS DOUBLE) / n2) / "
        "sqrt((CAST(k1 + k2 AS DOUBLE) / (n1 + n2)) "
        "* (1 - CAST(k1 + k2 AS DOUBLE) / (n1 + n2)) "
        "* (1.0 / n1 + 1.0 / n2))) > 1.959963984540054, false) AS reject_05 "
        "FROM w WHERE n1 IS NOT NULL AND n2 IS NOT NULL"
    ),
    "agg_abc_classification": (
        "WITH pp AS (SELECT l_partkey, "
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) "
        "AS cents FROM lineitem GROUP BY 1), "
        "cum AS (SELECT cents, sum(cents) OVER (ORDER BY -cents, l_partkey "
        "ROWS UNBOUNDED PRECEDING) AS cum_cents FROM pp), "
        "tot AS (SELECT max(cum_cents) AS total FROM cum), "
        "banded AS (SELECT cents, CASE "
        f"WHEN 1000 * cum_cents::HUGEINT <= {ABC_A_PM} * total::HUGEINT THEN 'A' "
        f"WHEN 1000 * cum_cents::HUGEINT <= {ABC_B_PM} * total::HUGEINT THEN 'B' "
        "ELSE 'C' END AS abc FROM cum, tot) "
        "SELECT abc, CAST(count(*) AS BIGINT) AS n_parts, "
        "CAST(sum(cents) AS BIGINT) / 100.0 AS band_revenue "
        "FROM banded GROUP BY 1"
    ),
    "window_fractals": (
        "WITH li AS (SELECT strftime(l_shipdate, '%Y-%m-%d') AS day, "
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) "
        "AS cents FROM lineitem), "
        "bars AS (SELECT day, max(cents) AS h, min(cents) AS l "
        "FROM li GROUP BY 1), "
        "scored AS (SELECT day, h / 100.0 AS high, l / 100.0 AS low, "
        "coalesce("
        + " AND ".join(
            f"h > lag(h, {k}) OVER (ORDER BY day) "
            f"AND h > lead(h, {k}) OVER (ORDER BY day)"
            for k in range(1, FRACTAL_K + 1)
        )
        + ", false) AS fractal_high, "
        "coalesce("
        + " AND ".join(
            f"l < lag(l, {k}) OVER (ORDER BY day) "
            f"AND l < lead(l, {k}) OVER (ORDER BY day)"
            for k in range(1, FRACTAL_K + 1)
        )
        + ", false) AS fractal_low FROM bars) "
        "SELECT * FROM scored WHERE fractal_high OR fractal_low"
    ),
    "fn_holiday_observed": (
        f"WITH spine AS (SELECT raw, name, "
        "CAST(CASE date_diff('day', DATE '1991-12-30', raw) % 7 "
        "WHEN 5 THEN raw - INTERVAL 1 DAY "
        "WHEN 6 THEN raw + INTERVAL 1 DAY "
        f"ELSE raw END AS DATE) AS observed FROM (VALUES {_HOLIDAY_ROWS}) "
        "AS t(raw, name)) "
        "SELECT strftime(observed, '%Y-%m-%d') AS holiday_date, name, "
        "CAST(count(*) AS BIGINT) AS n_orders, "
        "CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 "
        "AS BIGINT) AS BIGINT) / 100.0 AS holiday_revenue "
        "FROM orders JOIN spine ON o_orderdate = observed "
        "GROUP BY 1, 2"
    ),
}
