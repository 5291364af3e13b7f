"""Round-6 additions, batch 20: Theil-Sen robust trend slope (the
estimator behind Mann-Kendall's companion slope report), business-day
arithmetic (the calendar primitive of every SLA/lead-time metric),
a fixed-width text source (the classic mainframe interchange format),
and circular mean of event hour (directional statistics — the correct
"average time of day", where the arithmetic mean of 23h and 1h is
wrongly 12h instead of 0h).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ..catalog import load_tables
from ..operators.ranking import global_row_number
from .scans import _scratch_dir

#: business-day anchor: a Monday preceding every fixture date
BD_ANCHOR = "1991-12-30"

#: fixed-width layout for the part table (field widths, in order)
FW_KEY_W, FW_NAME_W, FW_BRAND_W, FW_TYPE_W, FW_SIZE_W, FW_CENTS_W = (
    8, 60, 10, 25, 4, 12,
)

TWO_PI = 6.283185307179586

#: Theil-Sen int64-exact regime: |dc| <= this keeps 2e6*|dc|+dd below
#: 2^63 with headroom (see the in-plan proof comment).  Module-level so
#: the cross-branch equality test can force the DECIMAL plan on any
#: fixture by monkeypatching it to -1.
TS_INT64_DC_BOUND = 4_000_000_000_000


def q_ts_theil_sen(spark, sf_dir):
    """Theil-Sen estimator of the daily-revenue trend: the MEDIAN of all
    pairwise slopes — the robust slope whose breakdown point (29%) makes
    it the standard companion to the Mann-Kendall trend test
    (ts_mann_kendall), immune to the outlier days that wreck OLS.

    Exact path: daily revenue collapses to exact integer cents on the
    bounded ~2,406-day grain, every pairwise slope is a SIGN-DECOMPOSED
    half-up x10^6 integer (Spark `div` truncates while DuckDB `//`
    floors — they only agree on non-negative operands, so the quotient
    runs on |dc| and the sign is reapplied), and the median picks the
    middle rank(s) of the ~2.9M bounded pairs via the DISTRIBUTED
    chunked-offset row_number — no single-partition sort.  The median of
    an even count is the exact two-middle sum, divided once for
    display."""
    load_tables(spark, sf_dir)
    # complete-case: a day whose orders all lack a price is a series gap
    # (a NULL day would pair as NULL slopes, ranked differently by each
    # engine's default NULL order); excluded on both sides
    o = spark.table("orders").filter(F.col("o_totalprice").isNotNull())
    # materialize the ~2.4k-day grain ONCE (r11): the self-join below
    # used to duplicate the whole scan+agg subtree under its a/b
    # aliases, and the magnitude probe would add a third pass — the
    # eager checkpoint leaves one orders scan total at any scale
    daily = o.groupBy(
        F.expr(f"datediff(o_orderdate, DATE '{BD_ANCHOR}')").alias("di")
    ).agg(
        (F.sum("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("c")
    ).localCheckpoint(eager=True)
    pairs = (
        daily.alias("a")
        .join(daily.alias("b"), F.col("a.di") < F.col("b.di"))
        .select(
            F.col("a.di").alias("ai"),
            F.col("b.di").alias("bi"),
            (F.col("b.c") - F.col("a.c")).alias("dc"),
            (F.col("b.di") - F.col("a.di")).alias("dd"),
        )
    )
    # sx needs DECIMAL(38,0) headroom (r10 extreme-magnitude sweep): with
    # day cents ~1e13 the 2e6-scaled slope itself passes 1e19, so both
    # the product AND the quotient overflow int64.  Spark's `div` returns
    # LONG regardless of operand type, so the exact floor divide is
    # spelled (N - N % D) / D — the remainder and the exact-multiple
    # division are both exact in decimal space.
    #
    # r11 (guide §2.3 "narrower types"): decimal128 modulo/divide per
    # pair made this the registry's slowest key (the widening alone was
    # +80% wall on 2.9M pairs).  The guarded CASE below runs the SAME
    # floor-divide in pure BIGINT whenever 2e6*|dc|+dd provably fits
    # (|dc| <= 4e12 keeps N < 8.01e18 < 2^63), casting only the result
    # to decimal; the decimal spelling remains as the ELSE branch for
    # extreme magnitudes.  Codegen evaluates only the taken branch, so
    # the ANSI overflow the guard excludes can never fire.  Measured
    # interleaved at sf0.1: 16.8s -> 11.0s, bit-identical output; the
    # extreme leg still routes through the decimal branch.
    _dec = (
        "((2 * 1000000 * CAST({v} AS DECIMAL(38,0)) + dd) "
        " - (2 * 1000000 * CAST({v} AS DECIMAL(38,0)) + dd) % (2 * dd)) "
        "/ (2 * dd)"
    )
    _long = (
        "((2000000 * {v} + dd) - (2000000 * {v} + dd) % (2 * dd)) "
        "div (2 * dd)"
    )
    # r11 second pass (guide §2.2, narrower types THROUGH the shuffle):
    # the per-pair CASE guard above still yields DECIMAL(38,0) — both
    # branches must share a type — so the 2.9M-row rank sort, exchange
    # and median agg all ran on decimal128 even when every value fits
    # int64.  The magnitude test is a GLOBAL property of the daily
    # grain (|dc| <= max(c) - min(c)), so probe it ONCE on the ~2.4k
    # aggregated days and pick the sx type for the whole plan: pure
    # BIGINT end-to-end in the normal regime, the decimal spelling only
    # when the probe says int64 could overflow (the extreme-magnitude
    # leg).  Both plans produce bit-identical output: the same floor-
    # divided integer, and LONG->double vs DECIMAL->double of the same
    # integer are the same IEEE rounding, divided once for display.
    bound = daily.agg(F.max("c").alias("mx"), F.min("c").alias("mn")).first()
    fits_long = (
        bound is None
        or bound["mx"] is None
        or (bound["mx"] - bound["mn"]) <= TS_INT64_DC_BOUND
    )
    if fits_long:
        sx_expr = (
            f"CASE WHEN dc >= 0 THEN {_long.format(v='dc')} "
            f"ELSE -({_long.format(v='(-dc)')}) END"
        )
    else:
        sx_expr = (
            f"CASE WHEN dc >= 0 THEN {_dec.format(v='dc')} "
            f"ELSE -({_dec.format(v='(-dc)')}) END"
        )
    slopes = pairs.select("ai", "bi", F.expr(sx_expr).alias("sx"))
    ranked = global_row_number(slopes, ["sx", "ai", "bi"], "rk")
    tot = ranked.agg(
        F.count(F.lit(1)).alias("np"),
        F.count_distinct("ai").alias("nd_lo"),
    )
    # n_days = distinct ai + 1 (the max day never appears as a pair's left)
    r1 = F.expr("(np + 1) div 2")
    r2 = F.expr("(np + 2) div 2")
    med = (
        ranked.crossJoin(F.broadcast(tot))
        .filter((F.col("rk") == r1) | (F.col("rk") == r2))
        .agg(
            F.max("np").alias("n_pairs"),
            (F.max("nd_lo") + 1).alias("n_days"),
            (
                F.sum(F.when(F.col("rk") == r1, F.col("sx")).otherwise(0))
                + F.sum(F.when(F.col("rk") == r2, F.col("sx")).otherwise(0))
            ).alias("med2"),
        )
    )
    # fewer than two days -> no pairwise slopes, no median (the oracle's
    # `FROM r, t WHERE rk IN ...` likewise grows no row); drop the
    # NULL-aggregate row instead of reporting an undefined slope
    return med.filter(F.col("n_pairs").isNotNull()).select(
        "n_days",
        "n_pairs",
        (F.col("med2") / 2000000.0).alias("slope_cents_per_day"),
    )


def q_fn_business_days(spark, sf_dir):
    """Business days between order placement and line shipment — the
    lead-time metric behind every SLA dashboard.  Closed form, NO
    calendar join or explode: with x = days since an anchor Monday,
    f(x) = 5*(x div 7) + least(x mod 7, 5) counts weekdays before x, so
    bd = f(ship) - f(order) counts weekdays in [order, ship) in two
    integer ops per row.  The anchor (1991-12-30) precedes every
    fixture date, keeping both div and mod on non-negative operands
    where Spark and DuckDB agree.  One co-keyed equi-join, then a pure
    per-row map."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem").join(
        spark.table("orders"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    xo = f"datediff(o_orderdate, DATE '{BD_ANCHOR}')"
    xs = f"datediff(l_shipdate, DATE '{BD_ANCHOR}')"

    def f(x):
        return 5 * F.expr(f"({x}) div 7") + F.least(
            F.expr(f"({x}) % 7"), F.lit(5)
        )

    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(xo).alias("order_x"),
        F.expr(xs).alias("ship_x"),
        (F.expr(xo) % 7).alias("order_dow"),
        (f(xs) - f(xo)).alias("biz_days"),
    )


def q_source_fixed_width(spark, sf_dir):
    """Fixed-width text source — the mainframe/COBOL interchange format
    A7-class readers still meet: part rows serialized as padded
    column-aligned lines (key 8, name 60, brand 10, type 25, size 4,
    retail CENTS 12 — money as an integer field, the COBOL convention),
    written through the text sink, read back as raw lines and re-parsed
    by 1-based substring slicing + rtrim + cast.  Parsing is pure JVM
    substring arithmetic on the scan (at 100 TB this is a map-only
    format conversion, no shuffle); the oracle recomputes the declared
    layout semantics straight from the base table."""
    load_tables(spark, sf_dir)
    p = spark.table("part")
    cents = (F.col("p_retailprice").cast("decimal(12,2)") * 100).cast("long")
    line = F.concat(
        F.rpad(F.col("p_partkey").cast("string"), FW_KEY_W, " "),
        F.rpad(F.col("p_name"), FW_NAME_W, " "),
        F.rpad(F.col("p_brand"), FW_BRAND_W, " "),
        F.rpad(F.col("p_type"), FW_TYPE_W, " "),
        F.rpad(F.col("p_size").cast("string"), FW_SIZE_W, " "),
        F.rpad(cents.cast("string"), FW_CENTS_W, " "),
    )
    out = _scratch_dir("i2mr_fw_") + "/part"
    p.select(line.alias("value")).write.mode("overwrite").text(out)
    raw = spark.read.text(out)
    pos_name = 1 + FW_KEY_W
    pos_brand = pos_name + FW_NAME_W
    pos_type = pos_brand + FW_BRAND_W
    pos_size = pos_type + FW_TYPE_W
    pos_cents = pos_size + FW_SIZE_W
    return raw.select(
        F.rtrim(F.substring("value", 1, FW_KEY_W)).cast("long").alias(
            "p_partkey"
        ),
        F.rtrim(F.substring("value", pos_name, FW_NAME_W)).alias("p_name"),
        F.rtrim(F.substring("value", pos_brand, FW_BRAND_W)).alias("p_brand"),
        F.rtrim(F.substring("value", pos_type, FW_TYPE_W)).alias("p_type"),
        F.rtrim(F.substring("value", pos_size, FW_SIZE_W)).cast("int").alias(
            "p_size"
        ),
        F.rtrim(F.substring("value", pos_cents, FW_CENTS_W))
        .cast("long")
        .alias("retail_cents"),
    )


def _trig_case(col: str, fn) -> str:
    """CASE mapping hour 0..23 -> sin/cos(2*pi*h/24) as full-precision
    PYTHON-COMPUTED literals, identical text in both dialects — keeps
    libm out of the query entirely (Java Math.sin and C libm may differ
    by an ulp on the same argument; a shared literal table cannot)."""
    arms = " ".join(
        f"WHEN {h} THEN {fn(TWO_PI * h / 24.0)!r}" for h in range(24)
    )
    return f"(CASE {col} {arms} END)"


def q_agg_circular_mean(spark, sf_dir):
    """Circular mean and resultant length of event HOUR-OF-DAY per event
    type — directional statistics, the correct 'average time of day'
    (the arithmetic mean of 23:00 and 01:00 is midnight, not noon).

    mean = atan2(sum sin, sum cos) mapped to [0, 24); r = |resultant|/n
    (r ~ 1 means concentrated, ~0 means uniform).  Cross-engine
    discipline: the 24 sin/cos values enter as PYTHON-GENERATED decimal
    literals (no libm sin/cos in either engine), weighted by exact
    integer hour counts and folded in fixed hour order, so both engines
    stream identical doubles into the single final atan2/sqrt."""
    load_tables(spark, sf_dir)
    e = spark.table("events")
    hist = e.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hod")
    ).agg(F.count(F.lit(1)).alias("c"))
    arr = hist.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("hod", "c"))).alias("a"),
        F.sum("c").alias("n"),
    )
    sin_case = _trig_case("x.hod", math.sin)
    cos_case = _trig_case("x.hod", math.cos)
    sx = F.expr(
        f"aggregate(a, cast(0.0 as double), (acc, x) -> acc + x.c * {sin_case})"
    )
    sy = F.expr(
        f"aggregate(a, cast(0.0 as double), (acc, x) -> acc + x.c * {cos_case})"
    )
    scored = arr.select(
        "event_type", "n", sx.alias("sx"), sy.alias("sy")
    )
    theta = F.atan2(F.col("sx"), F.col("sy"))
    theta = F.when(theta < 0, theta + TWO_PI).otherwise(theta)
    return scored.select(
        "event_type",
        "n",
        F.round(theta * 24.0 / TWO_PI, 6).alias("mean_hour"),
        F.round(
            F.sqrt(F.col("sx") * F.col("sx") + F.col("sy") * F.col("sy"))
            / F.col("n"),
            6,
        ).alias("resultant_r"),
    )


QUERIES = {
    "ts_theil_sen": q_ts_theil_sen,
    "fn_business_days": q_fn_business_days,
    "source_fixed_width": q_source_fixed_width,
    "agg_circular_mean": q_agg_circular_mean,
}


def _kw_f(x: str) -> str:
    return f"(5 * (({x}) // 7) + least(({x}) % 7, 5))"


ORACLES = {
    "ts_theil_sen": (
        "WITH daily AS (SELECT "
        f"date_diff('day', DATE '{BD_ANCHOR}', o_orderdate) AS di, "
        "CAST(CAST(sum(o_totalprice) AS DECIMAL(18,2)) * 100 AS BIGINT) AS c "
        "FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1), "
        "p AS (SELECT a.di AS ai, b.di AS bi, b.c - a.c AS dc, "
        "b.di - a.di AS dd FROM daily a JOIN daily b ON a.di < b.di), "
        "s AS (SELECT ai, bi, CASE WHEN dc >= 0 "
        "THEN (2 * 1000000 * dc::HUGEINT + dd) // (2 * dd) "
        "ELSE -((2 * 1000000 * -(dc::HUGEINT) + dd) // (2 * dd)) END AS sx FROM p), "
        "r AS (SELECT sx, row_number() OVER (ORDER BY sx, ai, bi) AS rk "
        "FROM s), "
        "t AS (SELECT count(*) AS np, count(DISTINCT ai) + 1 AS nd FROM s) "
        "SELECT CAST(nd AS BIGINT) AS n_days, CAST(np AS BIGINT) AS n_pairs, "
        "(sum(CASE WHEN rk = (np + 1) // 2 THEN sx ELSE 0 END) "
        "+ sum(CASE WHEN rk = (np + 2) // 2 THEN sx ELSE 0 END)) "
        "/ 2000000.0 AS slope_cents_per_day "
        "FROM r, t WHERE rk IN ((np + 1) // 2, (np + 2) // 2) "
        "GROUP BY nd, np"
    ),
    "fn_business_days": (
        "SELECT l_orderkey, l_linenumber, "
        f"CAST(date_diff('day', DATE '{BD_ANCHOR}', o_orderdate) AS INT) "
        "AS order_x, "
        f"CAST(date_diff('day', DATE '{BD_ANCHOR}', l_shipdate) AS INT) "
        "AS ship_x, "
        f"CAST(date_diff('day', DATE '{BD_ANCHOR}', o_orderdate) % 7 AS INT) "
        "AS order_dow, "
        "CAST("
        + _kw_f(f"date_diff('day', DATE '{BD_ANCHOR}', l_shipdate)")
        + " - "
        + _kw_f(f"date_diff('day', DATE '{BD_ANCHOR}', o_orderdate)")
        + " AS INT) AS biz_days "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    ),
    "source_fixed_width": (
        "SELECT p_partkey, "
        f"rtrim(substr(p_name, 1, {FW_NAME_W})) AS p_name, "
        f"rtrim(substr(p_brand, 1, {FW_BRAND_W})) AS p_brand, "
        f"rtrim(substr(p_type, 1, {FW_TYPE_W})) AS p_type, "
        "CAST(p_size AS INT) AS p_size, "
        "CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT) "
        "AS retail_cents FROM part"
    ),
    "agg_circular_mean": (
        "WITH hist AS (SELECT event_type, CAST(hour(ts) AS INT) AS hod, "
        "count(*) AS c FROM events GROUP BY 1, 2), "
        "arr AS (SELECT event_type, "
        "list({'hod': hod, 'c': c} ORDER BY hod) AS a, "
        "CAST(sum(c) AS BIGINT) AS n FROM hist GROUP BY 1), "
        "scored AS (SELECT event_type, n, "
        "list_reduce(list_prepend(0.0, list_transform(a, x -> x.c * "
        + _trig_case("x.hod", math.sin)
        + ")), (acc, v) -> acc + v) AS sx, "
        "list_reduce(list_prepend(0.0, list_transform(a, x -> x.c * "
        + _trig_case("x.hod", math.cos)
        + ")), (acc, v) -> acc + v) AS sy FROM arr) "
        "SELECT event_type, n, "
        "round((CASE WHEN atan2(sx, sy) < 0 "
        f"THEN atan2(sx, sy) + {TWO_PI!r} ELSE atan2(sx, sy) END) "
        f"* 24.0 / {TWO_PI!r}, 6) AS mean_hour, "
        "round(sqrt(sx * sx + sy * sy) / n, 6) AS resultant_r FROM scored"
    ),
}
