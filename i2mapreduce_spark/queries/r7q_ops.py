"""Round-6 additions, batch 43: DAU/WAU/MAU stickiness (the activity
ratios every product review opens with — sliding DISTINCT counts made
exact by a bounded day-grid join), big-number mod-97 validation (the
IBAN check — modular arithmetic on digit strings longer than any
integer type), and the Awesome Oscillator (two-horizon midpoint
momentum as one exact integer numerator over a constant denominator).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..catalog import load_tables

#: AO horizons
AO_FAST, AO_SLOW = 5, 34


def q_agg_dau_wau_mau(spark, sf_dir):
    """DAU / WAU / MAU and the DAU/MAU STICKINESS ratio per day —
    sliding-window DISTINCT user counts, which plain window frames
    cannot compute (count-distinct does not decompose); realized
    EXACTLY by joining the bounded day spine to the (day, user)
    activity set over the trailing 7/30-day ranges and counting
    distinct per anchor day.  The fixture's 30-day span keeps the
    expansion bounded; at 100 TB the same plan shards by anchor day.
    Stickiness is a half-up per-mille integer."""
    load_tables(spark, sf_dir)
    e = spark.table("events")
    au = e.select(
        F.expr("datediff(CAST(ts AS DATE), DATE '2024-01-01')").alias("d"),
        "user_id",
    ).distinct()
    days = au.select("d").distinct()
    wau = (
        days.alias("g")
        .join(
            au.alias("a"),
            (F.col("a.d") <= F.col("g.d"))
            & (F.col("a.d") > F.col("g.d") - 7),
        )
        .groupBy(F.col("g.d").alias("day"))
        .agg(F.count_distinct("user_id").alias("wau"))
    )
    mau = (
        days.alias("g")
        .join(
            au.alias("a"),
            (F.col("a.d") <= F.col("g.d"))
            & (F.col("a.d") > F.col("g.d") - 30),
        )
        .groupBy(F.col("g.d").alias("day"))
        .agg(F.count_distinct("user_id").alias("mau"))
    )
    dau = au.groupBy(F.col("d").alias("day")).agg(
        F.count(F.lit(1)).alias("dau")
    )
    return (
        dau.join(wau, "day")
        .join(mau, "day")
        .select(
            "day",
            "dau",
            "wau",
            "mau",
            F.expr("(2 * 1000 * dau + mau) div (2 * mau)").alias(
                "stickiness_pm"
            ),
        )
    )


def q_fn_iban_mod97(spark, sf_dir):
    """Big-number MOD-97 validation (the IBAN / ISO 7064 check): an
    18-digit account string (synthesized from the order key) reduced
    mod 97 by FOLDING 6-digit chunks — (acc*10^6 + chunk) mod 97 —
    because the whole number exceeds every integer type; then the check
    digits that make the full number ≡ 1 (mod 97), re-validated in the
    same pass.  Three unrolled chunk steps, pure integer arithmetic,
    identical in both engines."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    acct = "lpad(CAST(o_orderkey AS STRING), 18, '0')"
    acct_d = "lpad(CAST(o_orderkey AS VARCHAR), 18, '0')"
    # fold three 6-digit chunks: ((c1 % 97 * 10^6 + c2) % 97 ...) % 97
    def fold(a, div):
        m = f"CAST(substring({a}, 1, 6) AS BIGINT)"
        for k in (7, 13):
            m = f"(({m} % 97) * 1000000 + CAST(substring({a}, {k}, 6) AS BIGINT))"
        return f"({m} % 97)"

    rem_s = fold(acct, "div")
    # check digits: full number = acct * 100 + cd must be ≡ 1 mod 97
    # => cd = (1 - (rem * 100) % 97 + 97*2) % 97, kept in [2..98] per spec
    cd_s = f"((1 - ({rem_s} * 100) % 97) % 97 + 97) % 97"
    enc = o.select(
        "o_orderkey",
        F.expr(acct).alias("acct"),
        F.expr(rem_s).cast("long").alias("base_mod97"),
        F.expr(cd_s).cast("long").alias("check_digits"),
    )
    # validate: (rem*100 + cd) % 97 == 1
    return enc.select(
        "o_orderkey",
        "acct",
        "base_mod97",
        "check_digits",
        (
            F.expr("(base_mod97 * 100 + check_digits) % 97") == 1
        ).alias("valid"),
    )


def q_window_awesome_osc(spark, sf_dir):
    """Awesome Oscillator: SMA_5(midpoint) - SMA_34(midpoint) with
    midpoint = (H+L)/2 — two-horizon momentum.  With MID2 = H+L (2x the
    midpoint, integer cents) the oscillator is the single exact integer
    (34*S5 - 5*S34) over the constant denominator 2*5*34, divided once
    for display — no float before the end.  Bounded daily grain."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem").select(
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("day"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    bars = li.groupBy("day").agg(
        (F.max("cents") + F.min("cents")).alias("mid2")
    )
    wf = Window.orderBy("day").rowsBetween(-(AO_FAST - 1), 0)
    ws = Window.orderBy("day").rowsBetween(-(AO_SLOW - 1), 0)
    s = bars.select(
        "day",
        F.sum("mid2").over(wf).alias("s5"),
        F.sum("mid2").over(ws).alias("s34"),
        F.count(F.lit(1)).over(ws).alias("nw"),
    ).filter(F.col("nw") == AO_SLOW)
    return s.select(
        "day",
        (
            (AO_SLOW * F.col("s5") - AO_FAST * F.col("s34"))
            / float(2 * AO_FAST * AO_SLOW)
            / 100.0
        ).alias("awesome_osc"),
    )


QUERIES = {
    "agg_dau_wau_mau": q_agg_dau_wau_mau,
    "fn_iban_mod97": q_fn_iban_mod97,
    "window_awesome_osc": q_window_awesome_osc,
}


def _fold_duck() -> str:
    a = "lpad(CAST(o_orderkey AS VARCHAR), 18, '0')"
    m = f"CAST(substring({a}, 1, 6) AS BIGINT)"
    for k in (7, 13):
        m = f"(({m} % 97) * 1000000 + CAST(substring({a}, {k}, 6) AS BIGINT))"
    return f"({m} % 97)"


ORACLES = {
    "agg_dau_wau_mau": (
        "WITH au AS (SELECT DISTINCT "
        "date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d, "
        "user_id FROM events), "
        "days AS (SELECT DISTINCT d FROM au), "
        "wau AS (SELECT g.d AS day, count(DISTINCT user_id) AS wau "
        "FROM days g JOIN au a ON a.d <= g.d AND a.d > g.d - 7 "
        "GROUP BY 1), "
        "mau AS (SELECT g.d AS day, count(DISTINCT user_id) AS mau "
        "FROM days g JOIN au a ON a.d <= g.d AND a.d > g.d - 30 "
        "GROUP BY 1), "
        "dau AS (SELECT d AS day, count(*) AS dau FROM au GROUP BY 1) "
        "SELECT CAST(dau.day AS INT) AS day, CAST(dau AS BIGINT) AS dau, "
        "CAST(wau AS BIGINT) AS wau, CAST(mau AS BIGINT) AS mau, "
        "CAST((2 * 1000 * dau + mau) // (2 * mau) AS BIGINT) "
        "AS stickiness_pm "
        "FROM dau JOIN wau ON dau.day = wau.day "
        "JOIN mau ON dau.day = mau.day"
    ),
    "fn_iban_mod97": (
        "SELECT o_orderkey, "
        "lpad(CAST(o_orderkey AS VARCHAR), 18, '0') AS acct, "
        f"CAST({_fold_duck()} AS BIGINT) AS base_mod97, "
        f"CAST(((1 - ({_fold_duck()} * 100) % 97) % 97 + 97) % 97 "
        "AS BIGINT) AS check_digits, "
        f"(({_fold_duck()} * 100 + "
        f"((1 - ({_fold_duck()} * 100) % 97) % 97 + 97) % 97) % 97) = 1 "
        "AS valid FROM orders"
    ),
    "window_awesome_osc": (
        "WITH li AS (SELECT strftime(l_shipdate, '%Y-%m-%d') AS day, "
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) "
        "AS cents FROM lineitem), "
        "bars AS (SELECT day, max(cents) + min(cents) AS mid2 "
        "FROM li GROUP BY 1), "
        "s AS (SELECT day, "
        f"sum(mid2) OVER (ORDER BY day ROWS BETWEEN {AO_FAST - 1} "
        "PRECEDING AND CURRENT ROW) AS s5, "
        f"sum(mid2) OVER (ORDER BY day ROWS BETWEEN {AO_SLOW - 1} "
        "PRECEDING AND CURRENT ROW) AS s34, "
        f"count(*) OVER (ORDER BY day ROWS BETWEEN {AO_SLOW - 1} "
        "PRECEDING AND CURRENT ROW) AS nw FROM bars) "
        f"SELECT day, CAST({AO_SLOW} * s5 - {AO_FAST} * s34 AS BIGINT) "
        f"/ {float(2 * AO_FAST * AO_SLOW)!r} / 100.0 AS awesome_osc "
        f"FROM s WHERE nw = {AO_SLOW}"
    ),
}
