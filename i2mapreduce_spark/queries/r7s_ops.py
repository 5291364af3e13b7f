"""Round-6 additions, batch 45: a hash-avalanche audit (per-bit
uniformity of the engine's own hash — the diagnostics behind every
hash-partitioner choice), seasonal STRENGTH (how much of the series the
weekday pattern explains — the number that says whether deseasonalizing
is worth it), and the Durbin-Watson statistic (autocorrelation of OLS
residuals — regression diagnostics for the trend fits).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_tables

#: avalanche audit: bits of the md5-derived word examined
AVAL_BITS = 32


def q_fn_hash_avalanche(spark, sf_dir):
    """HASH AVALANCHE audit: for every bit position of a 32-bit
    md5-derived word over all order keys, the share of ones — a healthy
    hash sits at ~500 per-mille on every bit, and a biased bit means
    skewed hash partitions (the diagnostic run before trusting any
    hash-partitioner or sampler in this repo).  One explode over the
    literal bit range and one exact integer agg per bit."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    word = F.conv(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10
    ).cast("long")
    bits = o.select(
        word.alias("w"),
        F.explode(F.expr(f"sequence(0, {AVAL_BITS - 1})")).alias("bit"),
    )
    g = bits.groupBy("bit").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("shiftright(w, bit) & 1")).alias("ones"),
    )
    return g.select(
        "bit",
        "n",
        "ones",
        F.expr("(2 * 1000 * ones + n) div (2 * n)").alias("ones_pm"),
    )


def q_ts_seasonal_strength(spark, sf_dir):
    """SEASONAL STRENGTH of daily revenue: 1 - var(remainder) /
    var(detrended), the Hyndman decomposition-strength number that says
    how much of the (detrended) series the weekday pattern explains —
    the go/no-go for ts_seasonal_adjust.  Detrended values and weekday
    seasonal means reuse the ts_decompose_additive arithmetic (exact
    integer cents, shifted half-up for signed numerators); both
    variances are exact DECIMAL(38)/HUGEINT moment combinations and the
    strength is one double ratio."""
    load_tables(spark, sf_dir)
    from pyspark.sql import Window

    o = spark.table("orders")
    daily = o.groupBy(
        F.expr("datediff(o_orderdate, DATE '1991-12-30')").alias("x")
    ).agg(
        (F.sum("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents")
    )
    half = 3
    wt = Window.orderBy("x").rowsBetween(-half, half)
    tr = daily.select(
        "x",
        "cents",
        F.sum("cents").over(wt).alias("ws"),
        F.count(F.lit(1)).over(wt).alias("wn"),
    ).filter(F.col("wn") == 7)
    det = tr.select(
        "x",
        (F.col("cents") - F.expr("(2 * ws + 7) div 14")).alias("d"),
        (F.col("x") % 7).alias("g"),
    )
    wg = Window.partitionBy("g")
    summed = det.select(
        "d",
        F.sum("d").over(wg).alias("gs"),
        F.count(F.lit(1)).over(wg).alias("gn"),
    )
    # signed half-up mean via denominator-multiple shift, then r = d - mean
    seas = summed.select(
        "d",
        (
            F.col("d")
            - (
                F.expr(
                    "(2 * (gs + 1000000000000 * gn) + gn) div (2 * gn)"
                )
                - 1000000000000
            )
        ).alias("r"),
    )
    m = seas.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("d").cast("decimal(38,0)")).alias("sd1"),
        F.sum(
            (F.col("d").cast("decimal(38,0)") * F.col("d")).cast(
                "decimal(38,0)"
            )
        ).alias("sd2"),
        F.sum(F.col("r").cast("decimal(38,0)")).alias("sr1"),
        F.sum(
            (F.col("r").cast("decimal(38,0)") * F.col("r")).cast(
                "decimal(38,0)"
            )
        ).alias("sr2"),
    )
    n = F.col("n").cast("double")
    var_d = (
        n * F.col("sd2").cast("double")
        - F.col("sd1").cast("double") * F.col("sd1").cast("double")
    )
    var_r = (
        n * F.col("sr2").cast("double")
        - F.col("sr1").cast("double") * F.col("sr1").cast("double")
    )
    return m.select(
        F.col("n").alias("n_days"),
        F.round(F.greatest(F.lit(0.0), 1.0 - var_r / var_d), 6).alias(
            "seasonal_strength"
        ),
    )


def q_agg_durbin_watson(spark, sf_dir):
    """DURBIN-WATSON statistic of the daily-revenue OLS residuals:
    DW = sum((e_t - e_{t-1})^2) / sum(e_t^2) — near 2 means independent
    residuals, toward 0 means positive autocorrelation (the diagnostic
    that says whether agg_linreg's trend line can be trusted).
    Residuals are QUANTIZED to half-up cents via sign-safe shifting
    (fitted values are rationals of exact OLS moments), so both sums
    are exact DECIMAL(38)/HUGEINT and DW is one double ratio."""
    load_tables(spark, sf_dir)
    from pyspark.sql import Window

    o = spark.table("orders")
    daily = o.groupBy(
        F.expr("datediff(o_orderdate, DATE '1991-12-30')").alias("x")
    ).agg(
        (F.sum("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("y")
    )
    m = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        # decimal sum (r10): x·y terms reach 1e17 at hostile magnitudes
        # and their 2400-day total passes 1e20 — Spark long sums throw
        # where DuckDB's HUGEINT sums absorb it
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    j = daily.crossJoin(F.broadcast(m))
    # residual e = y - (a + b*x) with b = bn/bd exact rationals; keep
    # exact: e_scaled = n*bd*y - n*bn*x - bd*sy + bn*sx, then quantize
    # to cents half-up with a denominator-multiple shift (e may be
    # negative).  EVERY product enters DECIMAL(38) before multiplying —
    # n*sxy alone leaves BIGINT at sf0.1 (Spark sums of long are long;
    # DuckDB's are HUGEINT, hence the asymmetric casts).
    _bn = "(CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy)"
    _bd = "(CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx)"
    _num = (
        f"(CAST(n AS DECIMAL(38,0)) * {_bd} * y "
        f"- CAST(n AS DECIMAL(38,0)) * {_bn} * x "
        f"- {_bd} * sy + {_bn} * sx)"
    )
    _den = f"(CAST(n AS DECIMAL(38,0)) * {_bd})"
    # zero-denominator guard matches DuckDB (x // 0 is NULL): a single
    # day has no regression line, hence no residuals
    ecents = F.expr(
        f"CAST(CASE WHEN {_den} = 0 THEN NULL "
        f"ELSE (2 * ({_num} + 100000 * {_den}) + {_den}) "
        f"div (2 * {_den}) - 100000 END AS BIGINT)"
    )
    res = j.select("x", ecents.alias("e"))
    w = Window.orderBy("x")
    lagd = res.select(
        "e", F.lag("e").over(w).alias("pe")
    ).filter(F.col("pe").isNotNull())
    s = lagd.agg(
        F.count(F.lit(1)).alias("n_resid"),
        F.sum(
            ((F.col("e") - F.col("pe")).cast("decimal(38,0)")
             * (F.col("e") - F.col("pe"))).cast("decimal(38,0)")
        ).alias("sdiff"),
        F.sum(
            (F.col("e").cast("decimal(38,0)") * F.col("e")).cast(
                "decimal(38,0)"
            )
        ).alias("ssq"),
    )
    return s.select(
        "n_resid",
        F.round(
            F.col("sdiff").cast("double") / F.col("ssq").cast("double"), 6
        ).alias("durbin_watson"),
    )


QUERIES = {
    "fn_hash_avalanche": q_fn_hash_avalanche,
    "ts_seasonal_strength": q_ts_seasonal_strength,
    "agg_durbin_watson": q_agg_durbin_watson,
}

ORACLES = {
    "fn_hash_avalanche": (
        "WITH w AS (SELECT ('0x' || substr(md5(o_orderkey::VARCHAR), "
        "1, 8))::BIGINT AS w FROM orders), "
        f"b AS (SELECT w, unnest(range({AVAL_BITS})) AS bit FROM w) "
        "SELECT CAST(bit AS INT) AS bit, CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum((w >> CAST(bit AS INT)) & 1) AS BIGINT) AS ones, "
        "CAST((2 * 1000 * sum((w >> CAST(bit AS INT)) & 1) + count(*)) "
        "// (2 * count(*)) AS BIGINT) AS ones_pm FROM b GROUP BY 1"
    ),
    "ts_seasonal_strength": (
        "WITH daily AS (SELECT "
        "date_diff('day', DATE '1991-12-30', o_orderdate) AS x, "
        "CAST(CAST(sum(o_totalprice) AS DECIMAL(18,2)) * 100 AS BIGINT) "
        "AS cents FROM orders GROUP BY 1), "
        "tr AS (SELECT x, cents, sum(cents) OVER w AS ws, "
        "count(*) OVER w AS wn FROM daily "
        "WINDOW w AS (ORDER BY x ROWS BETWEEN 3 PRECEDING "
        "AND 3 FOLLOWING)), "
        "det AS (SELECT x, cents - (2 * ws + 7) // 14 AS d, x % 7 AS g "
        "FROM tr WHERE wn = 7), "
        "seas AS (SELECT d, d - ((2 * (sum(d) OVER (PARTITION BY g) "
        "+ 1000000000000 * count(*) OVER (PARTITION BY g)) "
        "+ count(*) OVER (PARTITION BY g)) "
        "// (2 * count(*) OVER (PARTITION BY g)) - 1000000000000) AS r "
        "FROM det), "
        "m AS (SELECT count(*) AS n, sum(d) AS sd1, "
        "sum(CAST(d AS HUGEINT) * d) AS sd2, sum(r) AS sr1, "
        "sum(CAST(r AS HUGEINT) * r) AS sr2 FROM seas) "
        "SELECT CAST(n AS BIGINT) AS n_days, "
        "round(greatest(0.0, 1.0 "
        "- (CAST(n AS DOUBLE) * CAST(sr2 AS DOUBLE) "
        "- CAST(sr1 AS DOUBLE) * CAST(sr1 AS DOUBLE)) "
        "/ (CAST(n AS DOUBLE) * CAST(sd2 AS DOUBLE) "
        "- CAST(sd1 AS DOUBLE) * CAST(sd1 AS DOUBLE))), 6) "
        "AS seasonal_strength FROM m"
    ),
    "agg_durbin_watson": (
        "WITH daily AS (SELECT "
        "date_diff('day', DATE '1991-12-30', o_orderdate) AS x, "
        "CAST(CAST(sum(o_totalprice) AS DECIMAL(18,2)) * 100 AS BIGINT) "
        "AS y FROM orders GROUP BY 1), "
        "m AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy, "
        "sum(x * y) AS sxy, sum(x * x) AS sxx FROM daily), "
        "res AS (SELECT x, "
        "CAST((2 * (CAST(n AS HUGEINT) * (n * sxx - sx * sx) * y "
        "- CAST(n AS HUGEINT) * (n * sxy - sx * sy) * x "
        "- CAST(n * sxx - sx * sx AS HUGEINT) * sy "
        "+ CAST(n * sxy - sx * sy AS HUGEINT) * sx "
        "+ 100000 * CAST(n AS HUGEINT) * (n * sxx - sx * sx)) "
        "+ CAST(n AS HUGEINT) * (n * sxx - sx * sx)) "
        "// (2 * CAST(n AS HUGEINT) * (n * sxx - sx * sx)) "
        "- 100000 AS BIGINT) AS e FROM daily, m), "
        "lagd AS (SELECT e, lag(e) OVER (ORDER BY x) AS pe FROM res), "
        "s AS (SELECT count(*) AS n_resid, "
        "sum(CAST(e - pe AS HUGEINT) * (e - pe)) AS sdiff, "
        "sum(CAST(e AS HUGEINT) * e) AS ssq "
        "FROM lagd WHERE pe IS NOT NULL) "
        "SELECT CAST(n_resid AS BIGINT) AS n_resid, "
        "round(CAST(sdiff AS DOUBLE) / CAST(ssq AS DOUBLE), 6) "
        "AS durbin_watson FROM s"
    ),
}
