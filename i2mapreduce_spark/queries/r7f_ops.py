"""Round-6 additions, batch 32: empirical-Bayes beta-binomial smoothing
(the hierarchical shrinkage behind every CTR/ranking system, one step
past pipeline_target_encode's additive smoothing), delta-encoding
analytics (the columnar compression estimator), additive STL-lite time
series decomposition (trend + weekday seasonal + remainder, in exact
integers), and a bitemporal as-of query (valid time x transaction time
— join_point_in_time handles only one axis).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..catalog import load_tables

#: trend window for the additive decomposition (centered, odd)
STL_W = 7

#: bitemporal probe: transaction-time version and valid date
BT_TX_PROBE = 1
BT_VALID_PROBE = "1995-06-15"


def q_agg_eb_beta_binomial(spark, sf_dir):
    """Empirical-Bayes BETA-BINOMIAL smoothing of per-user purchase
    rates: fit a Beta(alpha, beta) prior to the population by method of
    moments, then shrink every user's k/n toward it via
    (k + alpha) / (n + alpha + beta) — the hierarchical smoothing that
    keeps a 1-event user from looking like a 100% converter (the
    Bayesian upgrade of pipeline_target_encode's fixed pseudo-count).

    Cross-engine discipline: per-user rates are first QUANTIZED to
    half-up x10^6 integers (declared semantics), so the population
    moments are exact BIGINT sums — the unordered float sum over
    thousands of users that a naive mean-of-rates would need is exactly
    the drift trap.  alpha/beta are then two fixed-shape doubles, and
    each user's smoothed rate is one more fixed-shape double of exact
    ints, rounded at 6dp (magnitude < 1, far inside double's safe
    digits)."""
    load_tables(spark, sf_dir)
    e = spark.table("events")
    pu = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("k"),
    )
    pu = pu.withColumn(
        "r6", F.expr("(2 * 1000000 * k + n) div (2 * n)")
    )
    mom = pu.agg(
        F.count(F.lit(1)).alias("u"),
        F.sum("r6").alias("s1"),
        F.sum(F.col("r6") * F.col("r6")).alias("s2"),
    )
    # method of moments on the quantized rates: m = mean, v = variance
    # try_divide throughout: with n<=1 users the prior moments are
    # undefined (zero count / zero variance) — NULL on both engines
    # (DuckDB x/0 is NULL; Spark ANSI / throws even for doubles)
    m = F.try_divide(F.col("s1").cast("double"), F.col("u")) / 1e6
    v = (
        F.try_divide(
            F.col("u").cast("double") * F.col("s2").cast("double")
            - F.col("s1").cast("double") * F.col("s1").cast("double"),
            F.col("u").cast("double") * F.col("u").cast("double"),
        )
        / 1e12
    )
    common = F.try_divide(m * (1 - m), v) - 1
    prior = mom.select(
        (m * common).alias("alpha"), ((1 - m) * common).alias("beta")
    )
    j = pu.crossJoin(F.broadcast(prior))
    return j.select(
        "user_id",
        "n",
        "k",
        F.round(
            (F.col("k") + F.col("alpha"))
            / (F.col("n") + F.col("alpha") + F.col("beta")),
            6,
        ).alias("smoothed_rate"),
    )


def q_fn_delta_encode(spark, sf_dir):
    """DELTA-ENCODING analytics per order-priority stream: sort each
    group's order keys, take consecutive deltas, and report the
    bit-width the deltas need vs the raw 64-bit ids — the estimator a
    columnar encoder (parquet DELTA_BINARY_PACKED) uses to pick its
    layout.  ceil(log2(x)) comes from the portable bit-length identity
    length(base-2 string) rather than any log float; everything is
    exact integers over one co-partitioned window."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_orderkey")
    d = o.select(
        "o_orderpriority",
        (F.col("o_orderkey") - F.lag("o_orderkey").over(w)).alias("delta"),
    ).filter(F.col("delta").isNotNull())
    # bits(x) = length of x in binary = position of highest set bit
    bits = F.length(F.conv(F.col("delta").cast("string"), 10, 2))
    g = d.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_deltas"),
        F.max("delta").alias("max_delta"),
        F.max(bits).alias("bits_needed"),
        F.sum(bits).alias("sum_bits"),
    )
    return g.select(
        "o_orderpriority",
        "n_deltas",
        "max_delta",
        F.col("bits_needed").cast("int").alias("bits_needed"),
        # packed size at the group's fixed width vs 64-bit raw, per mille
        F.expr(
            "(2 * 1000 * bits_needed * n_deltas + 64 * n_deltas) "
            "div (2 * 64 * n_deltas)"
        ).alias("packed_pm"),
    )


def q_ts_decompose_additive(spark, sf_dir):
    """Additive STL-lite DECOMPOSITION of daily revenue: value = trend
    (centered 7-day moving average) + weekday seasonal (mean detrended
    value per weekday) + remainder — the decomposition METHOD, where
    ts_seasonal_profile and ts_seasonal_adjust only report profiles.

    Exact path: daily cents are integers; the centered-MA trend is a
    half-up cents quotient of an exact 7-day window sum; detrended
    values are integer differences; the weekday seasonal is a half-up
    quotient of exact integer group sums; the remainder is pure integer
    subtraction.  value == trend + seasonal + remainder holds exactly
    in integer cents up to the two declared half-up roundings."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    daily = o.groupBy(
        F.expr("datediff(o_orderdate, DATE '1991-12-30')").alias("x")
    ).agg(
        (F.sum("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents")
    )
    half = STL_W // 2
    wt = Window.orderBy("x").rowsBetween(-half, half)
    trended = daily.select(
        "x",
        "cents",
        F.sum("cents").over(wt).alias("ws"),
        F.count(F.lit(1)).over(wt).alias("wn"),
    ).filter(F.col("wn") == STL_W)
    trended = trended.select(
        "x",
        "cents",
        F.expr(f"(2 * ws + {STL_W}) div {2 * STL_W}").alias("trend_c"),
    )
    det = trended.select(
        "x",
        "cents",
        "trend_c",
        (F.col("x") % 7).alias("g"),
        (F.col("cents") - F.col("trend_c")).alias("det_c"),
    )
    wg = Window.partitionBy("g")
    out = det.select(
        "x",
        "g",
        "cents",
        "trend_c",
        F.sum("det_c").over(wg).alias("gs"),
        F.count(F.lit(1)).over(wg).alias("gn"),
    )
    # half-up for possibly NEGATIVE numerators: shift by a multiple of
    # the denominator to stay non-negative (div/ // agree only there)
    seas = F.expr(
        "(2 * (gs + 1000000000000 * gn) + gn) div (2 * gn) - 1000000000000"
    )
    return out.select(
        "x",
        "g",
        (F.col("cents") / 100.0).alias("value"),
        (F.col("trend_c") / 100.0).alias("trend"),
        (seas / 100.0).alias("seasonal"),
        ((F.col("cents") - F.col("trend_c") - seas) / 100.0).alias(
            "remainder"
        ),
    )


def q_inc_bitemporal_asof(spark, sf_dir):
    """BITEMPORAL as-of query: rows carry BOTH a valid-time interval
    (when the fact was true in the world) and a transaction-time
    version (when the warehouse learned it); the probe asks 'as the
    table stood at transaction version T, what was valid on date V?' —
    the audit/backdating semantics SQL:2011 temporal tables implement
    and join_point_in_time (valid time only) cannot answer.

    The bitemporal store is built deterministically from orders: tx 0
    records each order valid [orderdate, orderdate+90d) with its
    original priority; tx 1 RESTATES orders with key % 5 == 0 (new
    priority, validity extended to +180d).  The probe takes the highest
    tx <= T per key (one co-partitioned window), then filters the valid
    interval — two narrow passes, no self-join."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    v0 = o.select(
        "o_orderkey",
        F.lit(0).alias("tx"),
        F.col("o_orderdate").alias("valid_from"),
        F.date_add("o_orderdate", 90).alias("valid_to"),
        F.col("o_orderpriority").alias("prio"),
    )
    v1 = o.filter(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey",
        F.lit(1).alias("tx"),
        F.col("o_orderdate").alias("valid_from"),
        F.date_add("o_orderdate", 180).alias("valid_to"),
        F.lit("0-RESTATED").alias("prio"),
    )
    bt = v0.unionAll(v1).filter(F.col("tx") <= BT_TX_PROBE)
    w = Window.partitionBy("o_orderkey").orderBy(F.col("tx").desc())
    latest = bt.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    probe = latest.filter(
        (F.col("valid_from") <= F.lit(BT_VALID_PROBE))
        & (F.col("valid_to") > F.lit(BT_VALID_PROBE))
    )
    return probe.groupBy("prio").agg(
        F.count(F.lit(1)).alias("n_valid"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


QUERIES = {
    "agg_eb_beta_binomial": q_agg_eb_beta_binomial,
    "fn_delta_encode": q_fn_delta_encode,
    "ts_decompose_additive": q_ts_decompose_additive,
    "inc_bitemporal_asof": q_inc_bitemporal_asof,
}

ORACLES = {
    "agg_eb_beta_binomial": (
        "WITH pu AS (SELECT user_id, count(*) AS n, "
        "sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS k "
        "FROM events GROUP BY 1), "
        "q AS (SELECT user_id, n, k, "
        "(2 * 1000000 * k + n) // (2 * n) AS r6 FROM pu), "
        "mom AS (SELECT count(*) AS u, sum(r6) AS s1, "
        "sum(r6 * r6) AS s2 FROM q), "
        "prior AS (SELECT "
        "(CAST(s1 AS DOUBLE) / u / 1e6) "
        "* ((CAST(s1 AS DOUBLE) / u / 1e6) "
        "* (1 - CAST(s1 AS DOUBLE) / u / 1e6) "
        "/ ((CAST(u AS DOUBLE) * CAST(s2 AS DOUBLE) "
        "- CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) "
        "/ (CAST(u AS DOUBLE) * CAST(u AS DOUBLE)) / 1e12) - 1) AS alpha, "
        "(1 - CAST(s1 AS DOUBLE) / u / 1e6) "
        "* ((CAST(s1 AS DOUBLE) / u / 1e6) "
        "* (1 - CAST(s1 AS DOUBLE) / u / 1e6) "
        "/ ((CAST(u AS DOUBLE) * CAST(s2 AS DOUBLE) "
        "- CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) "
        "/ (CAST(u AS DOUBLE) * CAST(u AS DOUBLE)) / 1e12) - 1) AS beta "
        "FROM mom) "
        "SELECT user_id, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k, "
        "round((k + alpha) / (n + alpha + beta), 6) AS smoothed_rate "
        "FROM q, prior"
    ),
    "fn_delta_encode": (
        "WITH d AS (SELECT o_orderpriority, "
        "o_orderkey - lag(o_orderkey) OVER (PARTITION BY o_orderpriority "
        "ORDER BY o_orderkey) AS delta FROM orders), "
        "b AS (SELECT o_orderpriority, delta, "
        "length(to_base(delta, 2)) AS bits FROM d WHERE delta IS NOT NULL), "
        "g AS (SELECT o_orderpriority, count(*) AS n_deltas, "
        "max(delta) AS max_delta, max(bits) AS bits_needed, "
        "sum(bits) AS sum_bits FROM b GROUP BY 1) "
        "SELECT o_orderpriority, CAST(n_deltas AS BIGINT) AS n_deltas, "
        "CAST(max_delta AS BIGINT) AS max_delta, "
        "CAST(bits_needed AS INT) AS bits_needed, "
        "CAST((2 * 1000 * bits_needed * n_deltas + 64 * n_deltas) "
        "// (2 * 64 * n_deltas) AS BIGINT) AS packed_pm FROM g"
    ),
    "ts_decompose_additive": (
        "WITH daily AS (SELECT "
        "date_diff('day', DATE '1991-12-30', o_orderdate) AS x, "
        "CAST(CAST(sum(o_totalprice) AS DECIMAL(18,2)) * 100 AS BIGINT) "
        "AS cents FROM orders GROUP BY 1), "
        "tr AS (SELECT x, cents, "
        f"sum(cents) OVER w AS ws, count(*) OVER w AS wn FROM daily "
        f"WINDOW w AS (ORDER BY x ROWS BETWEEN {STL_W // 2} PRECEDING "
        f"AND {STL_W // 2} FOLLOWING)), "
        "t2 AS (SELECT x, cents, "
        f"(2 * ws + {STL_W}) // {2 * STL_W} AS trend_c "
        f"FROM tr WHERE wn = {STL_W}), "
        "det AS (SELECT x, cents, trend_c, x % 7 AS g, "
        "cents - trend_c AS det_c FROM t2), "
        "o AS (SELECT x, g, cents, trend_c, "
        "sum(det_c) OVER (PARTITION BY g) AS gs, "
        "count(*) OVER (PARTITION BY g) AS gn FROM det) "
        "SELECT CAST(x AS INT) AS x, CAST(g AS INT) AS g, "
        "cents / 100.0 AS value, trend_c / 100.0 AS trend, "
        "((2 * (gs + 1000000000000 * gn) + gn) // (2 * gn) "
        "- 1000000000000) / 100.0 AS seasonal, "
        "(cents - trend_c - ((2 * (gs + 1000000000000 * gn) + gn) "
        "// (2 * gn) - 1000000000000)) / 100.0 AS remainder FROM o"
    ),
    "inc_bitemporal_asof": (
        "WITH v0 AS (SELECT o_orderkey, 0 AS tx, "
        "CAST(o_orderdate AS DATE) AS valid_from, "
        "CAST(o_orderdate AS DATE) + 90 AS valid_to, "
        "o_orderpriority AS prio FROM orders), "
        "v1 AS (SELECT o_orderkey, 1 AS tx, "
        "CAST(o_orderdate AS DATE) AS valid_from, "
        "CAST(o_orderdate AS DATE) + 180 AS valid_to, "
        "'0-RESTATED' AS prio FROM orders WHERE o_orderkey % 5 = 0), "
        "bt AS (SELECT * FROM v0 UNION ALL SELECT * FROM v1), "
        "latest AS (SELECT *, row_number() OVER (PARTITION BY o_orderkey "
        "ORDER BY tx DESC) AS rn FROM bt "
        f"WHERE tx <= {BT_TX_PROBE}), "
        "probe AS (SELECT * FROM latest WHERE rn = 1 "
        f"AND valid_from <= DATE '{BT_VALID_PROBE}' "
        f"AND valid_to > DATE '{BT_VALID_PROBE}') "
        "SELECT prio, CAST(count(*) AS BIGINT) AS n_valid, "
        "min(o_orderkey) AS min_key, max(o_orderkey) AS max_key "
        "FROM probe GROUP BY 1"
    ),
}
