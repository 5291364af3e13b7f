"""Group D — aggregation (SURVEY §2B).

Reference analog: combine (ref op A2, map-side partial agg) + reduce
(ref op A4).  Spark's HashAggregateExec runs the same two phases
automatically (partial before the exchange, final after), so the combiner
the reference implements by hand inside MapTask's spill path is free here.

100TB notes: every groupBy below shuffles only the (small) group keyspace
after partial agg; distinct-counts use Expand which multiplies rows —
that is the one agg whose shuffle grows with data, mitigated by partial
distinct aggregation (Spark 4 does partial de-dup map-side).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..catalog import load_tables
from ..operators import ranking


def q_agg_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape over lineitem (the flagship / entry() query)."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem")
    disc_price = li.l_extendedprice * (1 - li.l_discount)
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + li.l_tax)), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q_agg_global(spark, sf_dir):
    """Ungrouped global aggregate over orders."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    return o.agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


def q_agg_distinct_count(spark, sf_dir):
    """Exact multi-column distinct counts per group (Expand-based)."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
    )


def q_agg_bitmap_distinct(spark, sf_dir):
    """EXACT distinct counting via roaring-style bitmaps — the
    warehouse technique for distinct counts that must be exact AND
    incrementally mergeable (HLL trades exactness; plain
    count-distinct can't merge precomputed partials): each key maps to
    (bucket, bit position), per-(group, bucket) bitmaps OR-merge
    associatively, and the final count sums bitmap_count per group.
    Verified here against the plain COUNT(DISTINCT) oracle — the
    bitmap pipeline must be exactly equal, not approximate.

    100 TB: the shuffle carries fixed-size bitmap bytes per (group,
    bucket) instead of one row per distinct value (the Expand blowup of
    multi-distinct aggregation), and a precomputed per-partition/day
    bitmap table supports exact distinct rollups over any date range by
    bitmap_or_agg — the mergeability COUNT(DISTINCT) lacks."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem")
    per_bucket = (
        li.selectExpr(
            "l_returnflag",
            "bitmap_bucket_number(l_orderkey) AS bkt",
            "bitmap_bit_position(l_orderkey) AS pos",
        )
        .groupBy("l_returnflag", "bkt")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )
    return per_bucket.groupBy("l_returnflag").agg(
        F.expr("sum(bitmap_count(bm))").alias("n_distinct_orders")
    )


def q_agg_having(spark, sf_dir):
    """GROUP BY ... HAVING — filter over aggregated output."""
    load_tables(spark, sf_dir)
    c, n = spark.table("customer"), spark.table("nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_cust"))
        .filter(F.col("n_cust") > 60)
    )


def q_agg_rollup(spark, sf_dir):
    """ROLLUP(r_name, n_name) with grouping() flags to disambiguate NULLs."""
    load_tables(spark, sf_dir)
    c = spark.table("customer")
    n = spark.table("nation")
    r = spark.table("region")
    joined = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.rollup("r_name", "n_name").agg(
        F.grouping("r_name").cast("int").alias("g_r"),
        F.grouping("n_name").cast("int").alias("g_n"),
        F.count("*").alias("n_cust"),
        F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
    )


def q_agg_cube(spark, sf_dir):
    """CUBE(event_type, day) over events."""
    load_tables(spark, sf_dir)
    ev = spark.table("events").select(
        "event_type", F.date_trunc("day", F.col("ts")).cast("timestamp_ntz").alias("day"), "value"
    )
    return ev.cube("event_type", "day").agg(
        F.grouping("event_type").cast("int").alias("g_t"),
        F.grouping("day").cast("int").alias("g_d"),
        F.count("*").alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


def q_agg_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS ((status,priority),(status),())."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS INT) AS g_s,
               CAST(grouping(o_orderpriority) AS INT) AS g_p,
               count(*) AS n,
               round(sum(o_totalprice), 2) AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        """
    )


def q_agg_stats(spark, sf_dir):
    """Sample stddev/variance + min/max per market segment."""
    load_tables(spark, sf_dir)
    c = spark.table("customer")
    return c.groupBy("c_mktsegment").agg(
        F.round(F.stddev_samp("c_acctbal"), 2).alias("std_bal"),
        F.round(F.var_samp("c_acctbal"), 2).alias("var_bal"),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
    )


def q_agg_approx_distinct(spark, sf_dir):
    """HLL++ approximate distinct (rows-only: approx is engine-specific).

    tests assert |approx - exact| / exact < 5%.  100TB note: this is the
    *production* distinct-count — constant memory per partition vs the
    Expand-based exact path.
    """
    load_tables(spark, sf_dir)
    li = spark.table("lineitem")
    return li.agg(F.approx_count_distinct("l_partkey").alias("approx_parts"))


def q_agg_pivot(spark, sf_dir):
    """groupBy().pivot().agg() — wide-form reshaping (values enumerated
    explicitly, as a 100TB pivot must be: value discovery is an extra
    full scan).  Output columns renamed to the lowercase contract."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .select(
            "l_returnflag",
            F.coalesce("O", F.lit(0.0)).alias("qty_open"),
            F.coalesce("F", F.lit(0.0)).alias("qty_filled"),
        )
    )


def q_agg_unpivot(spark, sf_dir):
    """unpivot/melt — long-form reshaping (the inverse surface)."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    return o.unpivot(
        ["o_orderkey"],
        ["o_totalprice", "o_custkey"],
        "measure",
        "val",
    ).select("o_orderkey", "measure", F.col("val").cast("double").alias("val"))


def q_agg_percentiles(spark, sf_dir):
    """Exact interpolated percentiles (median/p25/p75) per order status.

    Spark's exact `percentile` and DuckDB's `quantile_cont` both use
    linear interpolation, so the values hash-match after rounding.  100TB
    note: exact percentile sorts each group — the production path at scale
    is `approx_percentile` (KLL/GK sketch, constant memory), kept off the
    hash surface like agg_approx_distinct."""
    load_tables(spark, sf_dir)
    o = spark.table("orders").select(
        "o_orderstatus",
        # quantize to exact integer cents BEFORE the percentile: the
        # quartile interpolation weights (.25/.5/.75) are exact binary
        # fractions, so lo + (hi-lo)*frac over ints is EXACT in double —
        # interpolating the raw doubles landed 1 ulp apart across
        # engines on a 2dp rounding boundary (surfaced by the r8
        # null-injection sweep, where the filtered count shifts the
        # interpolation point)
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    return o.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(cents, 0.25)") / 100.0, 2).alias("p25"),
        F.round(F.expr("percentile(cents, 0.5)") / 100.0, 2).alias("p50"),
        F.round(F.expr("percentile(cents, 0.75)") / 100.0, 2).alias("p75"),
    )


def q_agg_minmax_by(spark, sf_dir):
    """max_by/min_by (argmax/argmin) per nation: customer name at the
    extreme custkey.  Ordering key is unique per group, so the arg is
    deterministic — ties on a non-unique key would be engine-defined."""
    load_tables(spark, sf_dir)
    c = spark.table("customer")
    return c.groupBy("c_nationkey").agg(
        F.max_by("c_name", "c_custkey").alias("latest_cust"),
        F.min_by("c_name", "c_custkey").alias("earliest_cust"),
    )


def q_agg_string_concat(spark, sf_dir):
    """Ordered distinct string aggregation: nations per region as one
    comma-joined sorted string (listagg surface).  Sorting before joining
    is what makes the result order-independent of partitioning."""
    load_tables(spark, sf_dir)
    n = spark.table("nation")
    return n.groupBy("n_regionkey").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("n_name"))).alias("nations")
    )


def q_agg_corr_covar(spark, sf_dir):
    """Pearson correlation + sample covariance of quantity vs discount
    per return flag (two-pass-free: both are single-pass moment aggs with
    partial/final merge — the same combiner shape as A2)."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 4).alias("covar_qty_disc"),
    )


_FILTER_CLAUSE_SQL = (
    "SELECT o_orderstatus, count(*) AS n_all, "
    "count(*) FILTER (WHERE o_totalprice > 200000) AS n_big, "
    "round(coalesce(sum(o_totalprice) FILTER "
    "(WHERE o_orderpriority = '1-URGENT'), 0), 2) AS sum_urgent, "
    "round(coalesce(avg(o_totalprice) FILTER "
    "(WHERE year(o_orderdate) = 1997), 0), 2) AS avg_1997 "
    "FROM orders GROUP BY o_orderstatus"
)


def q_agg_filter_clause(spark, sf_dir):
    """FILTER (WHERE ...) aggregates: several differently-filtered
    aggregates in ONE scan + one agg, instead of N self-joined subqueries
    — the declarative form of a multi-counter combiner (A2), and the
    single-pass shape that matters at 100TB."""
    load_tables(spark, sf_dir)
    return spark.sql(_FILTER_CLAUSE_SQL)


def q_agg_histogram_bins(spark, sf_dir):
    """Fixed-width histogram of order prices: integer bin ids from
    floor(x/width) — a width_bucket equivalent that stays in the integer
    domain (deterministic cross-engine, no float-edge flapping)."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    return (
        o.withColumn("bin", F.floor(F.col("o_totalprice") / F.lit(100000.0)).cast("long"))
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
    )


def q_agg_bool_bitwise(spark, sf_dir):
    """Boolean (bool_and/bool_or) and bitwise (bit_and/bit_or/bit_xor)
    aggregates per order status — all exact integer/boolean domain, all
    partial-aggregable (A2 combiner shape)."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    return o.groupBy("o_orderstatus").agg(
        F.expr("bool_and(o_totalprice > 1000)").alias("all_over_1k"),
        F.expr("bool_or(o_totalprice > 500000)").alias("any_over_500k"),
        F.expr("bit_and(o_orderkey)").alias("key_band"),
        F.expr("bit_or(o_orderkey)").alias("key_bor"),
        F.expr("bit_xor(o_orderkey)").alias("key_bxor"),
    )


def q_agg_distinct_multi(spark, sf_dir):
    """Several DISTINCT aggregates over DIFFERENT columns in one pass —
    Catalyst plans this with an Expand (row replication per distinct
    group), the engine-stressor shape a naive planner executes as N
    separate scans."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("nd_parts"),
        F.countDistinct("l_suppkey").alias("nd_supps"),
        F.countDistinct("l_linestatus").alias("nd_status"),
        F.count("*").alias("n_rows"),
    )


def q_agg_decimal_exact(spark, sf_dir):
    """Exact-decimal revenue accounting: prices accumulate as
    DECIMAL(18,2) (no float drift — the sum of 600k 2-decimal values is
    exact in both engines by construction), then the totals cast to
    double for the cross-engine hash.  Decimal sums shuffle as unscaled
    longs with map-side partial aggregation — same plan as the double
    version, exactness is free at this precision."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    tax = F.col("l_tax").cast("decimal(18,2)")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(price).alias("_sp"),
            F.sum(price + tax).alias("_spt"),
            F.count("*").alias("n_rows"),
        )
        .select(
            "l_returnflag",
            F.col("_sp").cast("double").alias("sum_price"),
            F.col("_spt").cast("double").alias("sum_price_tax"),
            "n_rows",
        )
    )


def q_agg_mode(spark, sf_dir):
    """Deterministic mode (most frequent value, smallest-value tie-break)
    of o_orderpriority per o_orderstatus — count + rank, no `mode()`
    builtin so the tie-break is explicit and portable.

    100TB: the candidate table after the first agg is |statuses x
    priorities| rows — the rank window runs on a micro-table."""
    from pyspark.sql import Window

    load_tables(spark, sf_dir)
    cnt = (
        spark.table("orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("c"))
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("c").desc(), F.col("o_orderpriority")
    )
    return (
        cnt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("c").alias("mode_count"),
        )
    )


def q_agg_skew_kurt(spark, sf_dir):
    """Standardized 3rd/4th moments (skewness, kurtosis) of
    l_extendedprice per l_returnflag, computed from explicit two-pass
    standardized residuals — identical arithmetic in both engines, which
    sidesteps the sample-vs-population bias-correction dialect split
    between Spark's skewness()/kurtosis() and DuckDB's.

    100TB: pass 1 is a tiny per-group stats agg broadcast back; pass 2
    re-aggregates the scan — two scans, zero wide shuffles beyond the
    group keyspace."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem")
    stats = li.groupBy("l_returnflag").agg(
        F.avg("l_extendedprice").alias("mu"),
        F.stddev_pop("l_extendedprice").alias("sd"),
    )
    # try_divide: a single-row group has sd = 0 and no standardized
    # moments — NULL on both engines (DuckDB x/0 is NULL)
    z = F.try_divide(F.col("l_extendedprice") - F.col("mu"), F.col("sd"))
    return (
        li.join(F.broadcast(stats), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.avg(F.pow(z, 3)), 6).alias("skew"),
            F.round(F.avg(F.pow(z, 4)), 6).alias("kurt"),
        )
    )


def q_agg_weighted_median(spark, sf_dir):
    """Weighted median: smallest l_extendedprice whose running
    l_quantity weight reaches half the group total, per l_returnflag —
    the cumulative-weight window formulation (quantity-weighted price
    median, the robust price statistic).

    100TB: the cumulative window sorts within each group — at scale this
    is the one truly rank-based statistic here; the group count is tiny
    so the sort parallelizes across groups, and integer weights keep the
    half-total threshold exact (no float ties)."""
    from pyspark.sql import Window

    load_tables(spark, sf_dir)
    li = spark.table("lineitem").select(
        "l_returnflag",
        "l_extendedprice",
        F.col("l_quantity").cast("long").alias("wt"),
    )
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("l_returnflag")
    cum = li.withColumn("cw", F.sum("wt").over(w_cum)).withColumn(
        "tot", F.sum("wt").over(w_tot)
    )
    return (
        cum.filter(F.col("cw") * 2 >= F.col("tot"))
        .groupBy("l_returnflag")
        .agg(
            F.min("l_extendedprice").alias("weighted_median"),
            F.max("tot").alias("total_weight"),
        )
    )


def q_agg_linreg(spark, sf_dir):
    """Per-group ordinary-least-squares via the SQL regr_* aggregate
    family (slope / intercept / r² / n of extendedprice on quantity per
    returnflag) — single-pass distributed moments, no iteration.

    The intercept straddles zero across groups, so it carries the ±0.0
    normalization (`+ 0.0`) on both engines."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        (F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4) + F.lit(0.0)).alias(
            "intercept"
        ),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        F.regr_count("l_extendedprice", "l_quantity").alias("n"),
    )


def q_agg_approx_percentile(spark, sf_dir):
    """Sketch-based quantiles: percentile_approx (Greenwald-Khanna in
    Spark) for p50/p95/p99 of extendedprice per returnflag at accuracy
    10000 — the single-pass mergeable alternative to exact percentiles
    when a 100 TB column can't be sorted.  Approx output is rows-only by
    design (sketch internals differ across engines); the error bound vs
    the exact quantile is asserted in tests/test_r3c_ops.py."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile_approx("l_extendedprice", 0.5, 10000), 2).alias("p50"),
        F.round(F.percentile_approx("l_extendedprice", 0.95, 10000), 2).alias("p95"),
        F.round(F.percentile_approx("l_extendedprice", 0.99, 10000), 2).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


def q_agg_gini(spark, sf_dir):
    """Gini coefficient of order revenue across customers — the
    inequality/concentration measure a marketplace-health dashboard
    tracks: with per-customer revenue x sorted ascending and ranked
    i = 1..n, G = 2·Σ(i·x_i)/(n·Σx) − (n+1)/n.  One grouped sum, one
    DISTRIBUTED global rank, one global fold.

    Gini needs a total order over all n customers — base-table
    cardinality, so an unpartitioned rank window would funnel every row
    into one task at 100 TB.  The rank instead comes from
    operators/ranking.global_row_number (range-partition + local
    row_number + chunked offsets), which is bit-identical to the global
    window for the unique (revenue, custkey) order but stays parallel.

    The rank tie-break (revenue, then custkey) makes the rank total and
    the Σ(i·x_i) identical across engines even with duplicate revenues
    (equal x under different i contribute the same sum)."""
    load_tables(spark, sf_dir)
    rev = (
        spark.table("orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("x"))
    )
    ranked = ranking.global_row_number(rev, ["x", "o_custkey"], out_col="i")
    return ranked.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(
            2 * F.sum(F.col("i") * F.col("x")) / (F.count(F.lit(1)) * F.sum("x"))
            - (F.count(F.lit(1)) + 1) / F.count(F.lit(1)),
            6,
        ).alias("gini"),
    )


def q_agg_freq_items(spark, sf_dir):
    """DataFrame.stat.freqItems — Spark's native Karp-Papadimitriou-
    Shenker frequent-elements sketch (single pass, constant memory):
    candidate items with frequency above 5% in returnflag and
    orderstatus-by-priority columns.  Sketch output is a SUPERSET of the
    true frequent items (rows-only by design); the no-false-negative
    guarantee is asserted against exact counts in tests.

    Output is flattened to scalar columns (sorted, comma-joined) per the
    grading contract's flat-columns rule — array columns are unhashable
    in the driver's pandas canonicalizer."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem")
    fi = li.stat.freqItems(["l_returnflag", "l_linestatus"], support=0.05)
    return fi.select(
        F.array_join(F.array_sort("l_returnflag_freqItems"), ",").alias(
            "flag_candidates"
        ),
        F.array_join(F.array_sort("l_linestatus_freqItems"), ",").alias(
            "status_candidates"
        ),
    )


def q_agg_equidepth_histogram(spark, sf_dir):
    """Equi-DEPTH histogram (decile edges) of order totals per status —
    the optimizer-statistics histogram form where each bucket holds the
    same row count, vs agg_histogram_bins' equi-width buckets.  One
    exact percentile aggregate returning the full edge array, exploded
    to (status, decile, edge) rows; Spark's `percentile` and DuckDB's
    `quantile_cont` share linear interpolation, so the edges hash-match
    at 2 dp."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    qs = [i / 10.0 for i in range(1, 10)]
    edges = o.groupBy("o_orderstatus").agg(
        F.expr(
            f"percentile(o_totalprice, array({', '.join(str(x) for x in qs)}))"
        ).alias("edges")
    )
    return edges.select(
        "o_orderstatus", F.posexplode("edges").alias("i", "edge")
    ).select(
        "o_orderstatus",
        (F.col("i") + 1).alias("decile"),
        F.round("edge", 2).alias("edge"),
    )


def q_agg_hll_union(spark, sf_dir):
    """Mergeable HLL distinct sketches — THE 100 TB distinct-count
    pattern: per-nation customer sketches built in one pass, then
    UNIONED (not recomputed) into a global estimate.  Sketch union is
    associative, so a warehouse keeps per-partition/per-day sketches and
    answers any rollup without touching raw data again.

    Output is rows-only by design (estimates are implementation-defined
    across engines); pytest asserts each estimate within 5% of its exact
    twin and that the unioned estimate equals the directly-built global
    sketch's estimate (merge losslessness)."""
    load_tables(spark, sf_dir)
    c = spark.table("customer")
    per_nation = c.groupBy("c_nationkey").agg(
        F.expr("hll_sketch_agg(c_custkey)").alias("sk"),
        F.countDistinct("c_custkey").alias("exact_distinct"),
    )
    unioned = per_nation.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"),
    )
    return per_nation.select(
        "c_nationkey",
        "exact_distinct",
        F.expr("hll_sketch_estimate(sk)").alias("est_distinct"),
        F.lit(None).cast("long").alias("global_est"),
    ).unionByName(
        unioned.select(
            F.lit(-1).alias("c_nationkey"),
            F.lit(None).cast("long").alias("exact_distinct"),
            F.lit(None).cast("long").alias("est_distinct"),
            F.col("est").alias("global_est"),
        )
    )


QUERIES = {
    "agg_hll_union": q_agg_hll_union,
    "agg_equidepth_histogram": q_agg_equidepth_histogram,
    "agg_freq_items": q_agg_freq_items,
    "agg_gini": q_agg_gini,
    "agg_approx_percentile": q_agg_approx_percentile,
    "agg_linreg": q_agg_linreg,
    "agg_mode": q_agg_mode,
    "agg_skew_kurt": q_agg_skew_kurt,
    "agg_weighted_median": q_agg_weighted_median,
    "agg_distinct_multi": q_agg_distinct_multi,
    "agg_decimal_exact": q_agg_decimal_exact,
    "agg_pricing_summary": q_agg_pricing_summary,
    "agg_global": q_agg_global,
    "agg_bitmap_distinct": q_agg_bitmap_distinct,
    "agg_distinct_count": q_agg_distinct_count,
    "agg_having": q_agg_having,
    "agg_rollup": q_agg_rollup,
    "agg_cube": q_agg_cube,
    "agg_grouping_sets": q_agg_grouping_sets,
    "agg_stats": q_agg_stats,
    "agg_approx_distinct": q_agg_approx_distinct,
    "agg_pivot": q_agg_pivot,
    "agg_unpivot": q_agg_unpivot,
    "agg_percentiles": q_agg_percentiles,
    "agg_minmax_by": q_agg_minmax_by,
    "agg_string_concat": q_agg_string_concat,
    "agg_corr_covar": q_agg_corr_covar,
    "agg_histogram_bins": q_agg_histogram_bins,
    "agg_filter_clause": q_agg_filter_clause,
    "agg_bool_bitwise": q_agg_bool_bitwise,
}

ORACLES = {
    "agg_equidepth_histogram": (
        "WITH e AS (SELECT o_orderstatus, "
        "quantile_cont(o_totalprice, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) "
        "AS edges FROM orders GROUP BY o_orderstatus) "
        "SELECT o_orderstatus, t.i AS decile, "
        "round(edges[t.i], 2) AS edge FROM e, "
        "LATERAL (SELECT unnest(range(1, 10)) AS i) t"
    ),
    "agg_gini": (
        "WITH rev AS (SELECT o_custkey, sum(o_totalprice) AS x FROM orders "
        "GROUP BY o_custkey), "
        "r AS (SELECT x, row_number() OVER (ORDER BY x, o_custkey) AS i FROM rev) "
        "SELECT count(*) AS n_customers, "
        "round(2 * sum(i * x) / (count(*) * sum(x)) "
        "- (count(*) + 1.0) / count(*), 6) AS gini FROM r"
    ),
    "agg_linreg": (
        "SELECT l_returnflag, "
        "round(regr_slope(l_extendedprice, l_quantity), 4) AS slope, "
        "round(regr_intercept(l_extendedprice, l_quantity), 4) + 0.0 AS intercept, "
        "round(regr_r2(l_extendedprice, l_quantity), 6) AS r2, "
        "regr_count(l_extendedprice, l_quantity) AS n FROM lineitem "
        "GROUP BY l_returnflag"
    ),
    "agg_mode": (
        "WITH cnt AS (SELECT o_orderstatus, o_orderpriority, count(*) AS c "
        "FROM orders GROUP BY 1, 2), "
        "rk AS (SELECT *, row_number() OVER (PARTITION BY o_orderstatus "
        "ORDER BY c DESC, o_orderpriority) AS rn FROM cnt) "
        "SELECT o_orderstatus, o_orderpriority AS mode_priority, c AS mode_count "
        "FROM rk WHERE rn = 1"
    ),
    "agg_skew_kurt": (
        "WITH stats AS (SELECT l_returnflag, avg(l_extendedprice) AS mu, "
        "stddev_pop(l_extendedprice) AS sd FROM lineitem GROUP BY 1) "
        "SELECT l.l_returnflag, count(*) AS n_rows, "
        "round(avg(pow((l_extendedprice - mu) / sd, 3)), 6) AS skew, "
        "round(avg(pow((l_extendedprice - mu) / sd, 4)), 6) AS kurt "
        "FROM lineitem l JOIN stats s ON l.l_returnflag = s.l_returnflag "
        "GROUP BY l.l_returnflag"
    ),
    "agg_weighted_median": (
        "WITH w AS (SELECT l_returnflag, l_extendedprice, "
        "CAST(l_quantity AS BIGINT) AS wt FROM lineitem), "
        "cum AS (SELECT l_returnflag, l_extendedprice, "
        "sum(wt) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw, "
        "sum(wt) OVER (PARTITION BY l_returnflag) AS tot FROM w) "
        "SELECT l_returnflag, min(l_extendedprice) AS weighted_median, "
        "CAST(max(tot) AS BIGINT) AS total_weight "
        "FROM cum WHERE cw * 2 >= tot GROUP BY l_returnflag"
    ),
    "agg_decimal_exact": (
        "SELECT l_returnflag, "
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price, "
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) "
        "+ CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS sum_price_tax, "
        "count(*) AS n_rows FROM lineitem GROUP BY l_returnflag"
    ),
    "agg_distinct_multi": (
        "SELECT l_returnflag, count(DISTINCT l_partkey) AS nd_parts, "
        "count(DISTINCT l_suppkey) AS nd_supps, "
        "count(DISTINCT l_linestatus) AS nd_status, count(*) AS n_rows "
        "FROM lineitem GROUP BY l_returnflag"
    ),
    "agg_pricing_summary": (
        "SELECT l_returnflag, l_linestatus, "
        "round(sum(l_quantity), 2) AS sum_qty, "
        "round(sum(l_extendedprice), 2) AS sum_base_price, "
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, "
        "round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge, "
        "round(avg(l_quantity), 2) AS avg_qty, "
        "round(avg(l_extendedprice), 2) AS avg_price, "
        "round(avg(l_discount), 4) AS avg_disc, "
        "count(*) AS count_order "
        "FROM lineitem GROUP BY l_returnflag, l_linestatus"
    ),
    "agg_global": (
        "SELECT count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_price, "
        "round(avg(o_totalprice), 4) AS avg_price, "
        "round(min(o_totalprice), 2) AS min_price, "
        "round(max(o_totalprice), 2) AS max_price FROM orders"
    ),
    "agg_bitmap_distinct": (
        "SELECT l_returnflag, "
        "CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_distinct_orders "
        "FROM lineitem GROUP BY l_returnflag"
    ),
    "agg_distinct_count": (
        "SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp, "
        "count(DISTINCT l_partkey) AS n_part FROM lineitem GROUP BY l_returnflag"
    ),
    "agg_having": (
        "SELECT n_name, count(*) AS n_cust FROM customer "
        "JOIN nation ON c_nationkey = n_nationkey "
        "GROUP BY n_name HAVING count(*) > 60"
    ),
    "agg_rollup": (
        "SELECT r_name, n_name, "
        "CAST(grouping(r_name) AS INT) AS g_r, CAST(grouping(n_name) AS INT) AS g_n, "
        "count(*) AS n_cust, round(sum(c_acctbal), 2) AS sum_bal "
        "FROM customer JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "GROUP BY ROLLUP(r_name, n_name) "
        # declared semantics: grouping-set rows need >= 1 contributing
        # row.  Spark emits NO rows (not even the () grand total) for
        # ROLLUP/CUBE/GROUPING SETS over empty input, while DuckDB/
        # Postgres emit the SQL-standard count-0 grand-total row; the
        # HAVING (a no-op on any non-empty input) pins the engines to
        # the same — Spark's — behavior on empty slices
        "HAVING count(*) > 0"
    ),
    "agg_cube": (
        "SELECT event_type, day, "
        "CAST(grouping(event_type) AS INT) AS g_t, CAST(grouping(day) AS INT) AS g_d, "
        "count(*) AS n, round(sum(value), 2) AS sum_value "
        "FROM (SELECT event_type, date_trunc('day', ts) AS day, value FROM events) t "
        "GROUP BY CUBE(event_type, day) "
        "HAVING count(*) > 0"  # see agg_rollup: pin empty-input behavior
    ),
    "agg_grouping_sets": (
        "SELECT o_orderstatus, o_orderpriority, "
        "CAST(grouping(o_orderstatus) AS INT) AS g_s, "
        "CAST(grouping(o_orderpriority) AS INT) AS g_p, "
        "count(*) AS n, round(sum(o_totalprice), 2) AS sum_price "
        "FROM orders "
        "GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ()) "
        "HAVING count(*) > 0"  # see agg_rollup: pin empty-input behavior
    ),
    "agg_stats": (
        "SELECT c_mktsegment, round(stddev_samp(c_acctbal), 2) AS std_bal, "
        "round(var_samp(c_acctbal), 2) AS var_bal, "
        "round(min(c_acctbal), 2) AS min_bal, round(max(c_acctbal), 2) AS max_bal "
        "FROM customer GROUP BY c_mktsegment"
    ),
    # agg_approx_distinct: rows-only (approximate)
    "agg_percentiles": (
        "WITH o AS (SELECT o_orderstatus, "
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents "
        "FROM orders) "
        "SELECT o_orderstatus, "
        "round(CAST(quantile_cont(cents, 0.25) AS DOUBLE) / 100.0, 2) AS p25, "
        "round(CAST(quantile_cont(cents, 0.5) AS DOUBLE) / 100.0, 2) AS p50, "
        "round(CAST(quantile_cont(cents, 0.75) AS DOUBLE) / 100.0, 2) AS p75 "
        "FROM o GROUP BY o_orderstatus"
    ),
    "agg_minmax_by": (
        "SELECT c_nationkey, max_by(c_name, c_custkey) AS latest_cust, "
        "min_by(c_name, c_custkey) AS earliest_cust "
        "FROM customer GROUP BY c_nationkey"
    ),
    "agg_string_concat": (
        "SELECT n_regionkey, "
        "string_agg(DISTINCT n_name, ',' ORDER BY n_name) AS nations "
        "FROM nation GROUP BY n_regionkey"
    ),
    "agg_corr_covar": (
        "SELECT l_returnflag, "
        "round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price, "
        "round(covar_samp(l_quantity, l_discount), 4) AS covar_qty_disc "
        "FROM lineitem GROUP BY l_returnflag"
    ),
    "agg_filter_clause": _FILTER_CLAUSE_SQL,
    "agg_bool_bitwise": (
        "SELECT o_orderstatus, "
        "bool_and(o_totalprice > 1000) AS all_over_1k, "
        "bool_or(o_totalprice > 500000) AS any_over_500k, "
        "bit_and(o_orderkey) AS key_band, "
        "bit_or(o_orderkey) AS key_bor, "
        "bit_xor(o_orderkey) AS key_bxor "
        "FROM orders GROUP BY o_orderstatus"
    ),
    "agg_histogram_bins": (
        "SELECT CAST(floor(o_totalprice / 100000.0) AS BIGINT) AS bin, "
        "count(*) AS n, round(avg(o_totalprice), 2) AS avg_price "
        "FROM orders GROUP BY 1"
    ),
    "agg_pivot": (
        "SELECT l_returnflag, "
        "coalesce(round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2), 0.0)"
        " AS qty_open, "
        "coalesce(round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2), 0.0)"
        " AS qty_filled "
        "FROM lineitem GROUP BY l_returnflag"
    ),
    "agg_unpivot": (
        "SELECT o_orderkey, 'o_totalprice' AS measure,"
        " CAST(o_totalprice AS DOUBLE) AS val FROM orders"
        " UNION ALL "
        "SELECT o_orderkey, 'o_custkey' AS measure,"
        " CAST(o_custkey AS DOUBLE) AS val FROM orders"
    ),
}
