"""Group H — TPC-H-shaped composite analytics (round 4).

The bread-and-butter decision-support queries every warehouse runs —
multi-table join + selective filter + aggregate + ranked answer —
adapted to this repo's TPC-H-ish fixture schema (no partsupp /
commitdate columns; see TESTDATA.md).  Each is the standard shape of a
numbered TPC-H query, named for what it answers rather than the number.

100 TB notes (shared by all five): every dimension join is
broadcast-eligible (nation/region always; customer/supplier under AQE
when filtered), fact-fact joins shuffle on their keys, every filter
pushes to the parquet scan, and every aggregate runs partial+final.
These are exactly the plans Catalyst should produce on a warehouse
cluster; tests/test_r4_ops.py pins the broadcast/pushdown shapes.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..catalog import load_tables

#: Q3 cutoff: orders placed before, lineitems shipped after
SHIP_CUTOFF = "1998-06-01"
#: Q3 market segment
Q3_SEGMENT = "BUILDING"
#: Q5 region scope
Q5_REGION = "ASIA"
#: Q8 "national" supplier nation under study
Q8_NATION = "NATION_7"
#: Q15 revenue window
Q15_LO, Q15_HI = "1997-01-01", "1997-04-01"


def _ts(s: str):
    return F.lit(s).cast("timestamp_ntz")


def q_agg_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape — top-10 highest-revenue orders not yet fully
    shipped at the cutoff: BUILDING-segment customers, orders placed
    before 1998-06-01, revenue from lineitems shipped after it.

    Plan: segment filter prunes customer before its join (broadcast
    under AQE), date predicates push to both fact scans, revenue
    aggregates partial+final on l_orderkey, and the top-10 is a
    TakeOrderedAndProject — no global sort materializes."""
    load_tables(spark, sf_dir)
    c = spark.table("customer").filter(F.col("c_mktsegment") == Q3_SEGMENT)
    o = spark.table("orders").filter(F.col("o_orderdate") < _ts(SHIP_CUTOFF))
    li = spark.table("lineitem").filter(F.col("l_shipdate") > _ts(SHIP_CUTOFF))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def q_join_exists_priority(spark, sf_dir):
    """TPC-H Q4 shape — per order priority, how many orders have at
    least one line shipped more than 90 days after the order date (the
    fixture's stand-in for the commit/receipt lateness predicate).
    EXISTS as a FILTER (left-semi join), vs join_mark_exists' EXISTS as
    a column.

    Plan: the semi-join shuffles only (orderkey) pairs after the
    lateness predicate prunes lineitem map-side; the count is a 5-group
    aggregate."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    li = spark.table("lineitem")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .select("l_orderkey")
        .distinct()
    )
    return (
        o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_late_orders"))
    )


def q_agg_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape — revenue per nation from LOCAL commerce in one
    region: customer and supplier must sit in the same nation, nation in
    ASIA.  The classic 6-table star-with-a-twist (the same-nation
    predicate correlates two dimension branches).

    Plan: nation⋈region broadcast, the region filter prunes 20 of 25
    nations BEFORE the facts join, and the same-nation equality becomes
    a join key (c_nationkey == s_nationkey) rather than a post-filter,
    so the big join never materializes cross-nation pairs."""
    load_tables(spark, sf_dir)
    n = spark.table("nation")
    r = spark.table("region").filter(F.col("r_name") == Q5_REGION)
    local_nations = n.join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    ).select("n_nationkey", "n_name")
    c = spark.table("customer")
    s = spark.table("supplier")
    o = spark.table("orders")
    li = spark.table("lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(local_nations), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


def q_agg_market_share(spark, sf_dir):
    """TPC-H Q8 shape — NATION_7's share of total order revenue per
    order year: share = Σ(revenue where supplier ∈ NATION_7) / Σ(revenue),
    the sum-of-CASE-over-sum idiom every BI share metric uses.

    Plan: one pass over the joined facts, both sums in the same
    partial+final aggregate keyed by year — the share never needs a
    second scan or a self-join."""
    load_tables(spark, sf_dir)
    n = spark.table("nation")
    s = spark.table("supplier")
    o = spark.table("orders")
    li = spark.table("lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    is_target = (F.col("n_name") == Q8_NATION).cast("double")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.round(F.sum(rev * is_target), 2).alias("nation_revenue"),
            F.round(F.sum(rev), 2).alias("total_revenue"),
            F.round(F.sum(rev * is_target) / F.sum(rev), 6).alias("mkt_share"),
        )
    )


def q_join_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape — the supplier(s) with maximum revenue over one
    quarter, ties kept: revenue per supplier from 1997Q1 shipments, then
    the rows equal to the global max (scalar-subquery max as a 1-row
    broadcast crossJoin, the view+max formulation of the original).

    Plan: revenue aggregates partial+final on suppkey; the max is a
    second tiny aggregate of that result REUSED from the same subtree
    (exchange reuse), not a rescan of lineitem."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem").filter(
        (F.col("l_shipdate") >= _ts(Q15_LO)) & (F.col("l_shipdate") < _ts(Q15_HI))
    )
    s = spark.table("supplier")
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


#: Q7 trading partners (both directions reported)
Q7_NATION_A, Q7_NATION_B = "NATION_3", "NATION_8"
#: Q10 returned-revenue reporting quarter
Q10_LO, Q10_HI = "1998-01-01", "1998-07-01"
#: Q22-shape big-order threshold
Q22_BIG = 400000.0


def q_join_nation_trade_volume(spark, sf_dir):
    """TPC-H Q7 shape — yearly trade volume between two nations, both
    directions: revenue where the supplier sits in one of the pair and
    the customer in the other.  Output: (supp_nation, cust_nation,
    ship_year, revenue).

    Plan: both nation filters broadcast and prune suppliers/customers
    BEFORE the fact joins; the pair predicate is two symmetric
    conjunctions evaluated on broadcast-joined dim columns, never a
    post-join cross filter over unpruned facts."""
    load_tables(spark, sf_dir)
    n = spark.table("nation").filter(
        F.col("n_name").isin(Q7_NATION_A, Q7_NATION_B)
    )
    s = spark.table("supplier").join(
        F.broadcast(n.select(F.col("n_nationkey").alias("sk"),
                             F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("sk"),
    )
    c = spark.table("customer").join(
        F.broadcast(n.select(F.col("n_nationkey").alias("ck"),
                             F.col("n_name").alias("cust_nation"))),
        F.col("c_nationkey") == F.col("ck"),
    )
    o = spark.table("orders")
    li = spark.table("lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


def q_agg_returned_revenue(spark, sf_dir):
    """TPC-H Q10 shape — the returned-item report: top 20 customers by
    revenue LOST to returns (l_returnflag = 'R') in one half-year, with
    their nation.  The query every commerce team runs to find unhappy
    big accounts.

    Plan: returnflag + date predicates push to the lineitem scan,
    revenue aggregates on custkey, nation broadcasts, top-20 is a
    TakeOrderedAndProject."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem").filter(
        (F.col("l_returnflag") == "R")
        & (F.col("l_shipdate") >= _ts(Q10_LO))
        & (F.col("l_shipdate") < _ts(Q10_HI))
    )
    o = spark.table("orders")
    c = spark.table("customer")
    n = spark.table("nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("lost_revenue")
        )
        .orderBy(F.col("lost_revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def q_agg_promo_share(spark, sf_dir):
    """TPC-H Q14 shape — promo revenue share per ship month over one
    year: 100·Σ(revenue where p_type = 'PROMO')/Σ(revenue).  The
    lineitem⋈part join is the first FACT-to-midsize join in the group
    (part is not broadcast-tiny at scale — it shuffles on partkey under
    AQE, broadcast at fixture scale).

    Plan: one pass, both sums in the same partial+final aggregate —
    the share idiom of agg_market_share over a join key that actually
    grows with the catalog."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    p = spark.table("part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = (F.col("p_type") == "PROMO").cast("double")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.month("l_shipdate").alias("ship_month"))
        .agg(
            F.round(F.sum(rev * promo), 2).alias("promo_revenue"),
            F.round(F.sum(rev), 2).alias("total_revenue"),
            F.round(F.lit(100.0) * F.sum(rev * promo) / F.sum(rev), 4).alias(
                "promo_share_pct"
            ),
        )
    )


def q_join_untapped_customers(spark, sf_dir):
    """TPC-H Q22 shape — "untapped wealth": per market segment, the
    customers whose account balance beats the GLOBAL average yet never
    placed a single big order (> 400k) — scalar-subquery threshold +
    anti join, the acquisition-target query.  Output per segment:
    candidate count and their average balance.

    Plan: the global average is a 1-row broadcast; the anti join
    shuffles only custkeys of big orders (pre-filtered map-side); the
    final aggregate groups five segments."""
    load_tables(spark, sf_dir)
    c = spark.table("customer")
    o = spark.table("orders")
    avg_bal = c.agg(F.avg("c_acctbal").alias("avg_bal"))
    big = o.filter(F.col("o_totalprice") > Q22_BIG).select("o_custkey").distinct()
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(big, c.c_custkey == big.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.round(F.avg("c_acctbal"), 2).alias("avg_balance"),
        )
    )


#: Q6 revenue-forecast shipdate window
Q6_LO, Q6_HI = "1996-01-01", "1997-01-01"
#: Q17 brand under study
Q17_BRAND = "Brand#7"
#: Q18 large-volume quantity threshold
Q18_MIN_QTY = 300
#: Q19 (brand, max p_size, qty lo, qty hi) disjunctive brackets
Q19_BRACKETS = (("Brand#3", 5, 1, 11), ("Brand#14", 10, 10, 20),
                ("Brand#22", 15, 20, 30))
#: Q2-flavor part-size scope
Q2_MAX_SIZE = 5


def q_agg_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape — revenue increase from hypothetically eliminating
    small discounts: one filtered global sum of extendedprice*discount
    over a shipdate year, low-discount band, small quantities.

    All three predicates push to the parquet scan; the sum runs over
    exact DECIMAL products (price 2dp x discount 4dp) so the single
    global total is addition-order-independent — the one double
    conversion happens on the final already-reduced value."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem").filter(
        (F.col("l_shipdate") >= _ts(Q6_LO))
        & (F.col("l_shipdate") < _ts(Q6_HI))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * F.col(
        "l_discount"
    ).cast("decimal(8,4)")
    return li.agg(
        F.round(F.sum(rev).cast("double"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def q_agg_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape — distribution of customers by how many orders
    they placed, INCLUDING the zero-order customers a left join keeps:
    (order_count, how many customers have it).

    Plan: left outer customer->orders shuffles on custkey, first agg
    collapses to one row per customer, second agg to ~tens of rows —
    a two-level partial+final cascade with no skew (custkey is
    uniform)."""
    load_tables(spark, sf_dir)
    c = spark.table("customer")
    o = spark.table("orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


def q_agg_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 shape — yearly revenue loss if small-quantity orders of
    one brand's parts were no longer filled: lines whose quantity is
    under 20% of that part's corpus-wide average quantity.

    Plan: the per-part average is a full-fact partial+final agg joined
    back by partkey (the standard decorrelation of Q17's correlated
    subquery).  ``part`` is SF-scaled, so the brand slice is NOT force-
    broadcast — AQE converts the join from runtime stats when the slice
    is genuinely small, and falls back to shuffle join at scale.  The
    global sum runs over DECIMAL(18,2) so it is exact in any addition
    order."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem")
    p = spark.table("part").filter(F.col("p_brand") == Q17_BRAND)
    part_avg = li.groupBy("l_partkey").agg(F.avg("l_quantity").alias("avg_qty"))
    picked = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(part_avg, "l_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
    )
    return picked.agg(
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            / 7.0,
            2,
        ).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def q_join_large_volume_customers(spark, sf_dir):
    """TPC-H Q18 shape — the top-100 largest-volume orders: orders whose
    total line quantity exceeds the threshold, with their customer.

    Plan: the HAVING-subquery becomes a pre-aggregated semi side —
    quantity sums reduce lineitem to one row per order BEFORE any join;
    order/customer join on the ~0.1% survivors, top-100 via
    TakeOrderedAndProject.  Quantity sums are integer-valued doubles
    (exact at any order), surfaced as BIGINT."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem")
    o = spark.table("orders")
    c = spark.table("customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > Q18_MIN_QTY)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.col("total_qty").cast("bigint").alias("total_qty"),
        )
        .orderBy(F.col("totalprice").desc(), "o_orderkey")
        .limit(100)
    )


def q_agg_bracket_revenue(spark, sf_dir):
    """TPC-H Q19 shape — revenue from three disjunctive (brand, size,
    quantity) brackets, the classic OR-of-ANDs predicate that exercises
    a planner's disjunction handling.

    Plan: Catalyst pushes the common l_quantity/p_size bounds and keeps
    the disjunction as a post-join filter; ``part`` is SF-scaled so the
    join strategy is left to AQE (shuffle join at scale, runtime
    broadcast conversion when small).  The single global sum runs over
    exact DECIMAL products."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem")
    p = spark.table("part")
    cond = None
    for brand, max_size, q_lo, q_hi in Q19_BRACKETS:
        c = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, max_size)
            & F.col("l_quantity").between(q_lo, q_hi)
        )
        cond = c if cond is None else (cond | c)
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(8,4)")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.round(F.sum(rev).cast("double"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q_join_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 flavor adapted to this schema (no partsupp table): for
    every small part, the supplier who shipped it at the lowest observed
    unit price (extendedprice/quantity), with the supplier's nation.

    Plan: ``part`` and ``supplier`` are both SF-scaled, so neither is
    force-broadcast — AQE picks broadcast from runtime stats when the
    size slice is small and degrades to shuffle join at scale; only the
    25-row ``nation`` dim keeps a hint.  The per-part argmin is a ranked
    window over the joined fact, partitioned by partkey — ties broken by
    (suppkey, orderkey, linenumber) so the kept row is deterministic on
    any engine and any partitioning."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem")
    p = spark.table("part").filter(F.col("p_size") <= Q2_MAX_SIZE)
    s = spark.table("supplier")
    n = spark.table("nation")
    u = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .withColumn("unit", F.col("l_extendedprice") / F.col("l_quantity"))
    )
    w = Window.partitionBy("p_partkey").orderBy(
        "unit", "s_suppkey", "l_orderkey", "l_linenumber"
    )
    # Display rounding in integer space: round(unit, 4) on the double
    # quotient lands 1 ulp apart across engines at some SFs.  Prices are
    # cent-valued and quantities integer-valued, so unit*10^4 half-up is
    # the exact integer (200*cents + q) div (2*q); /10000.0 is then one
    # IEEE division — identical on any engine.  Ranking stays on the raw
    # double quotient (same bits both sides).
    return (
        u.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .withColumn("cents", F.round(F.col("l_extendedprice") * 100).cast("long"))
        .withColumn("q", F.col("l_quantity").cast("long"))
        .select(
            "p_partkey",
            "s_name",
            "n_name",
            (F.expr("(200 * cents + q) div (2 * q)") / F.lit(10000.0)).alias(
                "min_unit_cost"
            ),
        )
    )


#: Q12-shape lateness threshold (days past order date)
Q12_LATE_DAYS = 60
#: Q9-shape product-name scope
Q9_NAME_PART = "widget"
#: Q11-shape concentration threshold: part revenue > Q11_MEAN_MULT x the
#: MEAN part revenue.  SF-invariant by construction: the original
#: fixed-fraction-of-total cut (total/1000) emitted 0 rows at sf0.01
#: (2000 parts => mean share 1/2000) and shrinks further as parts grow,
#: making the oracle comparison vacuous at grading scale (same defect
#: class as the r5 window_rolling_corr finding).  3/2 as an exact
#: integer ratio (the fixture's per-part revenue tops out at ~1.8x the
#: mean, so 2x was still empty).
Q11_MULT_NUM, Q11_MULT_DEN = 3, 2
#: Q16-shape part sizes under study
Q16_SIZES = (1, 3, 5, 7)
#: Q16-shape "complaint" supplier name suffix (NOT IN exclusion)
Q16_EXCLUDE_SUFFIX = "7"
#: Q20-shape part-name scope and dominant-shipper quantity threshold
Q20_NAME_PART = "gear"
Q20_MIN_QTY = 90
#: Q21-shape lateness threshold (days past order date)
Q21_LATE_DAYS = 90


def q_agg_priority_lateness(spark, sf_dir):
    """TPC-H Q12 shape — did cheap shipping hurt urgent orders?  Per
    line status, among lines shipped more than 60 days after the order
    date, how many belong to urgent-priority orders vs everything else
    (the fixture has no shipmode column; linestatus plays the
    category).

    Plan: the lateness predicate is evaluated on the joined row (it
    spans both tables, so no scan pushdown is possible — the join
    itself shuffles on orderkey), both CASE sums land in one
    partial+final aggregate over 2 groups."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem")
    o = spark.table("orders")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {Q12_LATE_DAYS} DAYS")
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(urgent.cast("long")).alias("high_line_count"),
            F.sum((~urgent).cast("long")).alias("low_line_count"),
        )
    )


def q_agg_product_profit(spark, sf_dir):
    """TPC-H Q9 shape — profit by supplier nation and order year for one
    product family: revenue minus the part's retail value (the fixture's
    stand-in for ps_supplycost*quantity).  The widest join tree in the
    group: lineitem ⋈ orders ⋈ part ⋈ supplier ⋈ nation.

    Plan: the name filter prunes part BEFORE its join (the planner's
    only chance to kill 90% of the fact early); ``part`` is SF-scaled so
    its join strategy is left to AQE rather than force-broadcast; the
    25-row nation dim broadcasts; profit terms are exact DECIMAL
    products so the per-group sums are addition-order-independent, one
    partial+final agg."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem")
    o = spark.table("orders")
    p = spark.table("part").filter(F.col("p_name").contains(Q9_NAME_PART))
    s = spark.table("supplier")
    n = spark.table("nation")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(8,4)")
    cost = F.col("p_retailprice").cast("decimal(18,2)") * F.col(
        "l_quantity"
    ).cast("decimal(9,0)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            # round while still exact DECIMAL (scale-6 differences land on
            # true 3-dp ties that double-then-round would flip per engine),
            # THEN cast the exact 2-dp result to double
            F.round(F.sum(rev) - F.sum(cost), 2)
            .cast("double")
            .alias("profit")
        )
    )


def q_agg_part_concentration(spark, sf_dir):
    """TPC-H Q11 shape — inventory concentration: the parts whose
    lineitem revenue exceeds 3/2 x the mean part revenue
    (HAVING vs a scalar-subquery threshold).  The comparison runs
    entirely in exact integer/DECIMAL space (2*val*n_parts > 3*total) so
    no float knife-edge can flip membership on either engine, and the
    threshold is scale-invariant so the result is non-empty at every SF.

    Plan: one partial+final agg to part grain; the global total+count is
    a second tiny aggregate of the SAME subtree (exchange reuse), joined
    back as a 1-row broadcast."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem")
    pv = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("val")
    )
    total = pv.agg(
        F.sum("val").alias("total_val"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(
            Q11_MULT_DEN * F.col("val") * F.col("n_parts")
            > Q11_MULT_NUM * F.col("total_val")
        )
        .select(
            "l_partkey",
            F.round(F.col("val").cast("double"), 2).alias("part_value"),
        )
    )


def q_join_parts_supplier_counts(spark, sf_dir):
    """TPC-H Q16 shape — supplier breadth per part spec: for the small
    sizes, how many DISTINCT suppliers shipped each (brand, type, size),
    excluding blacklisted suppliers (name ending '7' — the complaints
    NOT-IN of the original).

    Plan: the size filter prunes part before the join and the blacklist
    is an anti join (never a shuffled NOT IN); both tables are SF-scaled
    so neither is force-broadcast — AQE converts to broadcast from
    runtime stats when the slices are small.  The distinct count
    aggregates partial+final on the spec key."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem")
    p = spark.table("part").filter(F.col("p_size").isin(*Q16_SIZES))
    bad = spark.table("supplier").filter(
        F.col("s_name").endswith(Q16_EXCLUDE_SUFFIX)
    ).select("s_suppkey")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q_join_potential_promotion(spark, sf_dir):
    """TPC-H Q20 shape — which suppliers are dominant shippers of a
    product family (candidates for a promotion partnership): suppliers
    with at least one 'gear' part of which they shipped more than 90
    units total.  Nested-IN decorrelated to aggregate-then-semi-join.

    Plan: name filter prunes part before its join (part is SF-scaled so
    the strategy is AQE's call, not a forced broadcast), quantity sums
    reduce to (supp, part) grain BEFORE the supplier join, the final
    semi join ships only surviving suppkeys; the 25-row nation dim
    broadcasts."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem")
    p = spark.table("part").filter(F.col("p_name").contains(Q20_NAME_PART))
    s = spark.table("supplier")
    n = spark.table("nation")
    dominant = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > Q20_MIN_QTY)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(dominant, s.s_suppkey == dominant.l_suppkey, "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
    )


def q_join_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape — suppliers who kept multi-supplier orders
    waiting: per supplier, the number of orders where THIS supplier
    shipped >90 days after the order date while every other supplier on
    the order shipped on time.  Top 20 by count.

    Plan: the correlated EXISTS/NOT-EXISTS pair decorrelates into one
    (order, supplier) lateness rollup + one order-grain rollup joined
    back — two partial+final aggregates and a single shuffle key
    (orderkey), instead of two extra self-joins of the fact; top-20 is
    a TakeOrderedAndProject."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem")
    o = spark.table("orders")
    late = (
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {Q21_LATE_DAYS} DAYS")
    ).cast("long")
    per_os = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("was_late"))
    )
    per_o = per_os.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("was_late").alias("n_late")
    )
    s = spark.table("supplier")
    return (
        per_os.filter(F.col("was_late") == 1)
        .join(per_o, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


QUERIES = {
    "agg_shipping_priority": q_agg_shipping_priority,
    "join_exists_priority": q_join_exists_priority,
    "agg_local_supplier_volume": q_agg_local_supplier_volume,
    "agg_market_share": q_agg_market_share,
    "join_top_supplier": q_join_top_supplier,
    "join_nation_trade_volume": q_join_nation_trade_volume,
    "agg_returned_revenue": q_agg_returned_revenue,
    "agg_promo_share": q_agg_promo_share,
    "join_untapped_customers": q_join_untapped_customers,
    "agg_forecast_revenue": q_agg_forecast_revenue,
    "agg_customer_distribution": q_agg_customer_distribution,
    "agg_small_qty_revenue": q_agg_small_qty_revenue,
    "join_large_volume_customers": q_join_large_volume_customers,
    "agg_bracket_revenue": q_agg_bracket_revenue,
    "join_min_cost_supplier": q_join_min_cost_supplier,
    "agg_priority_lateness": q_agg_priority_lateness,
    "agg_product_profit": q_agg_product_profit,
    "agg_part_concentration": q_agg_part_concentration,
    "join_parts_supplier_counts": q_join_parts_supplier_counts,
    "join_potential_promotion": q_join_potential_promotion,
    "join_waiting_suppliers": q_join_waiting_suppliers,
}

_Q19_SQL_BRACKETS = " OR ".join(
    f"(p_brand = '{b}' AND p_size BETWEEN 1 AND {ms} "
    f"AND l_quantity BETWEEN {lo} AND {hi})"
    for b, ms, lo, hi in Q19_BRACKETS
)

ORACLES = {
    "agg_forecast_revenue": (
        "SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * "
        "CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE), 2) AS revenue, "
        "count(*) AS n_lines FROM lineitem "
        f"WHERE l_shipdate >= TIMESTAMP '{Q6_LO} 00:00:00' "
        f"AND l_shipdate < TIMESTAMP '{Q6_HI} 00:00:00' "
        "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
    ),
    "agg_customer_distribution": (
        "WITH pc AS (SELECT c_custkey, count(o_orderkey) AS c_count "
        "FROM customer LEFT JOIN orders ON c_custkey = o_custkey "
        "GROUP BY c_custkey) "
        "SELECT c_count, count(*) AS custdist FROM pc GROUP BY c_count"
    ),
    "agg_small_qty_revenue": (
        "WITH pa AS (SELECT l_partkey, avg(l_quantity) AS avg_qty "
        "FROM lineitem GROUP BY l_partkey) "
        "SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) "
        "AS DOUBLE) / 7.0, 2) AS avg_yearly, count(*) AS n_lines "
        "FROM lineitem "
        "JOIN part ON l_partkey = p_partkey "
        "JOIN pa USING (l_partkey) "
        f"WHERE p_brand = '{Q17_BRAND}' AND l_quantity < 0.2 * avg_qty"
    ),
    "join_large_volume_customers": (
        "WITH big AS (SELECT l_orderkey, sum(l_quantity) AS total_qty "
        f"FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > {Q18_MIN_QTY}) "
        "SELECT c_name, c_custkey, o_orderkey, o_orderdate, "
        "round(o_totalprice, 2) AS totalprice, "
        "CAST(total_qty AS BIGINT) AS total_qty "
        "FROM big JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "ORDER BY totalprice DESC, o_orderkey LIMIT 100"
    ),
    "agg_bracket_revenue": (
        "SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * "
        "CAST(1 - l_discount AS DECIMAL(8,4))) AS DOUBLE), 2) AS revenue, "
        "count(*) AS n_lines "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        f"WHERE {_Q19_SQL_BRACKETS}"
    ),
    "join_min_cost_supplier": (
        "WITH u AS (SELECT p_partkey, s_name, n_name, "
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS cents, "
        "CAST(l_quantity AS BIGINT) AS q, "
        "row_number() OVER (PARTITION BY p_partkey "
        "ORDER BY l_extendedprice / l_quantity, s_suppkey, l_orderkey, "
        "l_linenumber) AS rn "
        "FROM lineitem "
        "JOIN part ON l_partkey = p_partkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        f"WHERE p_size <= {Q2_MAX_SIZE}) "
        "SELECT p_partkey, s_name, n_name, "
        "((200 * cents + q) // (2 * q)) / 10000.0 AS min_unit_cost "
        "FROM u WHERE rn = 1"
    ),
    "agg_shipping_priority": (
        "SELECT l_orderkey, o_orderdate, o_orderpriority, "
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue "
        "FROM lineitem "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        f"WHERE c_mktsegment = '{Q3_SEGMENT}' "
        f"AND o_orderdate < TIMESTAMP '{SHIP_CUTOFF} 00:00:00' "
        f"AND l_shipdate > TIMESTAMP '{SHIP_CUTOFF} 00:00:00' "
        "GROUP BY l_orderkey, o_orderdate, o_orderpriority "
        "ORDER BY revenue DESC, l_orderkey LIMIT 10"
    ),
    "join_exists_priority": (
        "SELECT o_orderpriority, count(*) AS n_late_orders FROM orders o "
        "WHERE EXISTS (SELECT 1 FROM lineitem l "
        "WHERE l.l_orderkey = o.o_orderkey "
        "AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY) "
        "GROUP BY o_orderpriority"
    ),
    "agg_local_supplier_volume": (
        "SELECT n_name, "
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue "
        "FROM lineitem "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        f"WHERE r_name = '{Q5_REGION}' AND c_nationkey = s_nationkey "
        "GROUP BY n_name"
    ),
    "agg_market_share": (
        "SELECT year(o_orderdate) AS order_year, "
        "round(sum(CASE WHEN n_name = "
        f"'{Q8_NATION}' THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2) "
        "AS nation_revenue, "
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue, "
        "round(sum(CASE WHEN n_name = "
        f"'{Q8_NATION}' THEN l_extendedprice * (1 - l_discount) ELSE 0 END) "
        "/ sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share "
        "FROM lineitem "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "GROUP BY year(o_orderdate)"
    ),
    "join_nation_trade_volume": (
        "SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation, "
        "year(l_shipdate) AS ship_year, "
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue "
        "FROM lineitem "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation sn ON s_nationkey = sn.n_nationkey "
        "JOIN nation cn ON c_nationkey = cn.n_nationkey "
        f"WHERE sn.n_name IN ('{Q7_NATION_A}', '{Q7_NATION_B}') "
        f"AND cn.n_name IN ('{Q7_NATION_A}', '{Q7_NATION_B}') "
        "AND sn.n_name <> cn.n_name "
        "GROUP BY sn.n_name, cn.n_name, year(l_shipdate)"
    ),
    "agg_returned_revenue": (
        "SELECT c_custkey, c_name, n_name, "
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS lost_revenue "
        "FROM lineitem "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "WHERE l_returnflag = 'R' "
        f"AND l_shipdate >= TIMESTAMP '{Q10_LO} 00:00:00' "
        f"AND l_shipdate < TIMESTAMP '{Q10_HI} 00:00:00' "
        "GROUP BY c_custkey, c_name, n_name "
        "ORDER BY lost_revenue DESC, c_custkey LIMIT 20"
    ),
    "agg_promo_share": (
        "SELECT month(l_shipdate) AS ship_month, "
        "round(sum(CASE WHEN p_type = 'PROMO' "
        "THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2) AS promo_revenue, "
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue, "
        "round(100.0 * sum(CASE WHEN p_type = 'PROMO' "
        "THEN l_extendedprice * (1 - l_discount) ELSE 0 END) "
        "/ sum(l_extendedprice * (1 - l_discount)), 4) AS promo_share_pct "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' "
        "AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00' "
        "GROUP BY month(l_shipdate)"
    ),
    "join_untapped_customers": (
        "SELECT c_mktsegment, count(*) AS n_candidates, "
        "round(avg(c_acctbal), 2) AS avg_balance "
        "FROM customer c "
        "WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer) "
        "AND NOT EXISTS (SELECT 1 FROM orders o "
        f"WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > {Q22_BIG}) "
        "GROUP BY c_mktsegment"
    ),
    "agg_priority_lateness": (
        "SELECT l_linestatus, "
        "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') "
        "THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
        "CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') "
        "THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        f"WHERE l_shipdate > o_orderdate + INTERVAL {Q12_LATE_DAYS} DAY "
        "GROUP BY l_linestatus"
    ),
    "agg_product_profit": (
        "SELECT n_name AS nation, year(o_orderdate) AS o_year, "
        "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * "
        "CAST(1 - l_discount AS DECIMAL(8,4))) - "
        "sum(CAST(p_retailprice AS DECIMAL(18,2)) * "
        "CAST(l_quantity AS DECIMAL(9,0))), 2) AS DOUBLE) AS profit "
        "FROM lineitem "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN part ON l_partkey = p_partkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        f"WHERE p_name LIKE '%{Q9_NAME_PART}%' "
        "GROUP BY n_name, year(o_orderdate)"
    ),
    "agg_part_concentration": (
        "WITH pv AS (SELECT l_partkey, "
        "sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS val "
        "FROM lineitem GROUP BY l_partkey), "
        "t AS (SELECT sum(val) AS total_val, count(*) AS n_parts FROM pv) "
        "SELECT l_partkey, round(CAST(val AS DOUBLE), 2) AS part_value "
        f"FROM pv, t WHERE {Q11_MULT_DEN} * val * n_parts > "
        f"{Q11_MULT_NUM} * total_val"
    ),
    "join_parts_supplier_counts": (
        "SELECT p_brand, p_type, p_size, "
        "count(DISTINCT l_suppkey) AS supplier_cnt "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        f"WHERE p_size IN {Q16_SIZES} "
        "AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier "
        f"WHERE s_name LIKE '%{Q16_EXCLUDE_SUFFIX}') "
        "GROUP BY p_brand, p_type, p_size"
    ),
    "join_potential_promotion": (
        "SELECT s_suppkey, s_name, n_name AS nation "
        "FROM supplier JOIN nation ON s_nationkey = n_nationkey "
        "WHERE s_suppkey IN (SELECT l_suppkey "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        f"WHERE p_name LIKE '%{Q20_NAME_PART}%' "
        "GROUP BY l_suppkey, l_partkey "
        f"HAVING sum(l_quantity) > {Q20_MIN_QTY})"
    ),
    "join_waiting_suppliers": (
        "WITH pos AS (SELECT l_orderkey, l_suppkey, "
        "max(CASE WHEN l_shipdate > o_orderdate + "
        f"INTERVAL {Q21_LATE_DAYS} DAY THEN 1 ELSE 0 END) AS was_late "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "GROUP BY l_orderkey, l_suppkey), "
        "po AS (SELECT l_orderkey, count(*) AS n_supp, "
        "sum(was_late) AS n_late FROM pos GROUP BY l_orderkey) "
        "SELECT s_name, count(*) AS numwait "
        "FROM pos JOIN po USING (l_orderkey) "
        "JOIN supplier ON pos.l_suppkey = s_suppkey "
        "WHERE pos.was_late = 1 AND po.n_supp >= 2 AND po.n_late = 1 "
        "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20"
    ),
    "join_top_supplier": (
        "WITH rev AS (SELECT l_suppkey, "
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue "
        "FROM lineitem "
        f"WHERE l_shipdate >= TIMESTAMP '{Q15_LO} 00:00:00' "
        f"AND l_shipdate < TIMESTAMP '{Q15_HI} 00:00:00' "
        "GROUP BY l_suppkey) "
        "SELECT s_suppkey, s_name, total_revenue FROM rev "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "WHERE total_revenue = (SELECT max(total_revenue) FROM rev)"
    ),
}
