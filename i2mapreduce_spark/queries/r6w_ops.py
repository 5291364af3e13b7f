"""Round-6 additions, batch 23: winsorized mean (robust location with
exact rank boundaries), the Hill tail-index estimator (extreme-value
theory — how heavy is the revenue tail), Allen's interval algebra (the
13-relation temporal-reasoning classifier), and a snapshot diff (the
CDC table-compare every lakehouse migration validates with).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_tables
from ..operators.ranking import global_row_number

#: winsorization percentile (per-mille, symmetric)
WINSOR_PM = 50          # clamp below p5 / above p95

#: Hill estimator: number of top order statistics
HILL_K = 100

#: snapshot-diff simulation rules (deterministic, SF-independent)
DIFF_DEL_MOD = 7        # v1 drops orderkeys divisible by 7
DIFF_UPD_MOD = 5        # v1 rewrites priority where orderkey % 5 == 0
DIFF_ADD_MOD = 97       # v1 inserts a shifted clone where key % 97 == 0
DIFF_ADD_OFFSET = 1_000_000_000


def q_agg_winsorized_mean(spark, sf_dir):
    """Winsorized mean of order value: clamp everything below the 5th /
    above the 95th percentile to those boundaries, then average — the
    robust location estimate dashboards use when a handful of mega
    orders would drag the plain mean.

    Exact path: percentile boundaries are ORDER STATISTICS — the
    ceil(p*n)-th smallest under the distributed chunked-offset
    row_number (no single-partition sort, no interpolation ambiguity),
    extracted as exact integer cents; the clamp is least/greatest on
    integers; the mean is ONE half-up integer quotient of the clamped
    sum.  Both engines replay identical integer ops."""
    load_tables(spark, sf_dir)
    # complete-case: unpriced orders have no value to rank (the engines'
    # default NULL sort orders differ) — excluded on both sides
    o = spark.table("orders").filter(F.col("o_totalprice").isNotNull()).select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    ranked = global_row_number(o, ["cents", "o_orderkey"], "rk")
    n_row = ranked.agg(F.count(F.lit(1)).alias("n"))
    bounds = (
        ranked.crossJoin(F.broadcast(n_row))
        # ceil(p*n/1000) = (p*n + 999) div 1000 — positive operands only,
        # where Spark div (truncate) and DuckDB // (floor) agree
        .filter(
            (F.col("rk") == F.expr(f"({WINSOR_PM} * n + 999) div 1000"))
            | (
                F.col("rk")
                == F.expr(f"({1000 - WINSOR_PM} * n + 999) div 1000")
            )
        )
        .agg(
            F.min(F.struct("rk", "cents"))["cents"].alias("lo"),
            F.max(F.struct("rk", "cents"))["cents"].alias("hi"),
        )
    )
    clamped = ranked.crossJoin(F.broadcast(bounds)).select(
        F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("cents"))).alias(
            "w"
        ),
        "lo",
        "hi",
    )
    return clamped.groupBy("lo", "hi").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("w").alias("wsum"),
    ).select(
        F.col("n").alias("n_orders"),
        (F.col("lo") / 100.0).alias("p05"),
        (F.col("hi") / 100.0).alias("p95"),
        (
            F.expr("(2 * wsum + n) div (2 * n)") / 100.0
        ).alias("winsorized_mean"),
    )


def q_agg_hill_tail_index(spark, sf_dir):
    """Hill estimator of the order-value tail index: gamma =
    (1/k) * sum_{i<=k} ln(x_(i) / x_(k+1)) over the k largest values —
    the extreme-value-theory number that says whether the revenue tail
    is Pareto-heavy (alpha = 1/gamma < 2 means infinite variance:
    plan capacity by quantiles, not means).

    Plan: distributed top-(k+1) (sort+limit = TakeOrdered, no global
    sort), collected into ONE ordered array; the log-sum folds in rank
    order so both engines stream identical doubles.  The top-k CENTS
    multiset is deterministic regardless of how ties order, because
    only values enter the formula."""
    load_tables(spark, sf_dir)
    o = spark.table("orders").select(
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents")
    )
    top = o.orderBy(F.col("cents").desc()).limit(HILL_K + 1)
    arr = top.agg(
        F.reverse(F.array_sort(F.collect_list("cents"))).alias("a")
    )
    # gamma = mean of ln(x_i) - ln(x_{k+1}) over the k largest, folded
    # in rank order
    gamma = F.expr(
        f"aggregate(slice(a, 1, {HILL_K}), cast(0.0 as double), "
        f"(acc, x) -> acc + ln(x) - ln(element_at(a, {HILL_K + 1}))) "
        f"/ {HILL_K}"
    )
    # the estimator needs all k+1 order statistics: on a table with
    # fewer rows (empty slice, tiny shard) there is no tail to estimate
    # — no report row, mirrored by the oracle's WHERE len(a) filter
    return arr.filter(F.size("a") == HILL_K + 1).select(
        F.lit(HILL_K).alias("k"),
        (F.element_at("a", HILL_K + 1) / 100.0).alias("x_k1"),
        F.round(gamma, 6).alias("hill_gamma"),
        F.round(1.0 / gamma, 6).alias("tail_alpha"),
    )


def q_join_allen_intervals(spark, sf_dir):
    """Allen's interval algebra over order fulfilment windows: classify
    every ordered pair of a customer's orders (interval = orderdate ..
    last shipdate) into the 13 Allen relations (precedes, meets,
    overlaps, starts, during, finishes, equals + inverses) and count
    each — the temporal-reasoning primitive behind scheduling and
    process-mining engines.

    Plan: one agg to per-order intervals, one SELF-JOIN CO-PARTITIONED
    BY CUSTOMER (pair counts bounded per key by orders-per-customer,
    never a global cross product), a CASE ladder of pure date
    comparisons, then a bounded 13-row count.  Pairs are ordered by
    (start, end, orderkey) so each unordered pair is classified exactly
    once and inverse relations are genuinely distinct outcomes."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    li = spark.table("lineitem")
    iv = (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_custkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("e"))
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("ok"),
            F.col("o_orderdate").alias("s"),
            "e",
        )
    )
    pairs = (
        iv.alias("a")
        .join(iv.alias("b"), "o_custkey")
        .filter(
            F.expr(
                "struct(a.s, a.e, a.ok) < struct(b.s, b.e, b.ok)"
            )
        )
    )
    rel = F.expr(
        "CASE "
        "WHEN a.e < b.s THEN 'precedes' "
        "WHEN a.e = b.s AND a.s < b.s THEN 'meets' "
        "WHEN a.s = b.s AND a.e = b.e THEN 'equals' "
        "WHEN a.s = b.s AND a.e < b.e THEN 'starts' "
        "WHEN a.s = b.s AND a.e > b.e THEN 'started_by' "
        "WHEN a.s < b.s AND a.e = b.e THEN 'finished_by' "
        "WHEN a.s < b.s AND a.e > b.e THEN 'contains' "
        "WHEN a.s < b.s AND a.e < b.e THEN 'overlaps' "
        "ELSE 'other' END"
    )
    return (
        pairs.select(rel.alias("relation"))
        .groupBy("relation")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def q_inc_snapshot_diff(spark, sf_dir):
    """Snapshot diff — the CDC table-compare validating every migration
    / time-travel pair: given version v0 and version v1 of the orders
    table (v1 deterministically drops keys divisible by 7 and rewrites
    the priority where key % 5 == 0), a FULL OUTER join on the primary
    key classifies every row as added / removed / changed / unchanged
    and returns the reconciliation counts.  One co-partitioned
    full-outer join on the key; the compared payload is hashed
    column-wise, never collected."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    v0 = o.select("o_orderkey", "o_totalprice", "o_orderpriority")
    v1 = (
        o.filter(F.col("o_orderkey") % DIFF_DEL_MOD != 0)
        .select(
            "o_orderkey",
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % DIFF_UPD_MOD == 0, F.lit("0-REWRITTEN")
            )
            .otherwise(F.col("o_orderpriority"))
            .alias("o_orderpriority"),
        )
        .unionAll(
            o.filter(F.col("o_orderkey") % DIFF_ADD_MOD == 0).select(
                (F.col("o_orderkey") + DIFF_ADD_OFFSET).alias("o_orderkey"),
                "o_totalprice",
                "o_orderpriority",
            )
        )
    )
    j = v0.alias("x").join(
        v1.alias("y"), F.col("x.o_orderkey") == F.col("y.o_orderkey"), "full"
    )
    status = (
        F.when(F.col("x.o_orderkey").isNull(), "added")
        .when(F.col("y.o_orderkey").isNull(), "removed")
        .when(
            (F.col("x.o_totalprice") == F.col("y.o_totalprice"))
            & (F.col("x.o_orderpriority") == F.col("y.o_orderpriority")),
            "unchanged",
        )
        .otherwise("changed")
    )
    return (
        j.select(status.alias("status"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


QUERIES = {
    "agg_winsorized_mean": q_agg_winsorized_mean,
    "agg_hill_tail_index": q_agg_hill_tail_index,
    "join_allen_intervals": q_join_allen_intervals,
    "inc_snapshot_diff": q_inc_snapshot_diff,
}

ORACLES = {
    "agg_winsorized_mean": (
        "WITH o AS (SELECT o_orderkey, "
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) "
        "AS cents FROM orders WHERE o_totalprice IS NOT NULL), "
        "r AS (SELECT cents, row_number() OVER (ORDER BY cents, o_orderkey) "
        "AS rk FROM o), "
        "n AS (SELECT count(*) AS n FROM o), "
        "b AS (SELECT "
        f"max(CASE WHEN rk = ({WINSOR_PM} * n + 999) // 1000 "
        "THEN cents END) AS lo, "
        f"max(CASE WHEN rk = ({1000 - WINSOR_PM} * n + 999) // 1000 "
        "THEN cents END) AS hi FROM r, n), "
        "c AS (SELECT greatest(lo, least(hi, cents)) AS w, lo, hi "
        "FROM r, b) "
        "SELECT CAST(count(*) AS BIGINT) AS n_orders, lo / 100.0 AS p05, "
        "hi / 100.0 AS p95, "
        "(CAST((2 * sum(w) + count(*)) // (2 * count(*)) AS BIGINT)) "
        "/ 100.0 AS winsorized_mean FROM c GROUP BY lo, hi"
    ),
    "agg_hill_tail_index": (
        "WITH top AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) "
        "* 100 AS BIGINT) AS cents FROM orders "
        f"ORDER BY cents DESC LIMIT {HILL_K + 1}), "
        "arr AS (SELECT list(cents ORDER BY cents DESC) AS a FROM top), "
        "g AS (SELECT a, list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(a[1:{HILL_K}], "
        f"x -> ln(x) - ln(a[{HILL_K + 1}]))), "
        f"(acc, v) -> acc + v) / {HILL_K} AS gamma FROM arr) "
        f"SELECT {HILL_K} AS k, a[{HILL_K + 1}] / 100.0 AS x_k1, "
        "round(gamma, 6) AS hill_gamma, "
        "round(1.0 / gamma, 6) AS tail_alpha FROM g "
        f"WHERE len(a) = {HILL_K + 1}"
    ),
    "join_allen_intervals": (
        "WITH iv AS (SELECT o_custkey, o_orderkey AS ok, "
        "o_orderdate AS s, max(l_shipdate) AS e "
        "FROM orders JOIN lineitem ON l_orderkey = o_orderkey "
        "GROUP BY 1, 2, 3), "
        "p AS (SELECT a.s AS s1, a.e AS e1, b.s AS s2, b.e AS e2 "
        "FROM iv a JOIN iv b ON a.o_custkey = b.o_custkey "
        "AND (a.s, a.e, a.ok) < (b.s, b.e, b.ok)) "
        "SELECT CASE "
        "WHEN e1 < s2 THEN 'precedes' "
        "WHEN e1 = s2 AND s1 < s2 THEN 'meets' "
        "WHEN s1 = s2 AND e1 = e2 THEN 'equals' "
        "WHEN s1 = s2 AND e1 < e2 THEN 'starts' "
        "WHEN s1 = s2 AND e1 > e2 THEN 'started_by' "
        "WHEN s1 < s2 AND e1 = e2 THEN 'finished_by' "
        "WHEN s1 < s2 AND e1 > e2 THEN 'contains' "
        "WHEN s1 < s2 AND e1 < e2 THEN 'overlaps' "
        "ELSE 'other' END AS relation, "
        "CAST(count(*) AS BIGINT) AS n_pairs FROM p GROUP BY 1"
    ),
    "inc_snapshot_diff": (
        "WITH v0 AS (SELECT o_orderkey, o_totalprice, o_orderpriority "
        "FROM orders), "
        f"v1 AS (SELECT o_orderkey, o_totalprice, "
        f"CASE WHEN o_orderkey % {DIFF_UPD_MOD} = 0 THEN '0-REWRITTEN' "
        "ELSE o_orderpriority END AS o_orderpriority FROM orders "
        f"WHERE o_orderkey % {DIFF_DEL_MOD} <> 0 "
        f"UNION ALL SELECT o_orderkey + {DIFF_ADD_OFFSET}, o_totalprice, "
        f"o_orderpriority FROM orders WHERE o_orderkey % {DIFF_ADD_MOD} = 0) "
        "SELECT CASE WHEN x.o_orderkey IS NULL THEN 'added' "
        "WHEN y.o_orderkey IS NULL THEN 'removed' "
        "WHEN x.o_totalprice = y.o_totalprice "
        "AND x.o_orderpriority = y.o_orderpriority THEN 'unchanged' "
        "ELSE 'changed' END AS status, "
        "CAST(count(*) AS BIGINT) AS n_rows "
        "FROM v0 x FULL OUTER JOIN v1 y ON x.o_orderkey = y.o_orderkey "
        "GROUP BY 1"
    ),
}
