"""Round-6 additions, batch 22: bipartiteness testing (the odd-cycle
detector — graph-theoretic input validation before bipartite-only
algorithms like ALS), mutual information (the information-theoretic
association measure completing chi-square/Cramér's V), systematic
sampling (the every-k-th design built on the distributed rank), and an
inclusion-dependency audit (Bellman-style FK discovery).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import cte, load_tables
from ..operators import algorithms
from ..operators.ranking import global_row_number

#: bipartite check: BFS hop cap (covers the giant component here)
BIP_HOPS = 6

#: systematic sampling interval
SYS_K = 40


def q_iter_bipartite_check(spark, sf_dir):
    """Bipartiteness test of the co-purchase graph by 2-coloring: BFS
    from the minimum node, color = parity of hop distance, then count
    MONOCHROMATIC edges (same color on both endpoints = odd cycle
    witness).  The input validator run before any bipartite-only
    algorithm (ALS, bipartite matching); co-purchase co-occurrence is
    densely triangular, so it fails loudly — the point of the audit.

    Plan: one hop-capped frontier BFS (operators.algorithms.sssp — per
    hop one co-partitioned join + min fold) and one edges-to-colors
    equi-join pair; scope is the BFS-reached subgraph, declared by the
    hop cap.  Oracle replays the BFS as a recursive CTE with the same
    cap."""
    load_tables(spark, sf_dir)
    edges = spark.table("edges_pp").localCheckpoint(eager=True)
    seed = edges.agg(F.min("src")).collect()[0][0]
    if seed is None:  # empty graph: no edges to color, nothing to report
        return spark.createDataFrame(
            [],
            "bfs_source int, n_edges_colored long, n_monochrome long, "
            "is_bipartite boolean",
        )
    s0 = int(seed)
    col = algorithms.sssp(edges, s0, max_hops=BIP_HOPS).select(
        "node", (F.col("dist") % 2).alias("c")
    )
    e2 = (
        edges.join(col.withColumnRenamed("node", "src").withColumnRenamed("c", "cs"), "src")
        .join(col.withColumnRenamed("node", "dst").withColumnRenamed("c", "cd"), "dst")
    )
    return e2.agg(
        F.lit(s0).alias("bfs_source"),
        F.count(F.lit(1)).alias("n_edges_colored"),
        F.sum((F.col("cs") == F.col("cd")).cast("long")).alias("n_monochrome"),
        (F.sum((F.col("cs") == F.col("cd")).cast("long")) == 0).alias(
            "is_bipartite"
        ),
    )


def q_agg_mutual_info(spark, sf_dir):
    """Mutual information (in nats) between event type and day-of-week
    — the information-theoretic association measure that, unlike
    chi-square (agg_chi_square / agg_cramers_v), is directly
    interpretable as bits-of-dependence and robust to cell count.
    MI = sum p_xy * ln(N*o_xy / (r_x*c_y)) over the bounded enum grid.

    Cross-engine discipline (agg_cramers_v convention): marginals are
    exact integers, each cell term is one fixed-shape expression of
    four ints, and the grid folds in sorted (type, dow) order so both
    engines stream identical doubles; MI is transcendental, 6dp
    rounding never lands on a tie."""
    load_tables(spark, sf_dir)
    from pyspark.sql import Window

    e = spark.table("events")
    cells = e.groupBy(
        "event_type", F.dayofweek("ts").alias("dow")
    ).agg(F.count(F.lit(1)).alias("o"))
    wr = Window.partitionBy("event_type")
    wc = Window.partitionBy("dow")
    wt = Window.partitionBy()
    scored = cells.select(
        "event_type",
        "dow",
        "o",
        F.sum("o").over(wr).alias("r"),
        F.sum("o").over(wc).alias("c"),
        F.sum("o").over(wt).alias("n"),
    )
    term = (
        F.col("o")
        / F.col("n").cast("double")
        * F.log(
            F.col("n").cast("double")
            * F.col("o")
            / (F.col("r") * F.col("c")).cast("double")
        )
    )
    agg = scored.groupBy("n").agg(
        F.array_sort(
            F.collect_list(F.struct("event_type", "dow", term.alias("t")))
        ).alias("ts")
    )
    mi = F.expr(
        "aggregate(slice(ts, 2, size(ts) - 1), element_at(ts, 1).t, "
        "(acc, x) -> acc + x.t)"
    )
    return agg.select(
        F.col("n").alias("n_events"),
        F.round(mi, 6).alias("mi_nats"),
    )


def q_sample_systematic(spark, sf_dir):
    """SYSTEMATIC sample of orders: every SYS_K-th row under the unique
    total order (o_orderdate, o_orderkey) — the even-coverage design
    (stratifies implicitly over the sort dimension, here time) used
    when a uniform hash sample would leave date gaps.  The global rank
    comes from the distributed chunked-offset row_number
    (ranking.global_row_number), NOT a single-partition window; the
    filter is a pure modulus on that rank."""
    load_tables(spark, sf_dir)
    o = spark.table("orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    ranked = global_row_number(o, ["o_orderdate", "o_orderkey"], "rk")
    return ranked.filter(F.col("rk") % SYS_K == 1).select(
        "o_orderkey", "o_orderdate", "o_totalprice", "rk"
    )


def q_dq_inclusion_dependency(spark, sf_dir):
    """Inclusion-dependency audit (Bellman-style FK discovery): for the
    candidate pair (lineitem.l_partkey, part.p_partkey), measure BOTH
    containment directions on distinct key sets — |A∩B|/|A| and
    |A∩B|/|B| — plus orphan counts.  Direction A⊆B at ~1000‰ nominates
    a foreign key; the reverse coefficient exposes unreferenced parent
    rows.  Two distinct-projections and one join on the key (all
    co-partitioned by the audited column); per-mille values are
    half-up integer quotients."""
    load_tables(spark, sf_dir)
    a = spark.table("lineitem").select(
        F.col("l_partkey").alias("k")
    ).distinct()
    b = spark.table("part").select(F.col("p_partkey").alias("k")).distinct()
    both = a.join(b, "k").agg(F.count(F.lit(1)).alias("n_both"))
    na = a.agg(F.count(F.lit(1)).alias("n_a"))
    nb = b.agg(F.count(F.lit(1)).alias("n_b"))
    return (
        both.crossJoin(na)
        .crossJoin(nb)
        .select(
            "n_a",
            "n_b",
            "n_both",
            (F.col("n_a") - F.col("n_both")).alias("orphans_a"),
            (F.col("n_b") - F.col("n_both")).alias("unreferenced_b"),
            # zero-denominator guards match DuckDB (x // 0 is NULL): the
            # containment of an empty key set is undefined, not an error
            F.expr(
                "CASE WHEN n_a = 0 THEN CAST(NULL AS BIGINT) "
                "ELSE (2 * 1000 * n_both + n_a) div (2 * n_a) END"
            ).alias("a_in_b_pm"),
            F.expr(
                "CASE WHEN n_b = 0 THEN CAST(NULL AS BIGINT) "
                "ELSE (2 * 1000 * n_both + n_b) div (2 * n_b) END"
            ).alias("b_in_a_pm"),
        )
    )


QUERIES = {
    "iter_bipartite_check": q_iter_bipartite_check,
    "agg_mutual_info": q_agg_mutual_info,
    "sample_systematic": q_sample_systematic,
    "dq_inclusion_dependency": q_dq_inclusion_dependency,
}

ORACLES = {
    "iter_bipartite_check": (
        cte("edges_pp")
        + (
            ", bfs(node, dist) AS ("
            "SELECT (SELECT min(src) FROM edges_pp), 0 "
            "UNION "
            "SELECT e.dst, b.dist + 1 FROM bfs b "
            f"JOIN edges_pp e ON e.src = b.node WHERE b.dist < {BIP_HOPS}"
            "), "
            "col AS (SELECT node, min(dist) % 2 AS c FROM bfs GROUP BY 1) "
            "SELECT (SELECT min(src) FROM edges_pp) AS bfs_source, "
            "CAST(count(*) AS BIGINT) AS n_edges_colored, "
            "CAST(sum(CASE WHEN s.c = d.c THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_monochrome, "
            "sum(CASE WHEN s.c = d.c THEN 1 ELSE 0 END) = 0 AS is_bipartite "
            "FROM edges_pp e JOIN col s ON e.src = s.node "
            "JOIN col d ON e.dst = d.node "
            # empty graph: no colored edges, no report row (matches the
            # Spark-side empty-seed guard)
            "HAVING count(*) > 0"
        )
    ).replace("WITH ", "WITH RECURSIVE ", 1),
    "agg_mutual_info": (
        "WITH cells AS (SELECT event_type, dayofweek(ts) + 1 AS dow, "
        "count(*) AS o FROM events GROUP BY 1, 2), "
        "scored AS (SELECT event_type, dow, o, "
        "sum(o) OVER (PARTITION BY event_type) AS r, "
        "sum(o) OVER (PARTITION BY dow) AS c, "
        "sum(o) OVER () AS n FROM cells), "
        "terms AS (SELECT n, list({'event_type': event_type, 'dow': dow, "
        "'t': o / CAST(n AS DOUBLE) * "
        "ln(CAST(n AS DOUBLE) * o / CAST(r * c AS DOUBLE))} "
        "ORDER BY event_type, dow) AS ts FROM scored GROUP BY n) "
        "SELECT CAST(n AS BIGINT) AS n_events, "
        "round(list_reduce(list_transform(ts, z -> z.t), "
        "(acc, x) -> acc + x), 6) AS mi_nats FROM terms"
    ),
    "sample_systematic": (
        "WITH r AS (SELECT o_orderkey, o_orderdate, o_totalprice, "
        "row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS rk "
        "FROM orders) "
        "SELECT o_orderkey, o_orderdate, o_totalprice, rk FROM r "
        f"WHERE rk % {SYS_K} = 1"
    ),
    "dq_inclusion_dependency": (
        "WITH a AS (SELECT DISTINCT l_partkey AS k FROM lineitem), "
        "b AS (SELECT DISTINCT p_partkey AS k FROM part), "
        "s AS (SELECT (SELECT count(*) FROM a) AS n_a, "
        "(SELECT count(*) FROM b) AS n_b, "
        "(SELECT count(*) FROM a JOIN b USING (k)) AS n_both) "
        "SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b, "
        "CAST(n_both AS BIGINT) AS n_both, "
        "CAST(n_a - n_both AS BIGINT) AS orphans_a, "
        "CAST(n_b - n_both AS BIGINT) AS unreferenced_b, "
        "(2 * 1000 * n_both + n_a) // (2 * n_a) AS a_in_b_pm, "
        "(2 * 1000 * n_both + n_b) // (2 * n_b) AS b_in_a_pm FROM s"
    ),
}
