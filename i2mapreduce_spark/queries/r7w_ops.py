"""Round-6 additions, batch 49: Kendall's tau-b (the concordance rank
correlation completing the Spearman/Pearson family, all integers), the
basket-overlap matrix (entity-level set similarity between nations'
purchased-part sets), and shard-balance entropy (is the hash
partitioner's load actually uniform — the companion to
fn_hash_avalanche at the partition grain).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_tables

#: shard count for the balance audit
SB_SHARDS = 16


def q_agg_kendall_tau(spark, sf_dir):
    """KENDALL'S TAU-B between daily order count and daily revenue:
    concordant minus discordant pairs over the tie-adjusted pair count
    — the third rank-correlation (Pearson: agg_corr_covar, Spearman:
    agg_spearman_corr), preferred when ties matter because its tie
    treatment is exact, not averaged.

    Every quantity is an exact integer on the bounded ~2,406-day grain:
    C, D and the tie counts come from ONE pairwise self-join (bounded
    ~2.9M pairs at any SF) and tau-b = (C - D) / sqrt((n0 - n1)(n0 -
    n2)) is a single fixed-shape double of five exact BIGINTs."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    # per-row cents BEFORE the sum (repo discipline, cf. r7b/r7d): long
    # summation is exact and engine-order-independent, unlike summing
    # doubles then casting the total
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("x"),
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
        ).alias("y"),
    )
    p = (
        daily.alias("a")
        .join(daily.alias("b"), F.col("a.day") < F.col("b.day"))
        .select(
            (F.col("b.x") - F.col("a.x")).alias("dx"),
            (F.col("b.y") - F.col("a.y")).alias("dy"),
        )
    )
    g = p.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(
            (
                ((F.col("dx") > 0) & (F.col("dy") > 0))
                | ((F.col("dx") < 0) & (F.col("dy") < 0))
            ).cast("long")
        ).alias("c"),
        F.sum(
            (
                ((F.col("dx") > 0) & (F.col("dy") < 0))
                | ((F.col("dx") < 0) & (F.col("dy") > 0))
            ).cast("long")
        ).alias("d"),
        F.sum(((F.col("dx") == 0) & (F.col("dy") != 0)).cast("long")).alias(
            "tx"
        ),
        F.sum(((F.col("dy") == 0) & (F.col("dx") != 0)).cast("long")).alias(
            "ty"
        ),
        F.sum(((F.col("dx") == 0) & (F.col("dy") == 0)).cast("long")).alias(
            "txy"
        ),
    )
    num = (F.col("c") - F.col("d")).cast("double")
    den = F.sqrt(
        (F.col("n0") - F.col("tx") - F.col("txy")).cast("double")
        * (F.col("n0") - F.col("ty") - F.col("txy")).cast("double")
    )
    return g.select(
        "n0",
        "c",
        "d",
        F.round(num / den, 6).alias("kendall_tau_b"),
    )


def q_join_basket_overlap(spark, sf_dir):
    """BASKET-OVERLAP matrix: for every pair of nations, the overlap
    coefficient |A ∩ B| / min(|A|, |B|) of their customers' purchased-
    part sets — entity-level set similarity (which markets buy the same
    catalog), the 25x25 bounded cousin of the document-level similarity
    joins.  Part sets come from one distinct projection; intersections
    from ONE self-join keyed by part (co-partitioned); the coefficient
    is a half-up per-mille integer quotient."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem")
    o = spark.table("orders")
    c = spark.table("customer")
    n = spark.table("nation")
    np = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "l_partkey")
        .distinct()
    )
    sizes = np.groupBy("n_name").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        np.alias("a")
        .join(
            np.alias("b"),
            (F.col("a.l_partkey") == F.col("b.l_partkey"))
            & (F.col("a.n_name") < F.col("b.n_name")),
        )
        .groupBy(
            F.col("a.n_name").alias("na"), F.col("b.n_name").alias("nb")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    j = (
        inter.join(
            F.broadcast(sizes.withColumnRenamed("n_name", "na")), "na"
        )
        .withColumnRenamed("sz", "sa")
        .join(F.broadcast(sizes.withColumnRenamed("n_name", "nb")), "nb")
        .withColumnRenamed("sz", "sb")
    )
    return j.select(
        "na",
        "nb",
        "inter",
        "sa",
        "sb",
        F.expr(
            "(2 * 1000 * inter + least(sa, sb)) div (2 * least(sa, sb))"
        ).alias("overlap_pm"),
    )


def q_dq_shard_balance(spark, sf_dir):
    """SHARD-BALANCE entropy: the normalized Shannon entropy of the
    md5-shard size distribution — 1000 per-mille means perfectly
    uniform load, lower means the partitioner skews (the partition-
    grain companion to fn_hash_avalanche's bit-grain audit).  Shares
    quantize to exact per-million integers BEFORE the bounded 16-term
    entropy fold (sorted by shard id), so both engines stream identical
    doubles into the logs."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    shards = o.groupBy(
        (
            F.conv(
                F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 4),
                16,
                10,
            ).cast("long")
            % SB_SHARDS
        ).alias("shard")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = shards.agg(F.sum("n").alias("t"), F.count(F.lit(1)).alias("k"))
    q = shards.crossJoin(F.broadcast(tot)).select(
        "shard",
        "k",
        F.expr("(2 * 1000000 * n + t) div (2 * t)").alias("p6"),
    )
    arr = q.groupBy("k").agg(
        F.array_sort(F.collect_list(F.struct("shard", "p6"))).alias("a")
    )
    h = F.expr(
        "aggregate(a, cast(0.0 as double), (acc, x) -> "
        "acc + CASE WHEN x.p6 > 0 THEN "
        "-(x.p6 / 1e6) * ln(x.p6 / 1e6) ELSE 0.0 END)"
    )
    return arr.select(
        F.col("k").alias("n_shards"),
        F.round(h, 6).alias("entropy_nats"),
        # floor, not div: Spark's div rejects DOUBLE operands; floor of
        # the identical double is engine-identical
        # try_divide: a single occupied shard (k = 1, ln k = 0) has no
        # balance to normalize — NULL on both engines (DuckDB x/0 NULL)
        F.expr(
            "CAST(FLOOR(try_divide(2 * 1000 * aggregate(a, "
            "cast(0.0 as double), "
            "(acc, x) -> acc + CASE WHEN x.p6 > 0 THEN "
            "-(x.p6 / 1e6) * ln(x.p6 / 1e6) ELSE 0.0 END) "
            "+ ln(CAST(k AS DOUBLE)), 2 * ln(CAST(k AS DOUBLE)))) "
            "AS BIGINT)"
        ).alias("balance_pm"),
    )


QUERIES = {
    "agg_kendall_tau": q_agg_kendall_tau,
    "join_basket_overlap": q_join_basket_overlap,
    "dq_shard_balance": q_dq_shard_balance,
}

ORACLES = {
    "agg_kendall_tau": (
        "WITH daily AS (SELECT o_orderdate AS day, count(*) AS x, "
        "sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) "
        "AS y FROM orders GROUP BY 1), "
        "p AS (SELECT b.x - a.x AS dx, b.y - a.y AS dy FROM daily a "
        "JOIN daily b ON a.day < b.day), "
        "g AS (SELECT count(*) AS n0, "
        "CAST(sum(CASE WHEN (dx > 0 AND dy > 0) OR (dx < 0 AND dy < 0) "
        "THEN 1 ELSE 0 END) AS BIGINT) AS c, "
        "CAST(sum(CASE WHEN (dx > 0 AND dy < 0) OR (dx < 0 AND dy > 0) "
        "THEN 1 ELSE 0 END) AS BIGINT) AS d, "
        "CAST(sum(CASE WHEN dx = 0 AND dy <> 0 THEN 1 ELSE 0 END) "
        "AS BIGINT) AS tx, "
        "CAST(sum(CASE WHEN dy = 0 AND dx <> 0 THEN 1 ELSE 0 END) "
        "AS BIGINT) AS ty, "
        "CAST(sum(CASE WHEN dx = 0 AND dy = 0 THEN 1 ELSE 0 END) "
        "AS BIGINT) AS txy FROM p) "
        "SELECT CAST(n0 AS BIGINT) AS n0, c, d, "
        "round(CAST(c - d AS DOUBLE) / sqrt("
        "CAST(n0 - tx - txy AS DOUBLE) "
        "* CAST(n0 - ty - txy AS DOUBLE)), 6) AS kendall_tau_b FROM g"
    ),
    "join_basket_overlap": (
        "WITH np AS (SELECT DISTINCT n_name, l_partkey FROM lineitem "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey), "
        "sizes AS (SELECT n_name, count(*) AS sz FROM np GROUP BY 1), "
        "inter AS (SELECT a.n_name AS na, b.n_name AS nb, "
        "count(*) AS inter FROM np a JOIN np b "
        "ON a.l_partkey = b.l_partkey AND a.n_name < b.n_name "
        "GROUP BY 1, 2) "
        "SELECT na, nb, CAST(inter AS BIGINT) AS inter, "
        "CAST(sa.sz AS BIGINT) AS sa, CAST(sb.sz AS BIGINT) AS sb, "
        "CAST((2 * 1000 * inter + least(sa.sz, sb.sz)) "
        "// (2 * least(sa.sz, sb.sz)) AS BIGINT) AS overlap_pm "
        "FROM inter JOIN sizes sa ON sa.n_name = na "
        "JOIN sizes sb ON sb.n_name = nb"
    ),
    "dq_shard_balance": (
        "WITH shards AS (SELECT "
        "('0x' || substr(md5(o_orderkey::VARCHAR), 1, 4))::BIGINT "
        f"% {SB_SHARDS} AS shard, count(*) AS n FROM orders GROUP BY 1), "
        "tot AS (SELECT CAST(sum(n) AS BIGINT) AS t, count(*) AS k "
        "FROM shards), "
        "q AS (SELECT shard, k, (2 * 1000000 * n + t) // (2 * t) AS p6 "
        "FROM shards, tot), "
        "arr AS (SELECT k, list({'shard': shard, 'p6': p6} "
        "ORDER BY shard) AS a FROM q GROUP BY 1), "
        "h AS (SELECT k, list_reduce(list_prepend(0.0, "
        "list_transform(a, x -> CASE WHEN x.p6 > 0 THEN "
        "-(x.p6 / 1e6) * ln(x.p6 / 1e6) ELSE 0.0 END)), "
        "(acc, v) -> acc + v) AS ent FROM arr) "
        "SELECT CAST(k AS BIGINT) AS n_shards, "
        "round(ent, 6) AS entropy_nats, "
        "CAST(FLOOR((2 * 1000 * ent + ln(CAST(k AS DOUBLE))) "
        "/ (2 * ln(CAST(k AS DOUBLE)))) AS BIGINT) AS balance_pm FROM h"
    ),
}
