"""Round-6 additions, batch 25: CUPED variance reduction (the
experimentation-platform adjustment every A/B engine ships), snowflake
ID encode/decode (the bit-packed distributed-id primitive), the
new-vs-returning monthly cohort split (core growth reporting), and LSH
bucket purity (the index-quality eval metric for the similarity
stack).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_tables

#: snowflake layout: 41-bit ms timestamp | 10-bit worker | 12-bit seq
SNOW_EPOCH_MS = 1_288_834_974_657  # the classic custom epoch

#: bucket purity: sign bits of the first k dimensions
PURITY_BITS = 8


def q_agg_cuped_adjustment(spark, sf_dir):
    """CUPED-adjusted experiment readout: treat user_id parity as the
    variant, odd-calendar-day spend as the experiment metric Y and
    even-day spend as the pre-period covariate X; report each variant's
    raw and CUPED-adjusted mean, Y_adj = Y - theta*(X - mean(X)) with
    theta = cov(X,Y)/var(X) pooled across users — the industry-standard
    variance-reduction every experimentation platform applies before
    the t-test.

    Exactness: per-user X/Y are exact integer cents; theta's numerator
    and denominator are the exact integer moment combinations
    n*Sxy - Sx*Sy and n*Sxx - Sx^2 (agg_linreg identity), so both
    engines feed identical integers into the final double expression.
    Two aggs (user roll-up, then variant roll-up via fixed-shape
    moments) — embarrassingly parallel over users."""
    load_tables(spark, sf_dir)
    e = spark.table("events")
    per_user = e.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.expr("datediff(CAST(ts AS DATE), DATE '2024-01-01') % 2")
                == 0,
                F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"),
            ).otherwise(F.lit(0))
        ).alias("x"),
        F.sum(
            F.when(
                F.expr("datediff(CAST(ts AS DATE), DATE '2024-01-01') % 2")
                == 1,
                F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"),
            ).otherwise(F.lit(0))
        ).alias("y"),
    )
    # cross-moments in DECIMAL(38,0) (r10 extreme-magnitude sweep):
    # per-user cents² passes 1e24 at hostile value scales
    mom = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("x")).alias("sxx"),
    )
    per_variant = per_user.groupBy(
        (F.col("user_id") % 2).alias("variant")
    ).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("x").alias("vx"),
        F.sum("y").alias("vy"),
    )
    j = per_variant.crossJoin(F.broadcast(mom))
    # try_divide: with a single user the covariate variance is 0 and
    # theta is undefined — NULL on both engines (DuckDB x/0 is NULL)
    sxD = F.col("sx").cast("decimal(19,0)")
    theta = F.try_divide(
        (F.col("n") * F.col("sxy") - sxD * F.col("sy").cast("decimal(19,0)")).cast("double"),
        (F.col("n") * F.col("sxx") - sxD * sxD).cast("double"),
    )
    mean_y = F.col("vy") / F.col("n_users").cast("double")
    mean_x = F.col("vx") / F.col("n_users").cast("double")
    gmean_x = F.col("sx") / F.col("n").cast("double")
    return j.select(
        "variant",
        "n_users",
        F.round(mean_y / 100.0, 6).alias("raw_mean"),
        F.round(
            (mean_y - theta * (mean_x - gmean_x)) / 100.0, 6
        ).alias("cuped_mean"),
        F.round(theta, 6).alias("theta"),
    )


def q_fn_snowflake_id(spark, sf_dir):
    """Snowflake-style distributed ID encode + decode: pack
    (41-bit ms timestamp | 10-bit worker | 12-bit sequence) into one
    BIGINT and unpack it back — the k-sortable id layout id generators
    use so ORDER BY id == ORDER BY creation time across workers.  IDs
    are synthesized deterministically from the order key, then decoded
    with pure shift/mask arithmetic identical in both engines; the
    decoded timestamp re-emerges via epoch-millis addition."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    ms = "(o_orderkey * 1000 + o_orderkey % 997)"
    worker = "(o_orderkey % 32)"
    seq = "(o_orderkey % 4096)"
    sid = (
        f"shiftleft({ms}, 22) + shiftleft({worker}, 12) + {seq}"
    )
    enc = o.select(
        "o_orderkey", F.expr(sid).cast("long").alias("snowflake_id")
    )
    return enc.select(
        "o_orderkey",
        "snowflake_id",
        F.expr("shiftright(snowflake_id, 22)").alias("dec_ms"),
        F.expr("shiftright(snowflake_id, 12) & 1023").alias("dec_worker"),
        F.expr("snowflake_id & 4095").alias("dec_seq"),
        F.expr(
            f"timestamp_millis({SNOW_EPOCH_MS} + shiftright(snowflake_id, 22))"
        )
        .cast("timestamp_ntz")
        .alias("dec_ts"),
    )


def q_agg_new_vs_returning(spark, sf_dir):
    """New-vs-returning monthly order split — the growth report every
    commerce dashboard leads with: per month, orders placed by
    first-time customers (order date equals the customer's first-ever
    order date) vs returning ones, plus the new share.  One
    co-partitioned window min per customer, one partial+final month
    agg; the share is a half-up per-mille integer quotient."""
    from pyspark.sql import Window

    load_tables(spark, sf_dir)
    o = spark.table("orders")
    w = Window.partitionBy("o_custkey")
    flagged = o.select(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        (F.col("o_orderdate") == F.min("o_orderdate").over(w)).alias(
            "is_new"
        ),
    )
    g = flagged.groupBy("month").agg(
        F.sum(F.col("is_new").cast("long")).alias("n_new"),
        F.sum((~F.col("is_new")).cast("long")).alias("n_returning"),
    )
    return g.select(
        "month",
        "n_new",
        "n_returning",
        F.expr(
            "(2 * 1000 * n_new + (n_new + n_returning)) "
            "div (2 * (n_new + n_returning))"
        ).alias("new_share_pm"),
    )


def q_sim_bucket_purity(spark, sf_dir):
    """LSH bucket PURITY against ground-truth labels — the index-quality
    eval metric for the similarity stack: bucket every vector by the
    sign bits of its first k dimensions (the cheapest hyperplane
    signature), then purity = sum over buckets of the majority-label
    count / corpus size.  High purity = the signature preserves label
    locality; ~1/n_labels = it does not.  Exact integer counts end to
    end; sign tests read the same parquet floats in both engines."""
    load_tables(spark, sf_dir)
    emb = spark.table("embeddings")
    bucket = F.expr(
        " + ".join(
            f"CASE WHEN element_at(embedding, {i + 1}) > 0 "
            f"THEN {1 << i} ELSE 0 END"
            for i in range(PURITY_BITS)
        )
    )
    bl = emb.select(bucket.alias("bucket"), "label")
    counts = bl.groupBy("bucket", "label").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_bucket = counts.groupBy("bucket").agg(
        F.max("c").alias("maj"), F.sum("c").alias("tot")
    )
    return per_bucket.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum("tot").alias("n_vecs"),
        F.sum("maj").alias("majority_sum"),
        F.expr(
            "(2 * 1000 * sum(maj) + sum(tot)) div (2 * sum(tot))"
        ).alias("purity_pm"),
    )


QUERIES = {
    "agg_cuped_adjustment": q_agg_cuped_adjustment,
    "fn_snowflake_id": q_fn_snowflake_id,
    "agg_new_vs_returning": q_agg_new_vs_returning,
    "sim_bucket_purity": q_sim_bucket_purity,
}

ORACLES = {
    "agg_cuped_adjustment": (
        "WITH pu AS (SELECT user_id, "
        "sum(CASE WHEN date_diff('day', DATE '2024-01-01', "
        "CAST(ts AS DATE)) % 2 = 0 "
        "THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) "
        "ELSE 0 END) AS x, "
        "sum(CASE WHEN date_diff('day', DATE '2024-01-01', "
        "CAST(ts AS DATE)) % 2 = 1 "
        "THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) "
        "ELSE 0 END) AS y FROM events GROUP BY 1), "
        "mom AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy, "
        "sum(x::HUGEINT * y) AS sxy, sum(x::HUGEINT * x) AS sxx FROM pu), "
        "pv AS (SELECT user_id % 2 AS variant, count(*) AS n_users, "
        "sum(x) AS vx, sum(y) AS vy FROM pu GROUP BY 1) "
        "SELECT variant, CAST(n_users AS BIGINT) AS n_users, "
        "round(vy / CAST(n_users AS DOUBLE) / 100.0, 6) AS raw_mean, "
        "round((vy / CAST(n_users AS DOUBLE) "
        "- CAST(n * sxy - sx * sy AS DOUBLE) "
        "/ CAST(n * sxx - sx * sx AS DOUBLE) "
        "* (vx / CAST(n_users AS DOUBLE) - sx / CAST(n AS DOUBLE))) "
        "/ 100.0, 6) AS cuped_mean, "
        "round(CAST(n * sxy - sx * sy AS DOUBLE) "
        "/ CAST(n * sxx - sx * sx AS DOUBLE), 6) AS theta "
        "FROM pv, mom"
    ),
    "fn_snowflake_id": (
        "WITH enc AS (SELECT o_orderkey, "
        "((o_orderkey * 1000 + o_orderkey % 997) << 22) "
        "+ ((o_orderkey % 32) << 12) + (o_orderkey % 4096) "
        "AS snowflake_id FROM orders) "
        "SELECT o_orderkey, snowflake_id, "
        "snowflake_id >> 22 AS dec_ms, "
        "(snowflake_id >> 12) & 1023 AS dec_worker, "
        "snowflake_id & 4095 AS dec_seq, "
        f"epoch_ms({SNOW_EPOCH_MS} + (snowflake_id >> 22)) AS dec_ts "
        "FROM enc"
    ),
    "agg_new_vs_returning": (
        "WITH f AS (SELECT strftime(o_orderdate, '%Y-%m') AS month, "
        "o_orderdate = min(o_orderdate) OVER (PARTITION BY o_custkey) "
        "AS is_new FROM orders), "
        "g AS (SELECT month, "
        "CAST(sum(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT) AS n_new, "
        "CAST(sum(CASE WHEN is_new THEN 0 ELSE 1 END) AS BIGINT) "
        "AS n_returning FROM f GROUP BY 1) "
        "SELECT month, n_new, n_returning, "
        "(2 * 1000 * n_new + (n_new + n_returning)) "
        "// (2 * (n_new + n_returning)) AS new_share_pm FROM g"
    ),
    "sim_bucket_purity": (
        "WITH bl AS (SELECT "
        + " + ".join(
            f"CASE WHEN embedding[{i + 1}] > 0 THEN {1 << i} ELSE 0 END"
            for i in range(PURITY_BITS)
        )
        + " AS bucket, label FROM embeddings), "
        "c AS (SELECT bucket, label, count(*) AS c FROM bl GROUP BY 1, 2), "
        "pb AS (SELECT bucket, max(c) AS maj, sum(c) AS tot "
        "FROM c GROUP BY 1) "
        "SELECT CAST(count(*) AS BIGINT) AS n_buckets, "
        "CAST(sum(tot) AS BIGINT) AS n_vecs, "
        "CAST(sum(maj) AS BIGINT) AS majority_sum, "
        "CAST((2 * 1000 * sum(maj) + sum(tot)) // (2 * sum(tot)) "
        "AS BIGINT) AS purity_pm FROM pb"
    ),
}
