"""Group P — projection / filter / predicates (SURVEY §2B).

Reference analog: the body of a user map() function (ref op A1) — in
MapReduce every projection/filter is imperative Java inside the mapper.
Here they are Catalyst expressions: codegen'd, null-safe, and pushed down.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_tables


def q_project_expr(spark, sf_dir):
    """Arithmetic projection with alias (net price = extprice*(1-discount)).

    round(.,4) not 2: the product of two 2-decimal doubles has exactly 4
    decimal digits, so scale-4 rounding is the identity in both engines,
    while scale-2 hits decimal ties where Spark (HALF_UP) and DuckDB
    (HALF_EVEN) disagree (observed on 116/60000 rows).
    """
    load_tables(spark, sf_dir)
    li = spark.table("lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(li.l_extendedprice * (1 - li.l_discount), 4).alias("net_price"),
    )


def q_filter_range_pred(spark, sf_dir):
    """TPC-H Q6 shape: date window + discount band + quantity bound.

    100TB note: all three predicates push to the parquet scan; the agg is a
    partial+final hash agg (map-side combine, ref op A2) — shuffle carries
    one row per partition.
    """
    load_tables(spark, sf_dir)
    li = spark.table("lineitem")
    return (
        li.filter(
            (li.l_shipdate >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (li.l_shipdate < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (li.l_discount >= 0.05) & (li.l_discount <= 0.07)
            & (li.l_quantity < 24)
        )
        .agg(F.round(F.sum(li.l_extendedprice * li.l_discount), 2).alias("revenue"))
    )


def q_filter_in_like_null(spark, sf_dir):
    """IN-list + LIKE + explicit IS NULL arm (fixtures are null-free, the
    arm exercises null-handling without changing the result)."""
    load_tables(spark, sf_dir)
    p = spark.table("part")
    return p.filter(
        (p.p_brand.isin("Brand#1", "Brand#7", "Brand#13") & p.p_name.like("%key%"))
        | p.p_type.isNull()
    ).select("p_partkey", "p_name", "p_brand")


def q_case_coalesce_cast(spark, sf_dir):
    """CASE WHEN price bands, coalesce, cast chain int->double->string."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    return o.select(
        "o_orderkey",
        F.when(o.o_totalprice < 100000, "low")
        .when(o.o_totalprice < 300000, "mid")
        .otherwise("high")
        .alias("price_band"),
        F.coalesce(F.lit(None).cast("string"), o.o_orderstatus).alias("status_nn"),
        (o.o_orderkey % 1000).cast("double").cast("string").alias("key_dbl_str"),
    )


def q_sample_hash_bucket(spark, sf_dir):
    """Deterministic hash sampling (~25%): keep rows whose md5(key) starts
    with 0-3.  The training-data-pipeline sampling primitive — unlike
    TABLESAMPLE it is engine-independent, stable under re-runs and
    repartitioning, and pushes as a plain filter (no global pass)."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    bucket = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1)
    return (
        o.filter(bucket.isin("0", "1", "2", "3"))
        .agg(
            F.count("*").alias("n_sampled"),
            F.round(F.sum("o_totalprice"), 2).alias("sampled_price"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
    )


SAMPLE_PER_STRATUM = 10


def q_sample_stratified(spark, sf_dir):
    """Deterministic stratified sampling: the first 10 documents per
    language under a content-hash order (md5(text), doc_id tiebreak) —
    the per-stratum cap a training-data mixer applies per language or
    source.  Hash-ordering makes the sample pseudo-random yet exactly
    reproducible in any engine; one window shuffle keyed by the stratum.
    """
    from pyspark.sql import Window

    load_tables(spark, sf_dir)
    # complete-case: no stratum without a language, no content-hash
    # order without content (and the engines' default NULL sort orders
    # differ) — excluded on both sides
    d = spark.table("documents").filter(
        F.col("lang").isNotNull() & F.col("text").isNotNull()
    )
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("text").cast("binary")), "doc_id"
    )
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= SAMPLE_PER_STRATUM)
        .select("doc_id", "lang", "source", "rn")
    )


RESERVOIR_K = 200


def q_sample_reservoir(spark, sf_dir):
    """Deterministic fixed-size uniform sample: the 200 orders with the
    smallest md5(key) — a bottom-k (KMV) sketch, the reproducible stand-in
    for reservoir sampling (same marginal distribution, no RNG state).

    100TB note: Spark plans this as TakeOrderedAndProject — each partition
    keeps its local bottom-k and only k rows per partition reach the
    driver-side merge, so the global sort never materializes.  The same
    primitive gives fixed-size corpus samples for eval-set carving.
    """
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    h = F.md5(F.col("o_orderkey").cast("string")).alias("h")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice", h)
        .orderBy("h")
        .limit(RESERVOIR_K)
    )


QUERIES = {
    "project_expr": q_project_expr,
    "sample_reservoir": q_sample_reservoir,
    "filter_range_pred": q_filter_range_pred,
    "filter_in_like_null": q_filter_in_like_null,
    "case_coalesce_cast": q_case_coalesce_cast,
    "sample_hash_bucket": q_sample_hash_bucket,
    "sample_stratified": q_sample_stratified,
}

ORACLES = {
    "sample_reservoir": (
        "SELECT o_orderkey, o_custkey, o_totalprice, "
        "md5(CAST(o_orderkey AS VARCHAR)) AS h FROM orders "
        f"ORDER BY h LIMIT {RESERVOIR_K}"
    ),
    "sample_stratified": (
        "SELECT doc_id, lang, source, rn FROM ("
        "SELECT doc_id, lang, source, row_number() OVER ("
        "PARTITION BY lang ORDER BY md5(text), doc_id) AS rn "
        "FROM documents WHERE lang IS NOT NULL AND text IS NOT NULL) t "
        f"WHERE rn <= {SAMPLE_PER_STRATUM}"
    ),
    "sample_hash_bucket": (
        "SELECT count(*) AS n_sampled, "
        "round(sum(o_totalprice), 2) AS sampled_price, "
        "min(o_orderkey) AS min_key, max(o_orderkey) AS max_key "
        "FROM orders "
        "WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) "
        "IN ('0', '1', '2', '3')"
    ),
    "project_expr": (
        "SELECT l_orderkey, l_linenumber, "
        "round(l_extendedprice * (1 - l_discount), 4) AS net_price FROM lineitem"
    ),
    "filter_range_pred": (
        "SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue "
        "FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
        "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' "
        "AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24"
    ),
    "filter_in_like_null": (
        "SELECT p_partkey, p_name, p_brand FROM part "
        "WHERE (p_brand IN ('Brand#1','Brand#7','Brand#13') "
        "AND p_name LIKE '%key%') OR p_type IS NULL"
    ),
    "case_coalesce_cast": (
        "SELECT o_orderkey, "
        "CASE WHEN o_totalprice < 100000 THEN 'low' "
        "WHEN o_totalprice < 300000 THEN 'mid' ELSE 'high' END AS price_band, "
        "coalesce(CAST(NULL AS VARCHAR), o_orderstatus) AS status_nn, "
        "CAST(CAST(o_orderkey % 1000 AS DOUBLE) AS VARCHAR) AS key_dbl_str "
        "FROM orders"
    ),
}
