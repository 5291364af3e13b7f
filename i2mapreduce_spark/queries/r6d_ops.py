"""Round-6 additions, batch 4: mergeable-summary operators (Bloom
filter fill, KMV bottom-k Jaccard), marketing-style decile lift, a
curriculum-staging pipeline pass, a power-of-two histogram, and a
hapax-legomena text profile.

Hash discipline: the sketch keys use the PORTABLE md5 bucket hash
(DuckDB ``md5_number_lower`` == Spark ``conv(substr(md5,..),16,10)``
little-endian — see r6_ops._md5_le), so even the *approximate*
estimates are bit-identical across engines and hash-checkable; every
ratio is either a half-up per-mille integer or one final double
division of exact integer operands.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_tables
from .r6_ops import _md5_le, _md5_le_sql

# =================================================================
# Group D — mergeable summaries
# =================================================================

BLOOM_M = 1024  #: bits per nation filter
BLOOM_K = 3     #: hash functions

KMV_K = 64      #: bottom-k sketch size


def q_agg_bloom_filter(spark, sf_dir):
    """Per-nation Bloom-filter build over supplier keys: k=3 portable
    md5 bucket positions in an m=1024-bit filter, reported as bits_set
    (the union of positions — a COUNT DISTINCT, i.e. the exact bitmap
    popcount), half-up per-mille fill, and the standard cardinality
    inversion est = −(m/k)·ln(1 − fill).  The filter is mergeable by
    construction (bit-OR == position-set union), which is what makes it
    a valid partial+final distributed summary at 100 TB; the estimate
    is one ln() over exact integers, so it hashes identically."""
    load_tables(spark, sf_dir)
    s = spark.table("supplier")
    key = F.col("s_suppkey").cast("string")
    pos = F.explode(
        F.array(
            *[
                (_md5_le(F.concat(key, F.lit(f"#{i}")), 4) % BLOOM_M).alias(
                    f"p{i}"
                )
                for i in range(BLOOM_K)
            ]
        )
    )
    exploded = s.select("s_nationkey", "s_suppkey", pos.alias("pos"))
    agg = exploded.groupBy("s_nationkey").agg(
        F.countDistinct("s_suppkey").alias("n_keys"),
        F.countDistinct("pos").alias("bits_set"),
    )
    fill_pm = F.expr(f"(2000 * bits_set + {BLOOM_M}) div {2 * BLOOM_M}")
    est = F.round(
        -(F.lit(BLOOM_M) / F.lit(BLOOM_K))
        * F.log(F.lit(1.0) - F.col("bits_set") / F.lit(float(BLOOM_M))),
        4,
    )
    return agg.select(
        "s_nationkey", "n_keys", "bits_set", fill_pm.alias("fill_pm"),
        est.alias("est_n"),
    )


def q_agg_kmv_jaccard(spark, sf_dir):
    """KMV (bottom-k minhash) Jaccard estimate between the click-user
    and purchase-user sets: hash every distinct user with the portable
    56-bit md5, keep the k=64 smallest hashes of the UNION (ties break
    on user id — a total order, so the sketch is deterministic), and
    estimate J = |sketch ∩ A ∩ B| / k.  The bottom-k survives as a
    distributed ORDER BY + LIMIT (TakeOrdered — per-partition top-k
    then a k-row merge, no global sort), and a bottom-k sketch is
    mergeable, which is the whole point at 100 TB.  Exact cohort sizes
    ride along for the error-vs-exact comparison."""
    load_tables(spark, sf_dir)
    e = spark.table("events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    flags = e.groupBy("user_id").agg(
        F.max((F.col("event_type") == "click").cast("int")).alias("in_a"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("in_b"),
    )
    hashed = flags.select(
        "user_id",
        "in_a",
        "in_b",
        _md5_le(F.col("user_id").cast("string"), 7).alias("h"),
    )
    sketch = hashed.orderBy("h", "user_id").limit(KMV_K)
    return sketch.agg(
        F.max(F.lit(KMV_K)).alias("k"),
        F.count(F.lit(1)).alias("sketch_n"),  # < k iff union smaller than k
        F.max("h").alias("kth_hash"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_both"),
        F.round(
            F.sum(F.col("in_a") * F.col("in_b"))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("jaccard_est"),
        # an empty union has no sketch and no estimate — emit no row
        # (oracle mirrors with HAVING)
    ).filter(F.col("sketch_n") > 0)


def q_agg_decile_lift(spark, sf_dir):
    """Customer-value decile lift table: customers ranked by lifetime
    spend (exact integer cents, ties → customer key), cut into 10 equal
    ranks with the integer rule decile = ((rank−1)·10) div n + 1, then
    per decile the customer count, revenue, revenue share, and lift
    (share ÷ the 10% a uniform decile would hold).  The campaign-
    targeting primitive.  Ranking uses the distributed chunked-offset
    row_number (operators/ranking.py) — customers scale with SF, so no
    single-partition window; share/lift are single divisions of exact
    integer cents."""
    from ..operators.ranking import global_row_number

    load_tables(spark, sf_dir)
    o = spark.table("orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
        ).alias("cents")
    )
    ranked = global_row_number(
        spend.withColumn("neg", -F.col("cents")), ["neg", "o_custkey"]
    )
    n_tot = ranked.agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("tot")
    )
    dec = ranked.crossJoin(F.broadcast(n_tot)).select(
        F.expr("((i - 1) * 10) div n + 1").alias("decile"),
        "cents",
        "tot",
    )
    g = dec.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.sum("cents").alias("dc"),
        F.max("tot").alias("tot"),
    )
    share = F.col("dc") / F.col("tot").cast("double")
    return g.select(
        "decile",
        "n_cust",
        (F.col("dc") / 100.0).alias("revenue"),
        F.round(share, 6).alias("rev_share"),
        F.round(share * 10, 4).alias("lift"),
    )


def q_agg_log_histogram(spark, sf_dir):
    """Power-of-two (log2) histogram of order totals in integer cents:
    bucket = bit-length − 1 via length(bin(x)) — pure string/bit
    arithmetic, NO floating log, so bucket edges can never flap on
    values sitting exactly at a power of two.  The long-tail profile
    (latencies, sizes, revenues) every monitoring system draws; one
    partial+final agg over the fact."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    b = o.select(
        cents.alias("cents"),
        (F.length(F.bin(cents)) - 1).alias("bucket"),
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("cents").alias("min_cents"),
        F.max("cents").alias("max_cents"),
    )


# =================================================================
# Group L — curriculum staging + hapax profile
# =================================================================

CURR_STAGES = 4


def q_pipeline_curriculum(spark, sf_dir):
    """Curriculum staging: order the corpus by example difficulty
    (token count here — short to long, the standard length curriculum)
    and cut it into 4 equal-rank stages with the same integer quartile
    rule as decile lift; emit each stage's doc count, token mass and
    length range.  Ordering uses the distributed chunked-offset
    row_number — the corpus scales, the 4-row output does not."""
    from ..operators.ranking import global_row_number

    load_tables(spark, sf_dir)
    # complete-case: a missing document has no difficulty to rank (the
    # engines' default NULL sort orders differ) — excluded on both sides
    d = spark.table("documents").filter(F.col("text").isNotNull())
    toks = d.select(
        "doc_id",
        F.size(
            F.filter(F.split(F.col("text"), " "), lambda w: w != "")
        ).alias("tok_cnt"),
    )
    ranked = global_row_number(toks, ["tok_cnt", "doc_id"])
    n = ranked.agg(F.count(F.lit(1)).alias("n"))
    staged = ranked.crossJoin(F.broadcast(n)).select(
        F.expr(f"((i - 1) * {CURR_STAGES}) div n + 1").alias("stage"),
        "tok_cnt",
    )
    return staged.groupBy("stage").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tok_cnt").alias("total_tokens"),
        F.min("tok_cnt").alias("min_tokens"),
        F.max("tok_cnt").alias("max_tokens"),
    )


def q_text_hapax_ratio(spark, sf_dir):
    """Hapax-legomena profile per document: token count, distinct-type
    count, hapax count (types occurring exactly once in that doc) and
    the half-up per-mille hapax/type ratio — the lexical-novelty signal
    complementing TTR.  Two cheap aggs (doc×type, then doc), all
    integer."""
    load_tables(spark, sf_dir)
    d = spark.table("documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("w")
    ).filter(F.col("w") != "")
    types = toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("cnt"))
    per_doc = types.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum((F.col("cnt") == 1).cast("long")).alias("n_hapax"),
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "n_types",
        "n_hapax",
        F.expr("(2000 * n_hapax + n_types) div (2 * n_types)").alias(
            "hapax_pm"
        ),
    )


QUERIES = {
    "agg_bloom_filter": q_agg_bloom_filter,
    "agg_kmv_jaccard": q_agg_kmv_jaccard,
    "agg_decile_lift": q_agg_decile_lift,
    "agg_log_histogram": q_agg_log_histogram,
    "pipeline_curriculum": q_pipeline_curriculum,
    "text_hapax_ratio": q_text_hapax_ratio,
}

_BLOOM_POS_SQL = " UNION ALL ".join(
    f"SELECT s_nationkey, s_suppkey, "
    + _md5_le_sql(f"CAST(s_suppkey AS VARCHAR) || '#{i}'", 4)
    + f" % {BLOOM_M} AS pos FROM supplier"
    for i in range(BLOOM_K)
)

ORACLES = {
    "agg_bloom_filter": (
        f"WITH e AS ({_BLOOM_POS_SQL}), "
        "agg AS (SELECT s_nationkey, count(DISTINCT s_suppkey) AS n_keys, "
        "count(DISTINCT pos) AS bits_set FROM e GROUP BY 1) "
        "SELECT s_nationkey, n_keys, bits_set, "
        f"CAST((2000 * bits_set + {BLOOM_M}) // {2 * BLOOM_M} AS BIGINT) AS fill_pm, "
        f"round(-({BLOOM_M} / CAST({BLOOM_K} AS DOUBLE)) * "
        f"ln(1.0 - bits_set / {float(BLOOM_M)}), 4) AS est_n FROM agg"
    ),
    "agg_kmv_jaccard": (
        "WITH flags AS (SELECT user_id, "
        "max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS in_a, "
        "max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS in_b "
        "FROM events WHERE event_type IN ('click', 'purchase') GROUP BY 1), "
        "hashed AS (SELECT user_id, in_a, in_b, "
        + _md5_le_sql("CAST(user_id AS VARCHAR)", 7)
        + " AS h FROM flags), "
        "sketch AS (SELECT * FROM hashed ORDER BY h, user_id LIMIT "
        f"{KMV_K}) "
        f"SELECT {KMV_K} AS k, count(*) AS sketch_n, "
        "CAST(max(h) AS BIGINT) AS kth_hash, "
        "CAST(sum(in_a * in_b) AS BIGINT) AS n_both, "
        "round(sum(in_a * in_b) / CAST(count(*) AS DOUBLE), 6) AS jaccard_est "
        "FROM sketch HAVING count(*) > 0"
    ),
    "agg_decile_lift": (
        "WITH spend AS (SELECT o_custkey, "
        "sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS cents "
        "FROM orders GROUP BY 1), "
        "ranked AS (SELECT cents, "
        "row_number() OVER (ORDER BY -cents, o_custkey) AS i FROM spend), "
        "nt AS (SELECT count(*) AS n, sum(cents) AS tot FROM ranked), "
        "dec AS (SELECT ((i - 1) * 10) // n + 1 AS decile, cents, tot "
        "FROM ranked, nt) "
        "SELECT CAST(decile AS BIGINT) AS decile, count(*) AS n_cust, "
        "CAST(sum(cents) AS BIGINT) / 100.0 AS revenue, "
        "round(CAST(sum(cents) AS BIGINT) / CAST(max(tot) AS DOUBLE), 6) AS rev_share, "
        "round(CAST(sum(cents) AS BIGINT) / CAST(max(tot) AS DOUBLE) * 10, 4) AS lift "
        "FROM dec GROUP BY 1"
    ),
    "agg_log_histogram": (
        "WITH b AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 "
        "AS BIGINT) AS cents FROM orders) "
        "SELECT CAST(length(bin(cents)) - 1 AS BIGINT) AS bucket, "
        "count(*) AS n_orders, min(cents) AS min_cents, "
        "max(cents) AS max_cents FROM b GROUP BY 1"
    ),
    "pipeline_curriculum": (
        "WITH toks AS (SELECT doc_id, "
        "len(list_filter(string_split(text, ' '), w -> w <> '')) AS tok_cnt "
        "FROM documents WHERE text IS NOT NULL), "
        "ranked AS (SELECT tok_cnt, "
        "row_number() OVER (ORDER BY tok_cnt, doc_id) AS i FROM toks), "
        "n AS (SELECT count(*) AS n FROM ranked), "
        f"staged AS (SELECT ((i - 1) * {CURR_STAGES}) // n + 1 AS stage, "
        "tok_cnt FROM ranked, n) "
        "SELECT CAST(stage AS BIGINT) AS stage, count(*) AS n_docs, "
        "CAST(sum(tok_cnt) AS BIGINT) AS total_tokens, "
        "CAST(min(tok_cnt) AS BIGINT) AS min_tokens, "
        "CAST(max(tok_cnt) AS BIGINT) AS max_tokens FROM staged GROUP BY 1"
    ),
    "text_hapax_ratio": (
        "WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w "
        "FROM documents), "
        "types AS (SELECT doc_id, w, count(*) AS cnt FROM toks "
        "WHERE w <> '' GROUP BY 1, 2), "
        "per_doc AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens, "
        "count(*) AS n_types, "
        "CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax "
        "FROM types GROUP BY 1) "
        "SELECT doc_id, n_tokens, n_types, n_hapax, "
        "CAST((2000 * n_hapax + n_types) // (2 * n_types) AS BIGINT) AS hapax_pm "
        "FROM per_doc"
    ),
}
