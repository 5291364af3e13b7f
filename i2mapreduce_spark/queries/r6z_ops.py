"""Round-6 additions, batch 26: a prefix-filtered similarity join (the
PPJoin-style plan that makes set-similarity joins feasible without the
all-shared-token blowup), an order-insensitive table checksum (the
cross-system migration-validation primitive that pairs with
inc_snapshot_diff), a base62 codec (URL-shortener ids, encode AND
decode), and overlapping document chunking (the RAG-ingestion window
chunker; dedup_paragraph's chunks are disjoint, retrieval chunks must
overlap).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..catalog import load_tables

#: similarity join threshold (Jaccard, as a ratio p/q = 4/5)
SIMJ_P, SIMJ_Q = 4, 5

#: chunker geometry (words)
CHUNK_SIZE = 64
CHUNK_STRIDE = 48

#: base62 alphabet and max digits (62^11 > 2^63)
B62 = "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
B62_DIGITS = 11

#: table checksum modulus (2^61 - 1, keeps the residue in BIGINT)
CKSUM_MOD = 2305843009213693951


def q_join_similarity_prefix_filter(spark, sf_dir):
    """Set-similarity self-join with PREFIX FILTERING (PPJoin family):
    find document pairs whose word-TRIGRAM sets have Jaccard >= 4/5.
    The naive candidate set — every pair sharing ANY trigram — explodes
    on common shingles; the prefix filter orders each doc's trigrams by
    ascending global frequency and probes only the first
    |s| - ceil(t|s|) + 1 RAREST of them, which provably cannot miss a
    qualifying pair (two sets with Jaccard >= t must collide inside
    their prefixes under any consistent global order).

    Plan: trigram df agg, per-doc rank window (co-partitioned by doc),
    candidate equi-join keyed by rare trigrams, exact intersection
    count on candidates only, INTEGER threshold test
    (J >= p/q  <=>  (p+q)*c >= p*(sa+sb)).  The oracle is the
    unfiltered all-shared-trigram join — correct at fixture scale and
    precisely the blowup the prefix plan avoids at 100 TB."""
    load_tables(spark, sf_dir)
    # complete-case: a missing document has no trigram set — and the
    # NULL-length sequence(1, greatest(NULL, 0)) = sequence(1, 0) is
    # Spark's DESCENDING [1, 0], which would fabricate '' trigrams
    d = spark.table("documents").filter(F.col("text").isNotNull())
    ws = F.split("text", " ")
    tri = (
        d.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, greatest(size(split(text, ' ')) - 2, 0)), "
                    "i -> concat_ws(' ', slice(split(text, ' '), i, 3)))"
                )
            ).alias("t"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    sizes = tri.groupBy("doc_id").agg(F.count(F.lit(1)).alias("s"))
    df = tri.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    wd = Window.partitionBy("doc_id").orderBy("df", "t")
    ranked = (
        tri.join(df, "t")
        .withColumn("rn", F.row_number().over(wd))
        .join(sizes, "doc_id")
    )
    # prefix_len = s - ceil(t*s) + 1, ceil(p*s/q) = (p*s + q - 1) div q
    prefix = ranked.filter(
        F.col("rn")
        <= F.col("s") - F.expr(f"({SIMJ_P} * s + {SIMJ_Q} - 1) div {SIMJ_Q}") + 1
    ).select("doc_id", "t")
    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), "t")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db")
        )
        .distinct()
    )
    inter = (
        cand.join(tri.alias("x"), F.col("da") == F.col("x.doc_id"))
        .join(
            tri.alias("y"),
            (F.col("db") == F.col("y.doc_id"))
            & (F.col("x.t") == F.col("y.t")),
        )
        .groupBy("da", "db")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    scored = (
        inter.join(sizes.withColumnRenamed("doc_id", "da"), "da")
        .withColumnRenamed("s", "sa")
        .join(sizes.withColumnRenamed("doc_id", "db"), "db")
        .withColumnRenamed("s", "sb")
    )
    return scored.filter(
        (SIMJ_P + SIMJ_Q) * F.col("c") >= SIMJ_P * (F.col("sa") + F.col("sb"))
    ).select(
        "da",
        "db",
        "c",
        "sa",
        "sb",
        F.expr(
            "(2 * 1000 * c + (sa + sb - c)) div (2 * (sa + sb - c))"
        ).alias("jaccard_pm"),
    )


def q_dq_table_checksum(spark, sf_dir):
    """Order-insensitive table CHECKSUM — the cross-system compare that
    validates a migration without moving the data twice: every row maps
    to a 60-bit integer (md5 of a canonical '|'-joined rendering, money
    as integer cents, dates as ISO strings), and the table fingerprint
    is the exact sum of those integers mod 2^61-1.  Commutative, so
    partitioning/row order is irrelevant; the sum runs in DECIMAL(38)
    (Spark) / HUGEINT (DuckDB) so it is EXACT at any row count, and
    only the bounded residue crosses engines."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    # canonical NULL rendering: the checksum must COVER missing values —
    # NULL price encodes as the empty field (see pipeline_shard_manifest)
    canon = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.coalesce(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .cast("string"),
            F.lit(""),
        ),
        F.date_format("o_orderdate", "yyyy-MM-dd"),
        F.col("o_orderpriority"),
    )
    h = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast(
        "decimal(38,0)"
    )
    return o.select(h.alias("h")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr(f"CAST(sum(h) % {CKSUM_MOD} AS BIGINT)").alias("checksum"),
    )


def _b62_encode(key: str, dialect: str) -> str:
    div = "div" if dialect == "spark" else "//"
    parts = []
    for i in range(B62_DIGITS - 1, -1, -1):
        parts.append(
            f"substr('{B62}', CAST((({key}) {div} {62 ** i}) % 62 AS INT) + 1, 1)"
        )
    joined = " || ".join(parts) if dialect == "duckdb" else None
    if dialect == "spark":
        joined = "concat(" + ", ".join(parts) + ")"
    return f"TRIM(LEADING '0' FROM {joined})"


def _b62_decode(code: str) -> str:
    """Shared-dialect decode: sum over reversed positions; instr/substr/
    reverse/length spell identically in Spark SQL and DuckDB."""
    terms = []
    for i in range(B62_DIGITS):
        terms.append(
            f"(CASE WHEN {i} < length({code}) THEN "
            f"(instr('{B62}', substr(reverse({code}), {i + 1}, 1)) - 1) "
            f"* {62 ** i} ELSE 0 END)"
        )
    return " + ".join(terms)


def q_fn_base62_codec(spark, sf_dir):
    """Base62 short-code ENCODE + DECODE for order keys — the
    URL-shortener primitive: compact, case-sensitive, k-sortable for
    fixed width.  Encode is an unrolled division chain into alphabet
    lookups with leading-zero-digit trim; decode reverses the string
    and folds positional values back with instr — pure string/integer
    builtins, identical semantics in both engines, and the roundtrip
    (decoded == o_orderkey) is asserted as an output column."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    enc = o.select(
        "o_orderkey",
        F.expr(_b62_encode("o_orderkey", "spark")).alias("b62"),
    )
    return enc.select(
        "o_orderkey",
        "b62",
        F.expr(_b62_decode("b62")).cast("long").alias("decoded"),
        (F.expr(_b62_decode("b62")) == F.col("o_orderkey")).alias(
            "roundtrip_ok"
        ),
    )


def q_pipeline_chunk_overlap(spark, sf_dir):
    """Overlapping sliding-window chunking — the RAG-ingestion splitter:
    each document becomes CHUNK_SIZE-word windows advancing by
    CHUNK_STRIDE (overlap = size - stride keeps sentences that straddle
    a boundary retrievable; dedup_paragraph's disjoint chunks cannot).
    Emits (doc_id, chunk_idx, start_word, n_words, chunk).  One
    generate + narrow maps, embarrassingly parallel over documents;
    chunk count is the closed form max(1, ceil((len-size)/stride)+1),
    evaluated with non-negative integer operands only."""
    load_tables(spark, sf_dir)
    d = spark.table("documents")
    n_chunks = (
        f"CASE WHEN size(split(text, ' ')) <= {CHUNK_SIZE} THEN 1 "
        f"ELSE (size(split(text, ' ')) - {CHUNK_SIZE} + {CHUNK_STRIDE} - 1) "
        f"div {CHUNK_STRIDE} + 1 END"
    )
    ch = d.select(
        "doc_id",
        F.explode(F.expr(f"sequence(0, {n_chunks} - 1)")).alias("chunk_idx"),
        F.split("text", " ").alias("ws"),
    )
    return ch.select(
        "doc_id",
        "chunk_idx",
        (F.col("chunk_idx") * CHUNK_STRIDE + 1).alias("start_word"),
        F.expr(
            f"size(slice(ws, chunk_idx * {CHUNK_STRIDE} + 1, {CHUNK_SIZE}))"
        ).alias("n_words"),
        F.expr(
            f"concat_ws(' ', slice(ws, chunk_idx * {CHUNK_STRIDE} + 1, "
            f"{CHUNK_SIZE}))"
        ).alias("chunk"),
    )


QUERIES = {
    "join_similarity_prefix_filter": q_join_similarity_prefix_filter,
    "dq_table_checksum": q_dq_table_checksum,
    "fn_base62_codec": q_fn_base62_codec,
    "pipeline_chunk_overlap": q_pipeline_chunk_overlap,
}

ORACLES = {
    "join_similarity_prefix_filter": (
        "WITH tri AS (SELECT DISTINCT doc_id, t FROM (SELECT doc_id, "
        "unnest(list_transform(range(1, "
        "greatest(len(string_split(text, ' ')) - 2, 0) + 1), "
        "i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS t "
        "FROM documents)), "
        "sizes AS (SELECT doc_id, count(*) AS s FROM tri GROUP BY 1), "
        "cand AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c "
        "FROM tri a JOIN tri b ON a.t = b.t AND a.doc_id < b.doc_id "
        "GROUP BY 1, 2), "
        "scored AS (SELECT da, db, c, sa.s AS sa, sb.s AS sb FROM cand "
        "JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db) "
        f"SELECT da, db, CAST(c AS BIGINT) AS c, sa, sb, "
        "(2 * 1000 * c + (sa + sb - c)) // (2 * (sa + sb - c)) "
        "AS jaccard_pm FROM scored "
        f"WHERE ({SIMJ_P} + {SIMJ_Q}) * c >= {SIMJ_P} * (sa + sb)"
    ),
    "dq_table_checksum": (
        "WITH h AS (SELECT ('0x' || substr(md5(o_orderkey::VARCHAR || '|' "
        "|| coalesce(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 "
        "AS BIGINT) AS VARCHAR), '') "
        "|| '|' || strftime(o_orderdate, '%Y-%m-%d') || '|' "
        "|| o_orderpriority), 1, 15))::BIGINT AS h FROM orders) "
        "SELECT CAST(count(*) AS BIGINT) AS n_rows, "
        f"CAST(sum(h) % {CKSUM_MOD} AS BIGINT) AS checksum FROM h"
    ),
    "fn_base62_codec": (
        "WITH enc AS (SELECT o_orderkey, "
        + _b62_encode("o_orderkey", "duckdb")
        + " AS b62 FROM orders) "
        "SELECT o_orderkey, b62, "
        "CAST(" + _b62_decode("b62") + " AS BIGINT) AS decoded, "
        "(" + _b62_decode("b62") + ") = o_orderkey AS roundtrip_ok "
        "FROM enc"
    ),
    "pipeline_chunk_overlap": (
        "WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws, "
        f"CASE WHEN len(string_split(text, ' ')) <= {CHUNK_SIZE} THEN 1 "
        f"ELSE (len(string_split(text, ' ')) - {CHUNK_SIZE} "
        f"+ {CHUNK_STRIDE} - 1) // {CHUNK_STRIDE} + 1 END AS nc "
        "FROM documents), "
        "ch AS (SELECT doc_id, CAST(i AS INT) AS chunk_idx, ws "
        "FROM d, unnest(range(nc)) AS t(i)) "
        "SELECT doc_id, chunk_idx, "
        f"CAST(chunk_idx * {CHUNK_STRIDE} + 1 AS INT) AS start_word, "
        f"CAST(len(ws[(chunk_idx * {CHUNK_STRIDE} + 1):"
        f"(chunk_idx * {CHUNK_STRIDE} + {CHUNK_SIZE})]) AS INT) AS n_words, "
        f"array_to_string(ws[(chunk_idx * {CHUNK_STRIDE} + 1):"
        f"(chunk_idx * {CHUNK_STRIDE} + {CHUNK_SIZE})], ' ') AS chunk "
        "FROM ch"
    ),
}
