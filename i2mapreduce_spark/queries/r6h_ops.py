"""Round-6 additions, batch 8: binary-file ingest (the multimodal
opaque-bytes source path) and the Luhn checksum validator.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ..catalog import load_tables
from .scans import _scratch_dir

BINF_N = 50  #: files materialized for the binaryFile scan


def q_source_binary_files(spark, sf_dir):
    """Opaque binary ingest via `spark.read.format("binaryFile")` — the
    source path every multimodal (image/audio/video) pipeline starts
    from: bytes land as one `binary` column plus path/length metadata,
    no decode attempted at scan time.  The fixture materializes 50
    documents as standalone .bin files (content = utf-8 text bytes),
    scans them back, and emits (file name, byte length, md5 of the
    BYTES).  Hash-checked: the oracle derives the same triple from the
    documents table itself, so any byte corruption in the write-scan
    path flips the md5.  At 100 TB this scan partitions by file and
    never materializes more than a partition of blobs at once."""
    load_tables(spark, sf_dir)
    # NULL text: no blob to materialize (the oracle filters identically)
    d = spark.table("documents").filter(
        (F.col("doc_id") < BINF_N) & F.col("text").isNotNull()
    )
    root = _scratch_dir("i2mr_binf_") + "/blobs"
    os.makedirs(root, exist_ok=True)
    for r in d.select("doc_id", "text").collect():  # bounded: 50 files
        with open(f"{root}/doc_{r['doc_id']:05d}.bin", "wb") as f:
            f.write(r["text"].encode("utf-8"))
    scanned = spark.read.format("binaryFile").load(root)
    return scanned.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("fname"),
        F.col("length").alias("n_bytes"),
        F.md5(F.col("content")).alias("content_md5"),
    )


def q_fn_luhn_check(spark, sf_dir):
    """Luhn checksum validation of 12-digit account strings derived
    from order keys — the checksum-column DQ primitive (card/IMEI/SIREN
    formats).  The digit fold is a JVM-side `aggregate` over a
    `sequence` (doubling every second digit from the right, −9 above
    9); no UDF, no python.  Output: per-order account, Luhn sum and
    validity verdict."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    acct = F.lpad(F.col("o_orderkey").cast("string"), 12, "0")
    withacct = o.select("o_orderkey", acct.alias("acct"))
    luhn = F.expr(
        "aggregate(sequence(0, 11), 0, (acc, i) -> acc + "
        "CASE WHEN i % 2 = 1 THEN "
        "IF(2 * CAST(substring(acct, 12 - i, 1) AS INT) > 9, "
        "2 * CAST(substring(acct, 12 - i, 1) AS INT) - 9, "
        "2 * CAST(substring(acct, 12 - i, 1) AS INT)) "
        "ELSE CAST(substring(acct, 12 - i, 1) AS INT) END)"
    )
    return withacct.select(
        "o_orderkey",
        "acct",
        luhn.cast("long").alias("luhn_sum"),
        (luhn % 10 == 0).alias("luhn_valid"),
    )


QUERIES = {
    "source_binary_files": q_source_binary_files,
    "fn_luhn_check": q_fn_luhn_check,
}

ORACLES = {
    "source_binary_files": (
        "SELECT 'doc_' || lpad(CAST(doc_id AS VARCHAR), 5, '0') || '.bin' "
        "AS fname, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, "
        "md5(text) AS content_md5 FROM documents "
        f"WHERE doc_id < {BINF_N} AND text IS NOT NULL"
    ),
    "fn_luhn_check": (
        "WITH a AS (SELECT o_orderkey, "
        "lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS acct FROM orders), "
        "s AS (SELECT o_orderkey, acct, "
        "CAST(list_sum(list_transform(range(0, 12), i -> "
        "CASE WHEN i % 2 = 1 THEN "
        "CASE WHEN 2 * CAST(substring(acct, CAST(12 - i AS INT), 1) AS INT) > 9 "
        "THEN 2 * CAST(substring(acct, CAST(12 - i AS INT), 1) AS INT) - 9 "
        "ELSE 2 * CAST(substring(acct, CAST(12 - i AS INT), 1) AS INT) END "
        "ELSE CAST(substring(acct, CAST(12 - i AS INT), 1) AS INT) END)) "
        "AS BIGINT) AS luhn_sum FROM a) "
        "SELECT o_orderkey, acct, luhn_sum, luhn_sum % 10 = 0 AS luhn_valid "
        "FROM s"
    ),
}
