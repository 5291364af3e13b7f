"""Group X — scalar function surface (SURVEY §2B).

Reference analog: arbitrary Java inside map() (ref op A1).  Here: built-in
pyspark.sql.functions only — JVM-side, codegen'd, no Python in the row
path.  Oracles stay inside the dialect-portable subset (SURVEY Appendix
B.7: ln not log, no week/dow, POSIX regex, 1-based positions).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_tables
from ..functions import l2_norm_expr


def q_fn_string(spark, sf_dir):
    """upper/substr/concat/length/replace/regexp_extract over documents."""
    load_tables(spark, sf_dir)
    d = spark.table("documents")
    return d.select(
        "doc_id",
        F.upper("lang").alias("lang_up"),
        F.substring("text", 1, 10).alias("text_pfx"),
        F.concat(F.col("lang"), F.lit(":"), F.col("source")).alias("lang_src"),
        F.length("text").alias("text_len"),
        F.replace(F.col("source"), F.lit("src"), F.lit("S")).alias("source_s"),
        F.regexp_extract("source", "(src)([0-9]+)", 2).cast("int").alias("src_num"),
    )


def q_fn_datetime(spark, sf_dir):
    """year/month/day/date_trunc/day-diff on orders (no week/dow: dialects)."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.date_trunc("month", F.col("o_orderdate")).cast("timestamp_ntz").alias("mon_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .alias("days_since"),
    )


def q_fn_math(spark, sf_dir):
    """round/abs/sqrt/ln/power/% over lineitem prices (ln, not log — the
    Spark log==ln vs DuckDB log==log10 trap, SURVEY B.7)."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.round(F.abs(F.col("l_extendedprice") - 30000), 2).alias("abs_dev"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 4).alias("price_ln"),
        F.round(F.pow(F.col("l_discount") + 1, 2), 4).alias("disc_pow"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


def q_fn_array(spark, sf_dir):
    """Array kernel over embeddings: size, first element, L2 norm via
    higher-order aggregate (elements cast float->double before arithmetic)."""
    load_tables(spark, sf_dir)
    e = spark.table("embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        # + 0.0 folds IEEE -0.0 to +0.0 — a first element like -3e-5
        # rounds to the negative-zero double in one engine and positive
        # zero in the other; the add makes both print "0.0".
        (F.round(F.element_at("embedding", 1).cast("double"), 4) + F.lit(0.0)).alias(
            "first_el"
        ),
        l2_norm_expr("embedding").alias("l2_norm"),
    )


def q_fn_json(spark, sf_dir):
    """JSON extraction stats per event_type (props = {"k": <int>})."""
    load_tables(spark, sf_dir)
    ev = spark.table("events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.avg(k), 4).alias("avg_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


def q_fn_struct_map(spark, sf_dir):
    """Build a struct, then re-project its fields flat (cross-engine struct
    hashing is not comparable, so the checked output is flat)."""
    load_tables(spark, sf_dir)
    d = spark.table("documents")
    s = d.select(F.struct("doc_id", "lang", "n_chars").alias("s"))
    return s.select(
        F.col("s.doc_id").alias("doc_id"),
        F.col("s.lang").alias("lang"),
        (F.col("s.n_chars") % 100).alias("chars_mod"),
    )


def q_fn_bitwise_conditional(spark, sf_dir):
    """Bitwise &,|,xor,shifts + nullif/greatest/least on integer keys.

    Dialect trap: `^` is xor in Spark but POWER in DuckDB — the oracle
    uses xor().  All integer-domain, so no rounding needed."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("k_and"),
        k.bitwiseOR(F.lit(15)).alias("k_or"),
        k.bitwiseXOR(F.lit(170)).alias("k_xor"),
        F.shiftleft(k, 2).alias("k_shl"),
        F.shiftright(k, 3).alias("k_shr"),
        F.nullif((k % 10), F.lit(0)).alias("mod_nz"),
        F.greatest(k % 7, k % 5, k % 3).alias("g_mod"),
        F.least(k % 7, k % 5, k % 3).alias("l_mod"),
    )


def q_fn_interval_arith(spark, sf_dir):
    """Calendar interval arithmetic on timestamps: +30 days, -1 month,
    +90 minutes.  Month math is calendar-aware (Jan 31 - 1 month clamps)
    and both engines clamp identically; all values NTZ-UTC (SURVEY A.3)."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        (d + F.expr("INTERVAL 30 DAYS")).cast("timestamp_ntz").alias("due_ts"),
        (d - F.expr("INTERVAL 1 MONTH")).cast("timestamp_ntz").alias("prev_mon_ts"),
        (d + F.expr("INTERVAL 90 MINUTES")).cast("timestamp_ntz").alias("review_ts"),
    )


def q_fn_hash_digest(spark, sf_dir):
    """Cryptographic digests (md5 / sha256) over document text — the
    fingerprint primitives exact dedup builds on.  Hex output is
    byte-identical across engines."""
    load_tables(spark, sf_dir)
    d = spark.table("documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
    )


#: fixed 128-bit demo key for the AES surface (fixture-only, obviously)
AES_KEY = "0123456789abcdef"


def q_fn_aes_roundtrip(spark, sf_dir):
    """Column-level AES encryption — the PII-protection primitive a
    governed lakehouse applies to name/email columns at rest: encrypt
    customer names under a 128-bit key with AES-GCM (the authenticated
    production mode — never use ECB for real PII), decrypt back, and
    report the ciphertext length.  GCM's IV is normally random; here we
    pass an explicit fixed 12-byte IV so the ciphertext — and therefore
    this test — is deterministic (production derives a fresh IV per
    value).  Spark's GCM output is IV(12) || ciphertext(len) || tag(16),
    so cipher_len = len + 28 exactly — DuckDB computes the expected
    values without any AES support: the roundtrip equals the plaintext,
    the length is arithmetic.

    100 TB: both functions are JVM codegen expressions — encryption adds
    zero shuffle; a key-rotation rewrite is one map-only pass."""
    load_tables(spark, sf_dir)
    c = spark.table("customer")
    iv = "unhex('000102030405060708090a0b')"  # fixed 12-byte GCM IV (test-only)
    cipher = F.expr(
        f"aes_encrypt(cast(c_name AS BINARY), '{AES_KEY}', 'GCM', 'DEFAULT', {iv})"
    )
    plain = F.expr(
        f"cast(aes_decrypt(aes_encrypt(cast(c_name AS BINARY), '{AES_KEY}', "
        f"'GCM', 'DEFAULT', {iv}), '{AES_KEY}', 'GCM') AS STRING)"
    )
    return c.select(
        "c_custkey",
        plain.alias("name_roundtrip"),
        F.length(cipher).alias("cipher_len"),
    )


def q_fn_string_pad(spark, sf_dir):
    """Pad/trim/reverse/repeat/translate string surface (no initcap —
    absent from DuckDB 1.0)."""
    load_tables(spark, sf_dir)
    n = spark.table("nation")
    return n.select(
        "n_nationkey",
        F.lpad("n_name", 12, "*").alias("name_lpad"),
        F.rpad("n_name", 12, ".").alias("name_rpad"),
        F.trim(F.concat(F.lit("  "), F.col("n_name"), F.lit(" "))).alias("name_trim"),
        F.reverse("n_name").alias("name_rev"),
        F.repeat(F.substring("n_name", 1, 2), 3).alias("name_rep"),
        F.translate("n_name", "AEI", "432").alias("name_l33t"),
    )


def q_fn_trig(spark, sf_dir):
    """Trigonometric / angular function surface over normalized prices
    (sin, cos, atan2, degrees, radians; rounded 4dp)."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    x = F.col("o_totalprice") / F.lit(100000.0)
    # `+ 0.0` normalizes the sign of rounded zero (IEEE: -0.0 + 0.0 = +0.0);
    # DuckDB's round() preserves -0.0 where Spark yields 0.0, and the
    # driver's value-hash distinguishes them (r2 fn_trig fail).
    z = F.lit(0.0)
    return o.select(
        "o_orderkey",
        (F.round(F.sin(x), 4) + z).alias("sin_x"),
        (F.round(F.cos(x), 4) + z).alias("cos_x"),
        (F.round(F.atan2(x, F.lit(2.0)), 4) + z).alias("atan2_x2"),
        (F.round(F.degrees(x), 4) + z).alias("deg_x"),
        (F.round(F.radians(x), 4) + z).alias("rad_x"),
    )


def q_fn_array_hof(spark, sf_dir):
    """Higher-order array functions over embeddings: lambda filter count,
    transform+aggregate (sum of squares of positives), element max.  All
    JVM-side lambda evaluation — the columnar way to compute per-vector
    stats without any Python."""
    load_tables(spark, sf_dir)
    e = spark.table("embeddings")
    v = F.col("embedding")
    pos = F.filter(v, lambda x: x > 0)
    return e.select(
        "vec_id",
        F.size(pos).alias("n_pos"),
        F.round(
            F.aggregate(
                F.transform(pos, lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            4,
        ).alias("pos_sumsq"),
        F.round(F.array_max(v).cast("double"), 4).alias("el_max"),
    )


def q_fn_datetime_epoch(spark, sf_dir):
    """Epoch extraction + reconstruction: ts -> integer epoch seconds ->
    back to timestamp (floor to second).  Integer domain end-to-end; the
    ntz<->ltz casts are value-preserving under the pinned UTC session."""
    load_tables(spark, sf_dir)
    ev = spark.table("events")
    epoch = F.unix_timestamp(F.col("ts").cast("timestamp"))
    return ev.select(
        "event_id",
        epoch.alias("epoch_s"),
        F.timestamp_seconds(epoch).cast("timestamp_ntz").alias("ts_floor"),
        (epoch % 86400).alias("sec_of_day"),
    )


def q_fn_levenshtein(spark, sf_dir):
    """Edit distance (fuzzy-match primitive for record linkage / dedup):
    levenshtein between part name/type and against a fixed probe."""
    load_tables(spark, sf_dir)
    p = spark.table("part")
    return p.select(
        "p_partkey",
        F.levenshtein("p_name", "p_type").alias("dist_name_type"),
        F.levenshtein(F.col("p_brand"), F.lit("Brand#33")).alias("dist_brand"),
    )


def q_fn_printf_format(spark, sf_dir):
    """printf-style formatting (Spark format_string / DuckDB printf) —
    integer+string directives only: float directives differ in rounding
    mode between Java and C formatting, so they stay off the hash surface."""
    load_tables(spark, sf_dir)
    p = spark.table("part")
    return p.select(
        "p_partkey",
        F.format_string("%s-%05d", F.col("p_brand"), F.col("p_partkey")).alias("sku"),
        F.format_string("%08x", F.col("p_partkey")).alias("key_hex"),
    )


def q_fn_sequence_gapfill(spark, sf_dir):
    """Calendar densification (time-series gap-fill): generate the days
    Jan 1-30 2024 via sequence(), left-join daily event aggregates,
    zero-fill.
    Scale note: the generated dimension is tiny and broadcast; the fact
    aggregation is the only shuffle."""
    load_tables(spark, sf_dir)
    days = spark.sql(
        "SELECT explode(sequence(DATE '2024-01-01', DATE '2024-01-30', "
        "interval 1 day)) AS day"
    )
    daily = (
        spark.table("events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sv"))
    )
    return days.join(daily, "day", "left").select(
        # DATE never crosses the hash surface: pandas renders DuckDB dates
        # as midnight timestamps, Spark dates as date objects (App. B.9-ish
        # flattening trap) — emit ntz timestamps on both sides instead
        F.col("day").cast("timestamp_ntz").alias("day_ts"),
        F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        F.coalesce(F.col("sv"), F.lit(0.0)).alias("sum_value"),
    )


#: fixed probe vocabulary for array set-op intersection
_PROBE_WORDS = ("scan", "join", "merge")


def q_fn_array_setops(spark, sf_dir):
    """Array set algebra over tokenized documents: distinct/sort/join to a
    canonical vocab string, distinct-token count, intersection size with a
    fixed probe vocabulary.  All JVM-side higher-order functions."""
    load_tables(spark, sf_dir)
    d = spark.table("documents")
    toks = F.array_remove(F.split("text", " "), "")
    return d.select(
        "doc_id",
        F.array_join(F.array_sort(F.array_distinct(toks)), " ").alias("vocab"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.size(
            F.array_intersect(toks, F.array(*[F.lit(w) for w in _PROBE_WORDS]))
        ).alias("n_probe"),
    )


def q_fn_regexp_capture(spark, sf_dir):
    """Regex capture-group extraction + global replace + count over the
    raw props payload — the JVM-side text surgery a scrubbing/parsing
    pipeline leans on.  Both engines return \'\' for a non-matching
    capture (verified), so the key is tie-free."""
    load_tables(spark, sf_dir)
    ev = spark.table("events")
    return ev.select(
        "event_id",
        F.regexp_extract("props", r'"v":([0-9]+)', 1).alias("v_digits"),
        F.regexp_extract("props", r"([a-z]+)_([a-z]+)", 2).alias("snake_tail"),
        F.regexp_count("props", F.lit("[0-9]")).alias("n_digits"),
    )


def q_fn_base64_hex(spark, sf_dir):
    """Binary-encoding surface: base64 / hex encode and the decode
    roundtrips (the primitives under content-addressed storage keys and
    wire-format debugging).  All JVM expressions."""
    load_tables(spark, sf_dir)
    n = spark.table("nation")
    return n.select(
        "n_nationkey",
        F.base64(F.col("n_name").cast("binary")).alias("b64"),
        F.hex(F.col("n_name").cast("binary")).alias("hx"),
        F.decode(F.unbase64(F.base64(F.col("n_name").cast("binary"))), "UTF-8").alias(
            "b64_roundtrip"
        ),
        F.decode(F.unhex(F.hex(F.col("n_name").cast("binary"))), "UTF-8").alias(
            "hex_roundtrip"
        ),
    )


def q_fn_url_parse(spark, sf_dir):
    """URL component extraction with Spark's native parse_url (JVM-side
    java.net.URI semantics): host, path, one query parameter, and the
    fragment.  URLs are synthesized deterministically per document so
    every component varies.  The oracle reproduces the components with
    plain regexes — safe because the synthesized URLs are well-formed."""
    load_tables(spark, sf_dir)
    d = spark.table("documents")
    url = F.concat(
        F.lit("https://w"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.com/"), F.col("source"),
        F.lit("/p"), (F.col("doc_id") % 13).cast("string"),
        F.lit("?q=t"), (F.col("doc_id") % 13).cast("string"),
        F.lit("&lang="), F.col("lang"),
        F.lit("#s"), (F.col("doc_id") % 5).cast("string"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("q")).alias("q_param"),
        F.parse_url("url", F.lit("REF")).alias("fragment"),
    )


def q_fn_ip_addr(spark, sf_dir):
    """IPv4 integer↔dotted-quad conversions — the log-analytics staple
    Spark has no builtin for, composed from shifts/masks and string
    splits (both directions, roundtrip-verified in the result itself).
    IPs are synthesized per order via a Knuth multiplicative hash so all
    octets vary."""
    load_tables(spark, sf_dir)
    o = spark.table("orders").select("o_orderkey")
    ip = (F.col("o_orderkey") * 2654435761) % F.lit(4294967296).cast("long")
    d = o.select("o_orderkey", ip.cast("long").alias("ip_int"))
    octet = lambda n: F.shiftright("ip_int", n).bitwiseAND(F.lit(255)).cast("string")  # noqa: E731
    dotted = F.concat_ws(".", octet(24), octet(16), octet(8), octet(0))
    d = d.withColumn("dotted", dotted)
    parts = F.split("dotted", "\\.")
    back = (
        F.element_at(parts, 1).cast("long") * 16777216
        + F.element_at(parts, 2).cast("long") * 65536
        + F.element_at(parts, 3).cast("long") * 256
        + F.element_at(parts, 4).cast("long")
    )
    return d.select(
        "o_orderkey", "ip_int", "dotted",
        back.alias("roundtrip_int"),
        (back == F.col("ip_int")).alias("roundtrip_ok"),
    )


def q_fn_try_arith(spark, sf_dir):
    """Error-tolerant arithmetic surface — Spark's try_* family, the
    ANSI-mode-safe way a pipeline survives dirty data: try_divide turns
    division-by-zero into NULL instead of an exception, try_cast turns
    an unparseable string into NULL.  DuckDB expresses the same
    semantics with CASE / TRY_CAST, so every column hash-checks.

    100 TB: all four expressions are JVM codegen; the point of the
    surface is that a single bad row can no longer kill a stage."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    # safe_unit: same try_divide NULL-on-zero semantics, but the 4-dp
    # decimal is produced by an exact integer half-up quotient over
    # cents (r10 extreme-magnitude sweep: round(double/k, 4) at 1e11
    # magnitudes flaps between the engines' round implementations; the
    # price/k value is rational, so it rounds exactly in integer space)
    return o.select(
        "o_orderkey",
        F.expr(
            "CASE WHEN o_custkey % 7 = 0 THEN CAST(NULL AS DOUBLE) ELSE "
            "((2 * CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS DECIMAL(38,0)) "
            "  * 100 + (o_custkey % 7)) div (2 * (o_custkey % 7))) / 10000.0 "
            "END"
        ).alias("safe_unit"),
        F.expr("try_divide(o_totalprice, 0.0)").alias("div0"),
        F.expr("try_cast(o_orderpriority AS INT)").alias("prio_full_int"),
        F.expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)").alias(
            "prio_digit"
        ),
    )


def q_fn_variant_json(spark, sf_dir):
    """Semi-structured VARIANT surface (Spark 4): parse JSON into the
    binary VARIANT type and pull typed values back out with
    variant_get — the open-table-format path for schema-on-read columns.
    A nested payload is built from order columns (to_json -> parse_json
    round-trip must be lossless) plus a typed extract from the real
    events-style props string.  Output is flat scalars; DuckDB verifies
    with plain json_extract / the source columns."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    payload = F.to_json(
        F.struct(
            F.col("o_orderkey").alias("id"),
            F.struct(
                F.col("o_totalprice").alias("amt"),
                F.col("o_orderstatus").alias("st"),
            ).alias("pay"),
        )
    )
    tagged = o.withColumn("v", F.parse_json(payload))
    return tagged.select(
        "o_orderkey",
        F.round(F.variant_get("v", "$.pay.amt", "double"), 2).alias("amt"),
        F.variant_get("v", "$.pay.st", "string").alias("status"),
        F.variant_get("v", "$.id", "bigint").alias("id_roundtrip"),
    )


QUERIES = {
    "fn_variant_json": q_fn_variant_json,
    "fn_try_arith": q_fn_try_arith,
    "fn_ip_addr": q_fn_ip_addr,
    "fn_url_parse": q_fn_url_parse,
    "fn_base64_hex": q_fn_base64_hex,
    "fn_regexp_capture": q_fn_regexp_capture,
    "fn_string": q_fn_string,
    "fn_datetime": q_fn_datetime,
    "fn_math": q_fn_math,
    "fn_array": q_fn_array,
    "fn_json": q_fn_json,
    "fn_struct_map": q_fn_struct_map,
    "fn_bitwise_conditional": q_fn_bitwise_conditional,
    "fn_interval_arith": q_fn_interval_arith,
    "fn_aes_roundtrip": q_fn_aes_roundtrip,
    "fn_hash_digest": q_fn_hash_digest,
    "fn_string_pad": q_fn_string_pad,
    "fn_trig": q_fn_trig,
    "fn_array_hof": q_fn_array_hof,
    "fn_datetime_epoch": q_fn_datetime_epoch,
    "fn_levenshtein": q_fn_levenshtein,
    "fn_printf_format": q_fn_printf_format,
    "fn_sequence_gapfill": q_fn_sequence_gapfill,
    "fn_array_setops": q_fn_array_setops,
}

ORACLES = {
    "fn_variant_json": (
        "SELECT o_orderkey, round(o_totalprice, 2) AS amt, "
        "o_orderstatus AS status, o_orderkey AS id_roundtrip "
        "FROM orders"
    ),
    "fn_try_arith": (
        "SELECT o_orderkey, "
        "CASE WHEN o_custkey % 7 = 0 THEN NULL "
        "ELSE ((2 * CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        "::HUGEINT * 100 + (o_custkey % 7)) // (2 * (o_custkey % 7))) "
        "/ 10000.0 END AS safe_unit, "
        "CAST(NULL AS DOUBLE) AS div0, "
        "TRY_CAST(o_orderpriority AS INTEGER) AS prio_full_int, "
        "TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS prio_digit "
        "FROM orders"
    ),
    "fn_ip_addr": (
        "WITH d AS (SELECT o_orderkey, "
        "(o_orderkey * 2654435761) % 4294967296 AS ip_int FROM orders), "
        "q AS (SELECT o_orderkey, ip_int, "
        "((ip_int >> 24) & 255)::VARCHAR || '.' || "
        "((ip_int >> 16) & 255)::VARCHAR || '.' || "
        "((ip_int >> 8) & 255)::VARCHAR || '.' || "
        "(ip_int & 255)::VARCHAR AS dotted FROM d) "
        "SELECT o_orderkey, ip_int, dotted, "
        "string_split(dotted, '.')[1]::BIGINT * 16777216 + "
        "string_split(dotted, '.')[2]::BIGINT * 65536 + "
        "string_split(dotted, '.')[3]::BIGINT * 256 + "
        "string_split(dotted, '.')[4]::BIGINT AS roundtrip_int, "
        "string_split(dotted, '.')[1]::BIGINT * 16777216 + "
        "string_split(dotted, '.')[2]::BIGINT * 65536 + "
        "string_split(dotted, '.')[3]::BIGINT * 256 + "
        "string_split(dotted, '.')[4]::BIGINT = ip_int AS roundtrip_ok FROM q"
    ),
    "fn_url_parse": (
        "WITH u AS (SELECT doc_id, "
        "'https://w' || (doc_id % 7) || '.example.com/' || source || "
        "'/p' || (doc_id % 13) || '?q=t' || (doc_id % 13) || "
        "'&lang=' || lang || '#s' || (doc_id % 5) AS url FROM documents) "
        "SELECT doc_id, url, "
        "regexp_extract(url, '^https://([^/]+)', 1) AS host, "
        "regexp_extract(url, '^https://[^/]+([^?#]*)', 1) AS path, "
        "regexp_extract(url, '[?&]q=([^&#]*)', 1) AS q_param, "
        "regexp_extract(url, '#(.*)$', 1) AS fragment FROM u"
    ),
    "fn_base64_hex": (
        "SELECT n_nationkey, to_base64(n_name::BLOB) AS b64, "
        "hex(n_name) AS hx, "
        "decode(from_base64(to_base64(n_name::BLOB))) AS b64_roundtrip, "
        "decode(unhex(hex(n_name))) AS hex_roundtrip FROM nation"
    ),
    "fn_regexp_capture": (
        "SELECT event_id, "
        "regexp_extract(props, '\"v\":([0-9]+)', 1) AS v_digits, "
        "regexp_extract(props, '([a-z]+)_([a-z]+)', 2) AS snake_tail, "
        "CAST(len(regexp_extract_all(props, '[0-9]')) AS BIGINT) AS n_digits "
        "FROM events"
    ),
    "fn_levenshtein": (
        "SELECT p_partkey, levenshtein(p_name, p_type) AS dist_name_type, "
        "levenshtein(p_brand, 'Brand#33') AS dist_brand FROM part"
    ),
    "fn_printf_format": (
        "SELECT p_partkey, printf('%s-%05d', p_brand, p_partkey) AS sku, "
        "printf('%08x', p_partkey) AS key_hex FROM part"
    ),
    "fn_sequence_gapfill": (
        "WITH days AS (SELECT CAST(d AS DATE) AS day FROM "
        "(SELECT unnest(generate_series(DATE '2024-01-01', "
        "DATE '2024-01-30', INTERVAL 1 DAY)) AS d) g), "
        "agg AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n, "
        "round(sum(value), 2) AS sv FROM events GROUP BY CAST(ts AS DATE)) "
        "SELECT CAST(d.day AS TIMESTAMP) AS day_ts, coalesce(a.n, 0) AS n_events, "
        "coalesce(a.sv, 0.0) AS sum_value FROM days d "
        "LEFT JOIN agg a ON a.day = d.day"
    ),
    "fn_array_setops": (
        "WITH t AS (SELECT doc_id, "
        "list_filter(string_split(text, ' '), w -> w <> '') AS toks "
        "FROM documents) "
        "SELECT doc_id, "
        "array_to_string(list_sort(list_distinct(toks)), ' ') AS vocab, "
        "CAST(len(list_distinct(toks)) AS INT) AS n_distinct, "
        "CAST(len(list_distinct(list_filter(toks, "
        "w -> w IN ('scan', 'join', 'merge')))) AS INT) AS n_probe "
        "FROM t"
    ),
    "fn_array_hof": (
        "SELECT vec_id, "
        "CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos, "
        "round(coalesce(list_sum(list_transform(list_filter(embedding, x -> x > 0), "
        "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 0.0), 4) AS pos_sumsq, "
        "round(CAST(list_max(embedding) AS DOUBLE), 4) AS el_max "
        "FROM embeddings"
    ),
    "fn_datetime_epoch": (
        "SELECT event_id, "
        "CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s, "
        "make_timestamp(CAST(floor(epoch(ts)) AS BIGINT) * 1000000) AS ts_floor, "
        "CAST(floor(epoch(ts)) AS BIGINT) % 86400 AS sec_of_day "
        "FROM events"
    ),
    "fn_aes_roundtrip": (
        # GCM: IV(12) + ciphertext(= plaintext length) + auth tag(16)
        "SELECT c_custkey, c_name AS name_roundtrip, "
        "length(c_name) + 28 AS cipher_len FROM customer"
    ),
    "fn_hash_digest": (
        "SELECT doc_id, md5(text) AS text_md5, sha256(text) AS text_sha256 "
        "FROM documents"
    ),
    "fn_string_pad": (
        "SELECT n_nationkey, "
        "lpad(n_name, 12, '*') AS name_lpad, "
        "rpad(n_name, 12, '.') AS name_rpad, "
        "trim('  ' || n_name || ' ') AS name_trim, "
        "reverse(n_name) AS name_rev, "
        "repeat(substr(n_name, 1, 2), 3) AS name_rep, "
        "translate(n_name, 'AEI', '432') AS name_l33t "
        "FROM nation"
    ),
    "fn_trig": (
        # + 0.0 canonicalizes -0.0 -> +0.0 (matches the Spark side's guard)
        "SELECT o_orderkey, "
        "round(sin(o_totalprice / 100000.0), 4) + 0.0 AS sin_x, "
        "round(cos(o_totalprice / 100000.0), 4) + 0.0 AS cos_x, "
        "round(atan2(o_totalprice / 100000.0, 2.0), 4) + 0.0 AS atan2_x2, "
        "round(degrees(o_totalprice / 100000.0), 4) + 0.0 AS deg_x, "
        "round(radians(o_totalprice / 100000.0), 4) + 0.0 AS rad_x "
        "FROM orders"
    ),
    "fn_bitwise_conditional": (
        "SELECT o_orderkey, "
        "o_orderkey & 255 AS k_and, "
        "o_orderkey | 15 AS k_or, "
        "xor(o_orderkey, 170) AS k_xor, "
        "o_orderkey << 2 AS k_shl, "
        "o_orderkey >> 3 AS k_shr, "
        "nullif(o_orderkey % 10, 0) AS mod_nz, "
        "greatest(o_orderkey % 7, o_orderkey % 5, o_orderkey % 3) AS g_mod, "
        "least(o_orderkey % 7, o_orderkey % 5, o_orderkey % 3) AS l_mod "
        "FROM orders"
    ),
    "fn_interval_arith": (
        "SELECT o_orderkey, "
        "o_orderdate + INTERVAL 30 DAY AS due_ts, "
        "o_orderdate - INTERVAL 1 MONTH AS prev_mon_ts, "
        "o_orderdate + INTERVAL 90 MINUTE AS review_ts "
        "FROM orders"
    ),
    "fn_string": (
        "SELECT doc_id, upper(lang) AS lang_up, substr(text, 1, 10) AS text_pfx, "
        # || not concat(): Spark's concat propagates NULL while DuckDB's
        # concat SKIPS NULL arguments — || propagates on both engines
        "lang || ':' || source AS lang_src, length(text) AS text_len, "
        "replace(source, 'src', 'S') AS source_s, "
        "CAST(regexp_extract(source, '(src)([0-9]+)', 2) AS INT) AS src_num "
        "FROM documents"
    ),
    "fn_datetime": (
        "SELECT o_orderkey, year(o_orderdate) AS yr, month(o_orderdate) AS mo, "
        "day(o_orderdate) AS dy, date_trunc('month', o_orderdate) AS mon_start, "
        "CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) "
        "AS days_since FROM orders"
    ),
    "fn_math": (
        "SELECT l_orderkey, l_linenumber, round(l_extendedprice, 1) AS price_r1, "
        "round(abs(l_extendedprice - 30000), 2) AS abs_dev, "
        "round(sqrt(l_extendedprice), 4) AS price_sqrt, "
        "round(ln(l_extendedprice), 4) AS price_ln, "
        "round(power(l_discount + 1, 2), 4) AS disc_pow, "
        "l_orderkey % 7 AS key_mod FROM lineitem"
    ),
    "fn_array": (
        "SELECT vec_id, CAST(len(embedding) AS INT) AS dim, "
        "round(CAST(embedding[1] AS DOUBLE), 4) + 0.0 AS first_el, "
        "round(sqrt(list_sum(list_transform(embedding, "
        "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm "
        "FROM embeddings"
    ),
    "fn_json": (
        "SELECT event_type, count(*) AS n, "
        "round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k, "
        "min(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k, "
        "max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k "
        "FROM events GROUP BY event_type"
    ),
    "fn_struct_map": (
        "SELECT doc_id, lang, n_chars % 100 AS chars_mod FROM documents"
    ),
}
