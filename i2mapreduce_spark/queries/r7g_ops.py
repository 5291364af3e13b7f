"""Round-6 additions, batch 33: longest-prefix-match join (the
router/URL-rule classifier — pick the MOST SPECIFIC matching rule, not
any match), Cohen's kappa (inter-annotator agreement — the label-
quality gate for training-data pipelines), Apache-combined-log parsing
(the classic regex-extraction source), and relational DIVISION (the
textbook 'all of them' operator: rows related to EVERY member of a
divisor set).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_tables

#: longest-prefix routing rules (prefix -> route), '' = default route
LPM_RULES = (
    ("STANDARD", "std"),
    ("STANDARD ANODIZED", "std-anodized"),
    ("SMALL", "small"),
    ("SMALL PLATED", "small-plated"),
    ("PROMO", "promo"),
    ("PROMO BURNISHED", "promo-burnished"),
    ("ECONOMY", "economy"),
    ("", "default"),
)

#: kappa annotator thresholds (near the fixture medians — 306 chars /
#: 56 tokens — so both labels genuinely split the corpus)
KAPPA_A_CHARS = 300
KAPPA_B_TOKENS = 50


def q_join_longest_prefix(spark, sf_dir):
    """LONGEST-PREFIX-MATCH join: classify every part type against a
    rule table where more specific prefixes win ('PROMO BURNISHED'
    beats 'PROMO' beats the '' default) — the routing-table semantics
    behind CIDR lookup, URL rules and product taxonomies, which a plain
    equi- or any-match join cannot express.

    Plan: the rule table is a literal bounded VALUES relation, the match
    is a starts_with theta-join (Spark auto-broadcasts the tiny build
    side), and the winner per part is one max_by on (prefix length,
    prefix) — deterministic even if two rules tie in length.  Output is
    the bounded per-route roll-up."""
    load_tables(spark, sf_dir)
    p = spark.table("part")
    rows = ", ".join(f"('{pre}', '{route}')" for pre, route in LPM_RULES)
    rules = spark.sql(f"SELECT * FROM VALUES {rows} AS t(prefix, route)")
    m = p.join(rules, F.expr("startswith(p_type, prefix)"))
    best = m.groupBy("p_partkey").agg(
        F.max_by(
            "route", F.struct(F.length("prefix"), F.col("prefix"))
        ).alias("route")
    )
    return best.groupBy("route").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.min("p_partkey").alias("min_key"),
        F.max("p_partkey").alias("max_key"),
    )


def q_agg_cohens_kappa(spark, sf_dir):
    """COHEN'S KAPPA between two deterministic 'annotators' labeling
    documents as long-form (A: chars > 800; B: whitespace tokens > 150)
    — the chance-corrected agreement score every labeling pipeline
    gates on before trusting its annotations (raw agreement flatters
    imbalanced labels; kappa does not).

    kappa = (p_o - p_e) / (1 - p_e) from the exact 2x2 integer
    confusion counts in ONE partial+final agg; both engines stream
    identical integers into the single fixed-shape double."""
    load_tables(spark, sf_dir)
    # complete-case: annotators cannot label a missing document (rater B
    # would read a NULL token count) — excluded on both sides
    d = spark.table("documents").filter(F.col("text").isNotNull())
    lab = d.select(
        (F.col("n_chars") > KAPPA_A_CHARS).cast("int").alias("a"),
        (F.size(F.split("text", " ")) > KAPPA_B_TOKENS).cast("int").alias(
            "b"
        ),
    )
    c = lab.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("a * b")).alias("c11"),
        F.sum(F.expr("a * (1 - b)")).alias("c10"),
        F.sum(F.expr("(1 - a) * b")).alias("c01"),
        F.sum(F.expr("(1 - a) * (1 - b)")).alias("c00"),
    )
    n = F.col("n").cast("double")
    po = (F.col("c11") + F.col("c00")) / n
    pe = (
        (F.col("c11") + F.col("c10")) * (F.col("c11") + F.col("c01"))
        + (F.col("c01") + F.col("c00")) * (F.col("c10") + F.col("c00"))
    ) / (n * n)
    return c.select(
        "n",
        "c11",
        "c10",
        "c01",
        "c00",
        F.round(po, 6).alias("p_observed"),
        F.round(pe, 6).alias("p_expected"),
        # try_divide: perfect chance agreement (pe = 1, e.g. a single
        # rating pair) leaves kappa undefined — NULL on both engines
        F.round(F.try_divide(po - pe, 1 - pe), 6).alias("kappa"),
    )


def q_source_weblog_parse(spark, sf_dir):
    """Apache combined-log SOURCE: events serialize to classic access-log
    lines (ip - - [-] "GET /path HTTP/1.1" status bytes), go through the
    text sink, come back as raw lines, and are re-parsed by ONE
    regexp_extract per field — the grep-shaped ETL that still feeds
    most traffic analytics.  Parsing is JVM-side regex on the scan (a
    map-only format conversion at any scale); the oracle recomputes the
    aggregate straight from events with the same synthesis rules."""
    from .scans import _scratch_dir

    load_tables(spark, sf_dir)
    # complete-case: an event without a byte count OR without a user
    # (NULL user_id -> NULL IP octets) cannot form a log line (concat
    # with NULL serializes an empty line that fails the read-back
    # cast) — excluded on both sides
    e = spark.table("events").filter(
        F.col("value").isNotNull() & F.col("user_id").isNotNull()
    )
    line = F.concat(
        F.lit("10."),
        (F.col("user_id") % 256).cast("string"),
        F.lit("."),
        (F.expr("user_id div 256") % 256).cast("string"),
        F.lit('.1 - - [-] "GET /'),
        F.col("event_type"),
        F.lit(' HTTP/1.1" '),
        F.when(F.col("event_type") == "error", F.lit(500))
        .otherwise(F.lit(200))
        .cast("string"),
        F.lit(" "),
        F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").cast(
            "string"
        ),
    )
    out = _scratch_dir("i2mr_weblog_") + "/access"
    e.select(line.alias("value")).write.mode("overwrite").text(out)
    raw = spark.read.text(out)
    parsed = raw.select(
        F.regexp_extract("value", r'^(\S+) - - \[-\] "GET /(\S+) HTTP/1\.1" (\d+) (\d+)$', 2).alias("path"),
        F.regexp_extract("value", r'^(\S+) - - \[-\] "GET /(\S+) HTTP/1\.1" (\d+) (\d+)$', 3)
        .cast("int")
        .alias("status"),
        F.regexp_extract("value", r'^(\S+) - - \[-\] "GET /(\S+) HTTP/1\.1" (\d+) (\d+)$', 4)
        .cast("long")
        .alias("bytes"),
    )
    return parsed.groupBy("path", "status").agg(
        F.count(F.lit(1)).alias("n_requests"),
        F.sum("bytes").alias("total_bytes"),
    )


def q_setop_division(spark, sf_dir):
    """Relational DIVISION — the textbook 'for all' operator: customers
    whose orders span EVERY priority class (rows related to every
    member of the divisor set), which no join alone expresses.  The
    standard set-cover rewrite: count DISTINCT divisor members per
    candidate and keep those matching the divisor's cardinality — one
    co-partitioned agg plus a 1-row divisor count, no double-negation
    NOT EXISTS pair.  Output is the qualifying set's bounded summary
    plus its exact membership count."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    divisor_n = o.select("o_orderpriority").distinct().count()
    per_cust = o.groupBy("o_custkey").agg(
        F.count_distinct("o_orderpriority").alias("n_prio"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    q = per_cust.filter(F.col("n_prio") == divisor_n)
    res = q.agg(
        F.lit(divisor_n).alias("divisor_size"),
        F.count(F.lit(1)).alias("n_qualifying"),
        F.min("o_custkey").alias("min_cust"),
        F.max("o_custkey").alias("max_cust"),
        F.sum("n_orders").alias("their_orders"),
    )
    # empty divisor set (empty input): division by the empty relation is
    # undefined — no summary row, matching the oracle's GROUP BY dn,
    # which grows no group when `per` is empty
    return res.limit(0) if divisor_n == 0 else res


QUERIES = {
    "join_longest_prefix": q_join_longest_prefix,
    "agg_cohens_kappa": q_agg_cohens_kappa,
    "source_weblog_parse": q_source_weblog_parse,
    "setop_division": q_setop_division,
}

_LPM_ROWS = ", ".join(f"('{p}', '{r}')" for p, r in LPM_RULES)

ORACLES = {
    "join_longest_prefix": (
        f"WITH rules AS (SELECT * FROM (VALUES {_LPM_ROWS}) "
        "AS t(prefix, route)), "
        "m AS (SELECT p_partkey, route, prefix FROM part JOIN rules "
        "ON starts_with(p_type, prefix)), "
        "best AS (SELECT p_partkey, route FROM (SELECT p_partkey, route, "
        "row_number() OVER (PARTITION BY p_partkey "
        "ORDER BY length(prefix) DESC, prefix DESC) AS rn FROM m) "
        "WHERE rn = 1) "
        "SELECT route, CAST(count(*) AS BIGINT) AS n_parts, "
        "min(p_partkey) AS min_key, max(p_partkey) AS max_key "
        "FROM best GROUP BY 1"
    ),
    "agg_cohens_kappa": (
        "WITH lab AS (SELECT "
        f"CASE WHEN n_chars > {KAPPA_A_CHARS} THEN 1 ELSE 0 END AS a, "
        f"CASE WHEN len(string_split(text, ' ')) > {KAPPA_B_TOKENS} "
        "THEN 1 ELSE 0 END AS b FROM documents WHERE text IS NOT NULL), "
        "c AS (SELECT count(*) AS n, "
        "CAST(sum(a * b) AS BIGINT) AS c11, "
        "CAST(sum(a * (1 - b)) AS BIGINT) AS c10, "
        "CAST(sum((1 - a) * b) AS BIGINT) AS c01, "
        "CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS c00 FROM lab) "
        "SELECT CAST(n AS BIGINT) AS n, c11, c10, c01, c00, "
        "round((c11 + c00) / CAST(n AS DOUBLE), 6) AS p_observed, "
        "round(((c11 + c10) * (c11 + c01) + (c01 + c00) * (c10 + c00)) "
        "/ (CAST(n AS DOUBLE) * n), 6) AS p_expected, "
        "round(((c11 + c00) / CAST(n AS DOUBLE) "
        "- ((c11 + c10) * (c11 + c01) + (c01 + c00) * (c10 + c00)) "
        "/ (CAST(n AS DOUBLE) * n)) "
        "/ (1 - ((c11 + c10) * (c11 + c01) + (c01 + c00) * (c10 + c00)) "
        "/ (CAST(n AS DOUBLE) * n)), 6) AS kappa FROM c"
    ),
    "source_weblog_parse": (
        "SELECT event_type AS path, "
        "CAST(CASE WHEN event_type = 'error' THEN 500 ELSE 200 END AS INT) "
        "AS status, CAST(count(*) AS BIGINT) AS n_requests, "
        "CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) "
        "AS BIGINT) AS total_bytes FROM events "
        "WHERE value IS NOT NULL AND user_id IS NOT NULL GROUP BY 1, 2"
    ),
    "setop_division": (
        "WITH per AS (SELECT o_custkey, "
        "count(DISTINCT o_orderpriority) AS n_prio, count(*) AS n_orders "
        "FROM orders GROUP BY 1), "
        "d AS (SELECT count(DISTINCT o_orderpriority) AS dn FROM orders) "
        "SELECT CAST(dn AS INT) AS divisor_size, "
        "CAST(count(*) AS BIGINT) AS n_qualifying, "
        "min(o_custkey) AS min_cust, max(o_custkey) AS max_cust, "
        "CAST(sum(n_orders) AS BIGINT) AS their_orders "
        "FROM per, d WHERE n_prio = dn GROUP BY dn"
    ),
}
