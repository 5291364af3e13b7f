"""Group Q — data-quality operators (Deequ-style): column profiling,
referential-integrity audit, and declarative constraint checking.

A 100 TB corpus build runs these before anything else: a profile pass
(null rates / distinct counts / ranges per column), an FK-orphan audit
across the star schema, and a rule table of row-level constraints whose
violation counts gate the pipeline.  All three are single-pass
aggregations (the profile computes every column's metrics in ONE scan,
not one scan per column) so the cost at scale is one read of the table.

All hash-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..catalog import load_tables

#: profiled lineitem columns: (name, is_numeric) — numeric min/max are cast
#: through DECIMAL(18,2) so both engines render identical varchar forms
_PROFILE_COLS = [
    ("l_quantity", True),
    ("l_extendedprice", True),
    ("l_discount", True),
    ("l_returnflag", False),
    ("l_linestatus", False),
]

#: (rule_name, table, SQL predicate that GOOD rows satisfy) — dialect-portable
_RULES = [
    ("quantity_1_50", "lineitem", "l_quantity BETWEEN 1 AND 50"),
    ("discount_0_10pct", "lineitem", "l_discount BETWEEN 0.0 AND 0.10"),
    ("extprice_positive", "lineitem", "l_extendedprice > 0"),
    ("shipdate_not_null", "lineitem", "l_shipdate IS NOT NULL"),
    ("returnflag_domain", "lineitem", "l_returnflag IN ('A', 'N', 'R')"),
    ("totalprice_positive", "orders", "o_totalprice > 0"),
    ("orderstatus_domain", "orders", "o_orderstatus IN ('O', 'F', 'P')"),
]

#: (fk_name, child table, child key, parent table, parent key)
_FKS = [
    ("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem_supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer_nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier_nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
]


def _minmax_str(c: str, numeric: bool, agg: str):
    x = F.min(c) if agg == "min" else F.max(c)
    if numeric:
        return x.cast("decimal(18,2)").cast("string")
    return x.cast("string")


def q_dq_profile(spark, sf_dir):
    """Column profile of lineitem: rows / nulls / distinct / min / max per
    column, computed in ONE scan.

    Plan: all per-column aggregates land in a single Aggregate node (the
    multi-distinct is rewritten by Catalyst into one expand + two-phase
    agg), then the 1-row result is exploded into one row per column —
    exactly one pass over the table regardless of column count.  At
    100 TB this is the difference between a profile that costs one scan
    and one that costs #columns scans."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c, num in _PROFILE_COLS:
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__nd"),
            _minmax_str(c, num, "min").alias(f"{c}__min"),
            _minmax_str(c, num, "max").alias(f"{c}__max"),
        ]
    one = li.agg(*aggs)
    structs = F.array(*[
        F.struct(
            F.lit(c).alias("column"),
            F.col("_n").alias("n_rows"),
            (F.col("_n") - F.col(f"{c}__nn")).alias("n_null"),
            F.col(f"{c}__nd").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_value"),
            F.col(f"{c}__max").alias("max_value"),
        )
        for c, _ in _PROFILE_COLS
    ])
    return one.select(F.explode(structs).alias("p")).select("p.*")


def q_dq_referential_integrity(spark, sf_dir):
    """FK-orphan audit over the star schema: for each declared FK edge,
    the child row count and the number of child rows whose key has no
    parent (NULL keys counted separately as n_null_key).

    Plan: each edge is a left-anti join; every parent key side here is a
    dimension (orders is the largest) so Spark broadcasts it under AQE —
    at 100 TB the fact-side scan stays shuffle-free for the true
    dimensions and shuffles once for lineitem→orders.  Edges are
    independent jobs; the union is a no-barrier concat."""
    load_tables(spark, sf_dir)
    parts = []
    for name, child, ck, parent, pk in _FKS:
        c = spark.table(child)
        p = spark.table(parent).select(F.col(pk).alias(ck)).distinct()
        orphans = (
            c.filter(F.col(ck).isNotNull())
            .join(p, ck, "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphan"))
        )
        stats = c.agg(
            F.count(F.lit(1)).alias("n_child"),
            F.sum(F.col(ck).isNull().cast("bigint")).alias("n_null_key"),
        )
        parts.append(
            stats.crossJoin(orphans).select(
                F.lit(name).alias("fk_name"), "n_child", "n_null_key", "n_orphan"
            )
        )
    out = parts[0]
    for x in parts[1:]:
        out = out.unionAll(x)
    return out


def q_dq_constraint_check(spark, sf_dir):
    """Declarative row-constraint audit: for each rule, rows checked,
    violations, and the violation rate.  The predicates are SQL strings
    shared verbatim with the oracle, so the semantics under NULL are
    identical by construction (a NULL predicate counts as a violation —
    unknown is not proof of validity).

    Plan: rules against the same table fuse into one conditional
    aggregation per table — one scan of lineitem, one of orders."""
    load_tables(spark, sf_dir)
    by_table: dict[str, list[tuple[str, str]]] = {}
    for rule, table, pred in _RULES:
        by_table.setdefault(table, []).append((rule, pred))
    parts = []
    for table, rules in by_table.items():
        t = spark.table(table)
        aggs = [F.count(F.lit(1)).alias("_n")]
        for rule, pred in rules:
            good = F.expr(pred)
            aggs.append(
                F.sum(F.when(good, 0).otherwise(1)).alias(f"{rule}__v")
            )
        one = t.agg(*aggs)
        structs = F.array(*[
            F.struct(
                F.lit(rule).alias("rule"),
                F.col("_n").alias("n_checked"),
                F.col(f"{rule}__v").alias("n_violations"),
                F.round(F.col(f"{rule}__v") / F.col("_n"), 6).alias("violation_rate"),
            )
            for rule, _ in rules
        ])
        parts.append(one.select(F.explode(structs).alias("r")).select("r.*"))
    out = parts[0]
    for x in parts[1:]:
        out = out.unionAll(x)
    return out


#: PSI bins and the day boundary splitting reference vs current windows
PSI_BINS = 10
PSI_SPLIT_DAY = 15
PSI_EPS = 1e-6


def q_dq_drift_psi(spark, sf_dir):
    """Distribution-drift audit via the population stability index: the
    events stream is split into a reference window (day of month ≤ 15)
    and a current window, values are bucketed into 10 equal-width bins
    over the GLOBAL min/max, and per event type
    PSI = Σ_bins (p_cur - p_ref)·ln(p_cur/p_ref) with ε-smoothing.
    PSI < 0.1 is stable, > 0.25 is actionable drift — the standard
    production-ML input-drift gate.

    Plan: two scans fuse into one (conditional aggregation over the
    window flag); bin edges are broadcast scalars; everything else is a
    10×5-row arithmetic — the audit costs one pass at any scale."""
    load_tables(spark, sf_dir)
    ev = spark.table("events").select(
        "event_type", "value", (F.dayofmonth("ts") <= PSI_SPLIT_DAY).alias("is_ref")
    )
    rng = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    binned = ev.crossJoin(F.broadcast(rng)).select(
        "event_type",
        "is_ref",
        # try_divide: a constant value column (hi = lo on a degenerate
        # slice) has one bin — NULL ratio on both engines, and least()
        # skips the NULL to land every row in the top bin either way
        F.least(
            F.lit(PSI_BINS - 1),
            F.floor(
                F.try_divide(
                    F.col("value") - F.col("lo"), F.col("hi") - F.col("lo")
                ) * PSI_BINS
            ),
        ).cast("int").alias("bin"),
    )
    counts = binned.groupBy("event_type", "bin").agg(
        F.sum(F.col("is_ref").cast("long")).alias("n_ref"),
        F.sum((~F.col("is_ref")).cast("long")).alias("n_cur"),
    )
    tot = Window.partitionBy("event_type")
    # try_divide: a slice entirely before/after the split day has one
    # empty side — its distribution (and PSI) is NULL on both engines
    p_ref = F.try_divide("n_ref", F.sum("n_ref").over(tot)) + PSI_EPS
    p_cur = F.try_divide("n_cur", F.sum("n_cur").over(tot)) + PSI_EPS
    term = (p_cur - p_ref) * F.log(p_cur / p_ref)
    return (
        counts.select("event_type", term.alias("t"))
        .groupBy("event_type")
        .agg(F.round(F.sum("t"), 6).alias("psi"))
    )


#: declared candidate keys: (name, table, [key columns])
_UNIQUE_KEYS = [
    ("orders_pk", "orders", ["o_orderkey"]),
    ("lineitem_pk", "lineitem", ["l_orderkey", "l_linenumber"]),
    ("events_pk", "events", ["event_id"]),
    ("customer_pk", "customer", ["c_custkey"]),
    ("part_pk", "part", ["p_partkey"]),
]


def q_dq_uniqueness(spark, sf_dir):
    """Candidate-key uniqueness audit: for each declared key, total rows,
    distinct key values, duplicate-row count, and the pass flag — the
    primary-key contract a warehouse load verifies before publishing.

    Plan: one countDistinct aggregate per table (each an independent
    partial+final hash agg); nothing global.

    NULL join keys (r10): composite keys count distinct over a STRUCT —
    SQL row-value semantics, where (NULL, 2) is a countable key value —
    because Spark's variadic countDistinct(a, b) silently DROPS any
    tuple containing a NULL (it desugars to count(DISTINCT a, b)),
    undercounting n_keys by every half-NULL key and hiding exactly the
    violations a PK audit exists to surface.  Scalar keys keep plain
    countDistinct: both engines skip NULL scalars identically."""
    load_tables(spark, sf_dir)
    parts = []
    for name, table, cols in _UNIQUE_KEYS:
        t = spark.table(table)
        key = F.col(cols[0]) if len(cols) == 1 else F.struct(*[F.col(c) for c in cols])
        parts.append(
            t.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.countDistinct(key).alias("n_keys"),
            ).select(
                F.lit(name).alias("key_name"),
                "n_rows",
                "n_keys",
                (F.col("n_rows") - F.col("n_keys")).alias("n_dup_rows"),
                (F.col("n_rows") == F.col("n_keys")).alias("is_unique"),
            )
        )
    out = parts[0]
    for x in parts[1:]:
        out = out.unionAll(x)
    return out


def q_dq_benford(spark, sf_dir):
    """Benford's-law audit of order totals — the classic fabricated-data
    detector: the observed first-significant-digit distribution of
    o_totalprice vs the Benford expectation log10(1 + 1/d), with the
    per-digit chi-square contribution.  First digits are taken from the
    EXACT integer cents (string head of a BIGINT), so no float-log
    knife-edges enter the hash survey.

    Plan: one scan, a 9-group aggregate, broadcast total."""
    load_tables(spark, sf_dir)
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    obs = (
        spark.table("orders")
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    tot = Window.partitionBy()
    expected = F.log10(1 + 1 / F.col("digit")) * F.sum("n_obs").over(tot)
    chi2 = (F.col("n_obs") - expected) * (F.col("n_obs") - expected) / expected
    return obs.select(
        "digit",
        "n_obs",
        F.round(expected, 2).alias("n_expected"),
        F.round(chi2, 4).alias("chi2_term"),
    )


def q_dq_iqr_outliers(spark, sf_dir):
    """Tukey-fence (IQR) outlier audit per event type — the quartile
    cousin of the z-score audits: points outside [q1 - 1.5*IQR,
    q3 + 1.5*IQR] are flagged, robust to the heavy tails that wreck a
    mean/stddev fence.

    Plan: one exact percentile agg per type (q1/q3 in a single pass),
    fences derived on the tiny aggregate, one broadcast join back for
    the flag counts.  `percentile` and `quantile_cont` share linear
    interpolation, so the fences match across engines (same parity
    agg_percentiles pins)."""
    load_tables(spark, sf_dir)
    e = spark.table("events")
    q = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.25)").alias("q1"),
        F.expr("percentile(value, 0.75)").alias("q3"),
    )
    fenced = q.select(
        "event_type",
        "q1",
        "q3",
        (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo_fence"),
        (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi_fence"),
    )
    joined = e.join(F.broadcast(fenced), "event_type")
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("value") < F.col("lo_fence"), 1).otherwise(0)).alias(
            "n_low"
        ),
        F.sum(F.when(F.col("value") > F.col("hi_fence"), 1).otherwise(0)).alias(
            "n_high"
        ),
        F.round(F.first("lo_fence"), 4).alias("lo_fence"),
        F.round(F.first("hi_fence"), 4).alias("hi_fence"),
    )


QUERIES = {
    "dq_iqr_outliers": q_dq_iqr_outliers,
    "dq_uniqueness": q_dq_uniqueness,
    "dq_benford": q_dq_benford,
    "dq_drift_psi": q_dq_drift_psi,
    "dq_profile": q_dq_profile,
    "dq_referential_integrity": q_dq_referential_integrity,
    "dq_constraint_check": q_dq_constraint_check,
}


def _profile_oracle() -> str:
    sels = []
    for c, num in _PROFILE_COLS:
        if num:
            mn = f"CAST(CAST(min({c}) AS DECIMAL(18,2)) AS VARCHAR)"
            mx = f"CAST(CAST(max({c}) AS DECIMAL(18,2)) AS VARCHAR)"
        else:
            mn, mx = f"CAST(min({c}) AS VARCHAR)", f"CAST(max({c}) AS VARCHAR)"
        sels.append(
            f"SELECT '{c}' AS column, count(*) AS n_rows, "
            f"count(*) - count({c}) AS n_null, "
            f"count(DISTINCT {c}) AS n_distinct, "
            f"{mn} AS min_value, {mx} AS max_value FROM lineitem"
        )
    return " UNION ALL ".join(sels)


def _ri_oracle() -> str:
    sels = []
    for name, child, ck, parent, pk in _FKS:
        sels.append(
            f"SELECT '{name}' AS fk_name, "
            f"(SELECT count(*) FROM {child}) AS n_child, "
            f"(SELECT CAST(sum(CASE WHEN {ck} IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
            f"FROM {child}) AS n_null_key, "
            f"(SELECT count(*) FROM {child} c WHERE c.{ck} IS NOT NULL AND "
            f"NOT EXISTS (SELECT 1 FROM {parent} p WHERE p.{pk} = c.{ck})) AS n_orphan"
        )
    return " UNION ALL ".join(sels)


def _constraint_oracle() -> str:
    sels = []
    for rule, table, pred in _RULES:
        sels.append(
            f"SELECT '{rule}' AS rule, count(*) AS n_checked, "
            f"CAST(sum(CASE WHEN {pred} THEN 0 ELSE 1 END) AS BIGINT) AS n_violations, "
            f"round(CAST(sum(CASE WHEN {pred} THEN 0 ELSE 1 END) AS DOUBLE) / count(*), 6) "
            f"AS violation_rate FROM {table}"
        )
    return " UNION ALL ".join(sels)


ORACLES = {
    "dq_iqr_outliers": (
        "WITH q AS (SELECT event_type, "
        "quantile_cont(value, 0.25) AS q1, "
        "quantile_cont(value, 0.75) AS q3 FROM events GROUP BY event_type), "
        "f AS (SELECT event_type, q1 - 1.5 * (q3 - q1) AS lo_fence, "
        "q3 + 1.5 * (q3 - q1) AS hi_fence FROM q) "
        "SELECT e.event_type, count(*) AS n, "
        "CAST(sum(CASE WHEN e.value < f.lo_fence THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_low, "
        "CAST(sum(CASE WHEN e.value > f.hi_fence THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_high, "
        "round(any_value(f.lo_fence), 4) AS lo_fence, "
        "round(any_value(f.hi_fence), 4) AS hi_fence "
        "FROM events e JOIN f ON e.event_type = f.event_type "
        "GROUP BY e.event_type"
    ),
    "dq_uniqueness": "SELECT 'orders_pk' AS key_name, count(*) AS n_rows, count(DISTINCT (o_orderkey)) AS n_keys, count(*) - count(DISTINCT (o_orderkey)) AS n_dup_rows, count(*) = count(DISTINCT (o_orderkey)) AS is_unique FROM orders UNION ALL SELECT 'lineitem_pk' AS key_name, count(*) AS n_rows, count(DISTINCT (l_orderkey, l_linenumber)) AS n_keys, count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS n_dup_rows, count(*) = count(DISTINCT (l_orderkey, l_linenumber)) AS is_unique FROM lineitem UNION ALL SELECT 'events_pk' AS key_name, count(*) AS n_rows, count(DISTINCT (event_id)) AS n_keys, count(*) - count(DISTINCT (event_id)) AS n_dup_rows, count(*) = count(DISTINCT (event_id)) AS is_unique FROM events UNION ALL SELECT 'customer_pk' AS key_name, count(*) AS n_rows, count(DISTINCT (c_custkey)) AS n_keys, count(*) - count(DISTINCT (c_custkey)) AS n_dup_rows, count(*) = count(DISTINCT (c_custkey)) AS is_unique FROM customer UNION ALL SELECT 'part_pk' AS key_name, count(*) AS n_rows, count(DISTINCT (p_partkey)) AS n_keys, count(*) - count(DISTINCT (p_partkey)) AS n_dup_rows, count(*) = count(DISTINCT (p_partkey)) AS is_unique FROM part",
    "dq_benford": 'WITH d AS (SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit FROM orders), obs AS (SELECT digit, count(*) AS n_obs FROM d GROUP BY digit), t AS (SELECT sum(n_obs) AS n FROM obs) SELECT digit, n_obs, round(log10(1 + 1.0 / digit) * n, 2) AS n_expected, round((n_obs - log10(1 + 1.0 / digit) * n) ^ 2 / (log10(1 + 1.0 / digit) * n), 4) AS chi2_term FROM obs, t',
    "dq_drift_psi": (
        f"""WITH rng AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
        b AS (SELECT event_type, day(ts) <= {PSI_SPLIT_DAY} AS is_ref,
        CAST(least({PSI_BINS - 1}, floor((value - lo) / (hi - lo) * {PSI_BINS})) AS INT) AS bin
        FROM events, rng),
        c AS (SELECT event_type, bin,
        sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS n_ref,
        sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS n_cur FROM b GROUP BY 1, 2),
        p AS (SELECT event_type,
        CAST(n_ref AS DOUBLE) / sum(n_ref) OVER (PARTITION BY event_type) + {PSI_EPS} AS pr,
        CAST(n_cur AS DOUBLE) / sum(n_cur) OVER (PARTITION BY event_type) + {PSI_EPS} AS pc
        FROM c)
        SELECT event_type, round(sum((pc - pr) * ln(pc / pr)), 6) AS psi
        FROM p GROUP BY event_type"""
    ),
    "dq_profile": _profile_oracle(),
    "dq_referential_integrity": _ri_oracle(),
    "dq_constraint_check": _constraint_oracle(),
}
