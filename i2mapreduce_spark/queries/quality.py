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

from pyspark.sql import functions as F

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


QUERIES = {
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
    "dq_profile": _profile_oracle(),
    "dq_referential_integrity": _ri_oracle(),
    "dq_constraint_check": _constraint_oracle(),
}
