"""Round-6 additions, batch 17: graph diameter estimation (double-sweep
BFS), a data-freshness audit, and code-vs-prose detection — three more
distinct capability classes (global graph metrics, staleness
monitoring, LLM corpus code filtering).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import cte, load_tables
from ..operators import algorithms

DIAM_HOPS = 6  #: BFS hop cap per sweep

#: code-detection signal thresholds (per-mille)
CODE_SYM_PM = 30      # symbol chars ({};()=<>) over all chars
CODE_KW_MIN = 1       # distinct code keywords present


def q_iter_graph_diameter(spark, sf_dir):
    """Graph diameter lower bound via the classic DOUBLE-SWEEP BFS: one
    hop-limited BFS from the minimum node, a second from the farthest
    node the first sweep reached (ties → smallest id), reporting the
    second sweep's eccentricity — the textbook 2-sweep estimator that
    is exact on trees and near-exact on real graphs, at the cost of two
    BFS passes instead of all-pairs.

    Reuses the MapReduce-shaped frontier BFS (operators.algorithms.sssp:
    per hop one co-partitioned join + min fold); the only driver
    traffic is two 1-row argmax picks.  Hash-checked: DuckDB replays
    both sweeps as chained recursive CTEs with the same hop cap and
    tie-breaks."""
    load_tables(spark, sf_dir)
    edges = spark.table("edges_pp").localCheckpoint(eager=True)
    seed = edges.agg(F.min("src")).collect()[0][0]
    if seed is None:  # empty graph: no sweep source, nothing to estimate
        return spark.createDataFrame(
            [],
            "sweep1_source int, peripheral_node int, diameter_est int, "
            "n_reached long",
        )
    s0 = int(seed)
    d1 = algorithms.sssp(edges, s0, max_hops=DIAM_HOPS)
    far = d1.orderBy(F.col("dist").desc(), "node").limit(1).collect()[0]
    u = int(far["node"])
    d2 = algorithms.sssp(edges, u, max_hops=DIAM_HOPS)
    return d2.agg(
        F.lit(s0).alias("sweep1_source"),
        F.lit(u).alias("peripheral_node"),
        F.max("dist").alias("diameter_est"),
        F.count(F.lit(1)).alias("n_reached"),
    )


def q_dq_freshness(spark, sf_dir):
    """Data-freshness audit per event type: last event timestamp, the
    integer lag in hours behind the NEWEST event anywhere in the table,
    and a staleness flag at > 24 h — the monitoring query under every
    "is this feed still alive" alert.  One partial+final agg plus a
    1-row global max joined back by cross-multiplication; lag stays in
    exact integer microseconds until the final integer-hours division."""
    load_tables(spark, sf_dir)
    ev = spark.table("events").select(
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    per_type = ev.groupBy("event_type").agg(
        F.max("us").alias("last_us"), F.count(F.lit(1)).alias("n_events")
    )
    glob = per_type.agg(F.max("last_us").alias("max_us"))
    return per_type.crossJoin(F.broadcast(glob)).select(
        "event_type",
        "n_events",
        F.timestamp_micros(F.col("last_us"))
        .cast("timestamp_ntz")
        .alias("last_event"),
        F.expr("(max_us - last_us) div 3600000000")
        .cast("long")
        .alias("lag_hours"),
        (F.col("max_us") - F.col("last_us") > 24 * 3600 * 1000000).alias(
            "is_stale"
        ),
    )


def q_text_code_detect(spark, sf_dir):
    """Code-vs-prose detection per document — the corpus-construction
    filter that routes source code away from natural-language pipelines:
    symbol density ({}();=<>[] chars per mille of text), code keywords
    present (def/return/import/var/const/function), and the verdict
    rule symbols ≥ 30‰ AND ≥ 1 keyword.
    Every signal is an exact integer count or a half-up per-mille —
    JVM-side regexp counts, no Python."""
    load_tables(spark, sf_dir)
    # complete-case: a missing document cannot be classified (the NULL
    # verdict boolean normalizes differently per engine)
    d = spark.table("documents").filter(F.col("text").isNotNull())
    n_chars = F.length("text")
    n_sym = F.regexp_count("text", F.lit(r"[{}();=<>\[\]]"))
    kw = F.regexp_count(
        "text", F.lit(r"\b(def|return|import|var|const|function)\b")
    )
    sym_pm = F.expr(
        "CASE WHEN length(text) = 0 THEN 0 "
        "ELSE (2000 * n_sym + length(text)) div (2 * length(text)) END"
    )
    return (
        d.select("doc_id", "text", n_sym.alias("n_sym"), kw.alias("n_kw"))
        .select(
            "doc_id",
            "n_sym",
            "n_kw",
            sym_pm.cast("long").alias("sym_pm"),
            (
                (sym_pm >= CODE_SYM_PM) & (F.col("n_kw") >= CODE_KW_MIN)
            ).alias("looks_like_code"),
        )
    )


QUERIES = {
    "iter_graph_diameter": q_iter_graph_diameter,
    "dq_freshness": q_dq_freshness,
    "text_code_detect": q_text_code_detect,
}

ORACLES = {
    "iter_graph_diameter": (
        cte("edges_pp")
        + ", w1(node, dist) AS ( "
        "SELECT CAST((SELECT min(src) FROM edges_pp) AS BIGINT), 0 "
        "UNION "
        "SELECT e.dst, w.dist + 1 FROM w1 w JOIN edges_pp e ON e.src = w.node "
        f"WHERE w.dist < {DIAM_HOPS}), "
        "d1 AS (SELECT node, min(dist) AS dist FROM w1 GROUP BY node), "
        "per AS (SELECT node FROM d1 ORDER BY dist DESC, node LIMIT 1), "
        "w2(node, dist) AS ( "
        "SELECT CAST((SELECT node FROM per) AS BIGINT), 0 "
        "UNION "
        "SELECT e.dst, w.dist + 1 FROM w2 w JOIN edges_pp e ON e.src = w.node "
        f"WHERE w.dist < {DIAM_HOPS}), "
        "d2 AS (SELECT node, min(dist) AS dist FROM w2 GROUP BY node) "
        "SELECT CAST((SELECT min(src) FROM edges_pp) AS BIGINT) "
        "AS sweep1_source, "
        "CAST((SELECT node FROM per) AS BIGINT) AS peripheral_node, "
        "CAST(max(dist) AS INT) AS diameter_est, "
        "count(*) AS n_reached FROM d2 "
        # empty graph: the Spark side returns no row (empty-seed guard)
        "HAVING (SELECT min(src) FROM edges_pp) IS NOT NULL"
    ).replace("WITH ", "WITH RECURSIVE ", 1),
    "dq_freshness": (
        "WITH per_type AS (SELECT event_type, "
        "max(epoch_us(ts)) AS last_us, count(*) AS n_events "
        "FROM events GROUP BY 1), "
        "g AS (SELECT max(last_us) AS max_us FROM per_type) "
        "SELECT event_type, n_events, "
        "make_timestamp(last_us) AS last_event, "
        "CAST((max_us - last_us) // 3600000000 AS BIGINT) AS lag_hours, "
        "max_us - last_us > CAST(86400 AS BIGINT) * 1000000 AS is_stale "
        "FROM per_type, g"
    ),
    "text_code_detect": (
        "WITH sig AS (SELECT doc_id, length(text) AS n_chars, "
        "length(text) - length(regexp_replace(text, "
        "'[{}();=<>\\[\\]]', '', 'g')) AS n_sym, "
        "len(regexp_extract_all(text, "
        "'\\b(def|return|import|var|const|function)\\b')) AS n_kw "
        "FROM documents WHERE text IS NOT NULL) "
        "SELECT doc_id, CAST(n_sym AS BIGINT) AS n_sym, "
        "CAST(n_kw AS BIGINT) AS n_kw, "
        "CAST(CASE WHEN n_chars = 0 THEN 0 "
        "ELSE (2000 * n_sym + n_chars) // (2 * n_chars) END AS BIGINT) "
        "AS sym_pm, "
        "(CASE WHEN n_chars = 0 THEN 0 "
        f"ELSE (2000 * n_sym + n_chars) // (2 * n_chars) END) >= {CODE_SYM_PM} "
        f"AND n_kw >= {CODE_KW_MIN} AS looks_like_code "
        "FROM sig"
    ),
}


# =================================================================
# Group D — Kaplan-Meier survival (churn analysis)
# =================================================================

KM_CHURN_DAYS = 90  #: quiet for 90+ days before the dataset edge = churned


def q_agg_survival_km(spark, sf_dir):
    """Kaplan-Meier survival curve of customer lifetime: T = days
    between a customer's first and last order; the customer counts as a
    CHURN EVENT at T if their last order is 90+ days before the dataset
    edge, otherwise they are right-CENSORED (still alive when the data
    ends) — the product-limit estimator S(t) = Π_{t_i≤t} (1 − d_i/n_i)
    under every churn/retention model.

    Exactness: d_i and n_i are exact integers (at-risk via a cumulative
    window over the bounded lifetime grain); each factor is ONE IEEE
    division, and the running product folds the factor list in
    ascending-t frame order on BOTH engines (Spark `aggregate`, DuckDB
    scalar `list_reduce` — the struct in-place pitfall does not apply
    to scalar accumulators), so the doubles agree bit-for-bit before
    the final 6 dp rounding."""
    load_tables(spark, sf_dir)
    from pyspark.sql import Window as W

    o = spark.table("orders").select("o_custkey", "o_orderdate")
    span = o.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("first_dt"),
        F.max("o_orderdate").alias("last_dt"),
    )
    edge = o.agg(F.max("o_orderdate").alias("edge_dt"))
    life = span.crossJoin(F.broadcast(edge)).select(
        F.datediff("last_dt", "first_dt").alias("t"),
        (
            F.datediff("edge_dt", "last_dt") >= KM_CHURN_DAYS
        ).cast("int").alias("churned"),
    )
    grain = life.groupBy("t").agg(
        F.sum("churned").alias("d"),
        F.count(F.lit(1)).alias("c"),
    )
    total = grain.agg(F.sum("c").alias("n_total"))
    w = W.orderBy("t").rowsBetween(W.unboundedPreceding, -1)
    wf = W.orderBy("t").rowsBetween(W.unboundedPreceding, 0)
    lined = grain.crossJoin(F.broadcast(total)).select(
        "t",
        "d",
        "c",
        (
            F.col("n_total") - F.coalesce(F.sum("c").over(w), F.lit(0))
        ).alias("n_risk"),
    )
    factored = lined.select(
        "t",
        "d",
        "n_risk",
        F.collect_list(
            F.lit(1.0) - F.col("d") / F.col("n_risk")
        ).over(wf).alias("fs"),
    )
    surv = F.expr(
        "aggregate(slice(fs, 2, size(fs) - 1), element_at(fs, 1), "
        "(acc, x) -> acc * x)"
    )
    return factored.select(
        "t",
        "d",
        "n_risk",
        F.round(surv, 6).alias("survival"),
    )


QUERIES["agg_survival_km"] = q_agg_survival_km

ORACLES["agg_survival_km"] = (
    "WITH span AS (SELECT o_custkey, min(o_orderdate) AS first_dt, "
    "max(o_orderdate) AS last_dt FROM orders GROUP BY 1), "
    "edge AS (SELECT max(o_orderdate) AS edge_dt FROM orders), "
    "life AS (SELECT date_diff('day', first_dt, last_dt) AS t, "
    f"CASE WHEN date_diff('day', last_dt, edge_dt) >= {KM_CHURN_DAYS} "
    "THEN 1 ELSE 0 END AS churned FROM span, edge), "
    "grain AS (SELECT t, sum(churned) AS d, count(*) AS c FROM life "
    "GROUP BY t), "
    "tot AS (SELECT sum(c) AS n_total FROM grain), "
    "lined AS (SELECT t, d, c, n_total - coalesce(sum(c) OVER "
    "(ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
    "AS n_risk FROM grain, tot), "
    "factored AS (SELECT t, d, n_risk, "
    "list(1.0 - CAST(d AS DOUBLE) / n_risk) OVER "
    "(ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fs "
    "FROM lined) "
    "SELECT t, CAST(d AS BIGINT) AS d, CAST(n_risk AS BIGINT) AS n_risk, "
    "round(list_reduce(fs, (acc, x) -> acc * x), 6) AS survival "
    "FROM factored"
)


# =================================================================
# Group D — Poisson-bootstrap confidence interval
# =================================================================

BOOT_B = 200  #: bootstrap replicates

#: Poisson(1) inverse-CDF ladder: cumulative e^-1 * 1/k! thresholds.
#: The uniform is an exact md5-derived 56-bit integer scaled by 2^-56
#: (one IEEE multiply by a power of two — exact), so both engines step
#: the SAME ladder on the SAME doubles and draw identical weights.
_POIS_CUM = [
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
    0.9999897508033253,
]
_BOOT_SCALE = float(2 ** 56)


def _pois_case(u_expr: str) -> str:
    """CASE ladder mapping a uniform to a Poisson(1) draw (capped at 8,
    cumulative tail mass < 1.1e-5) — identical SQL text both dialects."""
    branches = " ".join(
        f"WHEN {u_expr} < {t!r} THEN {k}" for k, t in enumerate(_POIS_CUM)
    )
    return f"(CASE {branches} ELSE 8 END)"


def q_agg_bootstrap_ci(spark, sf_dir):
    """95% bootstrap confidence interval for the mean order value via
    the POISSON BOOTSTRAP — the resampling scheme that actually scales:
    classic bootstrap resamples n rows with replacement (a global
    shuffle per replicate), while Poisson(1) weights are drawn
    INDEPENDENTLY per (row, replicate) map-side, so 200 replicates cost
    one generate + one partial+final agg to 200 rows, no data movement
    beyond the 200-row collapse.

    Determinism: weights come from the portable md5 coin (same 56-bit
    integer on both engines), the uniform scaling is an exact
    power-of-two multiply, and the ladder thresholds are shared
    literals — so every replicate's integer (Σw·cents, Σw) pair is
    identical cross-engine; the replicate means and the interpolated
    2.5/97.5 percentiles then agree bit-for-bit before rounding."""
    from .r6_ops import _md5_le

    load_tables(spark, sf_dir)
    o = spark.table("orders").select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    rep = o.select(
        "o_orderkey",
        "cents",
        F.explode(F.sequence(F.lit(1), F.lit(BOOT_B))).alias("b"),
    )
    u = (
        _md5_le(
            F.concat(
                F.col("o_orderkey").cast("string"),
                F.lit(":"),
                F.col("b").cast("string"),
            ),
            7,
        )
        / F.lit(_BOOT_SCALE)
    )
    weighted = (
        rep.withColumn("u", u)
        .select("b", "cents", F.expr(_pois_case("u")).alias("w"))
    )
    # try_divide: a tiny input can draw all-zero Poisson weights in a
    # replicate (sum w = 0) — that replicate's mean is NULL on both
    # engines (DuckDB x/0 is NULL)
    means = weighted.groupBy("b").agg(
        F.try_divide(F.sum(F.col("w") * F.col("cents")), F.sum("w")).alias("m")
    )
    point = o.agg((F.sum("cents") / F.count(F.lit(1))).alias("pm"))
    return means.crossJoin(F.broadcast(point)).agg(
        F.count(F.lit(1)).alias("n_replicates"),
        F.round(F.max("pm") / 100.0, 4).alias("point_mean"),
        F.round(F.expr("percentile(m, 0.025)") / 100.0, 4).alias("ci_lo"),
        F.round(F.expr("percentile(m, 0.975)") / 100.0, 4).alias("ci_hi"),
    )


QUERIES["agg_bootstrap_ci"] = q_agg_bootstrap_ci

from .r6_ops import _md5_le_sql as _mls  # noqa: E402

ORACLES["agg_bootstrap_ci"] = (
    "WITH rep AS (SELECT o_orderkey, "
    "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents, "
    f"b FROM orders, generate_series(1, {BOOT_B}) AS t(b)), "
    "u AS (SELECT b, cents, "
    + _mls("CAST(o_orderkey AS VARCHAR) || ':' || CAST(b AS VARCHAR)", 7)
    + f" / {_BOOT_SCALE!r} AS u FROM rep), "
    f"w AS (SELECT b, cents, {_pois_case('u')} AS w FROM u), "
    "means AS (SELECT b, sum(w * cents) / CAST(sum(w) AS DOUBLE) AS m "
    "FROM w GROUP BY b), "
    "pt AS (SELECT sum(cents) / CAST(count(*) AS DOUBLE) AS pm FROM orders, "
    "LATERAL (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 "
    "AS BIGINT) AS cents) _) "
    "SELECT count(*) AS n_replicates, "
    "round(max(pm) / 100.0, 4) AS point_mean, "
    "round(quantile_cont(m, 0.025) / 100.0, 4) AS ci_lo, "
    "round(quantile_cont(m, 0.975) / 100.0, 4) AS ci_hi "
    "FROM means, pt"
)


# =================================================================
# Group T — Wald-Wolfowitz runs test (randomness diagnostic)
# =================================================================


def q_ts_runs_test(spark, sf_dir):
    """Wald-Wolfowitz runs test on the daily-revenue series: each day
    codes above/below the series MEDIAN (median-valued days drop, the
    standard convention), runs = maximal same-sign stretches, and the
    z-score against the null of exchangeability — "is this series
    random or does it trend/oscillate", the diagnostic that decides
    whether the TA machinery upstream is even applicable.

    Exactness: the median is an exact multiple of 1/2 cent (x2 ints),
    signs and the run count come from integer comparisons and one lag,
    n1/n2/runs are exact integers, and the only floats are the final
    mean/variance/z expressions evaluated from those integers in one
    fixed shape on both engines."""
    from pyspark.sql import Window as W

    load_tables(spark, sf_dir)
    o = spark.table("orders")
    daily = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day")
    ).agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
        ).alias("cents")
    )
    med = daily.agg(
        F.round(F.expr("percentile(cents, 0.5) * 2")).cast("long").alias("m2")
    )
    signed = (
        daily.crossJoin(F.broadcast(med))
        .filter(2 * F.col("cents") != F.col("m2"))
        .select(
            "day", (2 * F.col("cents") > F.col("m2")).cast("int").alias("s")
        )
    )
    w = W.orderBy("day")
    runs = signed.select(
        "s",
        F.when(
            F.lag("s").over(w).isNull() | (F.lag("s").over(w) != F.col("s")),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    agg = runs.agg(
        F.sum("s").alias("n1"),
        F.sum(F.lit(1) - F.col("s")).alias("n2"),
        F.sum("new_run").alias("r"),
        # the z statistic needs both sign classes (one-sided survivors
        # make var=0 -> ANSI DIVIDE_BY_ZERO where DuckDB yields NULL);
        # on a degenerate series there is no verdict row — mirrored by
        # the oracle's WHERE below
    ).filter((F.col("n1") > 0) & (F.col("n2") > 0))
    mu = F.lit(1.0) + 2.0 * F.col("n1") * F.col("n2") / (
        F.col("n1") + F.col("n2")
    )
    var = (
        2.0
        * F.col("n1")
        * F.col("n2")
        * (2.0 * F.col("n1") * F.col("n2") - F.col("n1") - F.col("n2"))
        / (
            (F.col("n1") + F.col("n2"))
            * (F.col("n1") + F.col("n2"))
            * (F.col("n1") + F.col("n2") - 1.0)
        )
    )
    return agg.select(
        "n1",
        "n2",
        "r",
        F.round((F.col("r") - mu) / F.sqrt(var), 4).alias("z"),
        (F.abs((F.col("r") - mu) / F.sqrt(var)) > 1.96).alias(
            "rejects_randomness"
        ),
    )


QUERIES["ts_runs_test"] = q_ts_runs_test

ORACLES["ts_runs_test"] = (
    "WITH daily AS (SELECT strftime(o_orderdate, '%Y-%m-%d') AS day, "
    "sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) "
    "AS cents FROM orders GROUP BY 1), "
    "med AS (SELECT CAST(round(quantile_cont(cents, 0.5) * 2) AS BIGINT) "
    "AS m2 FROM daily), "
    "signed AS (SELECT day, CAST(2 * cents > m2 AS INT) AS s "
    "FROM daily, med WHERE 2 * cents <> m2), "
    "runs AS (SELECT s, CASE WHEN lag(s) OVER (ORDER BY day) IS NULL "
    "OR lag(s) OVER (ORDER BY day) <> s THEN 1 ELSE 0 END AS new_run "
    "FROM signed), "
    "agg AS (SELECT CAST(sum(s) AS BIGINT) AS n1, "
    "CAST(sum(1 - s) AS BIGINT) AS n2, CAST(sum(new_run) AS BIGINT) AS r "
    "FROM runs) "
    "SELECT n1, n2, r, "
    "round((r - (1.0 + 2.0 * n1 * n2 / (n1 + n2))) / "
    "sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2) / "
    "((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))), 4) AS z, "
    "abs((r - (1.0 + 2.0 * n1 * n2 / (n1 + n2))) / "
    "sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2) / "
    "((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0)))) > 1.96 "
    "AS rejects_randomness FROM agg "
    "WHERE n1 > 0 AND n2 > 0"
)
