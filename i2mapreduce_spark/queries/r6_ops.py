"""Round-6 surface additions — 16 keys spanning corpus dedup/sampling,
sketching, time-series statistics, TA windows, data-layout primitives
and ingestion semantics.  Registered via _GROUP_MODULES like every other
group module; keys are grouped under their SURVEY §2B letters.

Portable-hash discipline (used by several keys here): the little-endian
integer of md5 bytes 8.. of a key is computable in BOTH engines —
DuckDB `md5_number_lower(k) % 2^(8b)` == Spark
`sum_i conv(substr(md5(k), 17+2i, 2), 16, 10) * 256^i` for the first b
of those bytes — so deterministic sampling and sketch bucket choices
hash-compare exactly across engines (no xxhash64, which is
Spark-private, and no salted python hash()).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import Window, functions as F

from ..catalog import load_tables

# ---------------------------------------------------------------- helpers


def _md5_le(col, n_bytes: int):
    """Little-endian integer of the first `n_bytes` of md5(col)'s lower
    8 bytes (hex chars 17+) — equals DuckDB md5_number_lower(col) %
    256^n_bytes.  JVM-side only: conv/substr/md5 are builtin exprs."""
    h = F.md5(col)
    acc = None
    for i in range(n_bytes):
        term = F.conv(F.substring(h, 17 + 2 * i, 2), 16, 10).cast("long") * (
            256 ** i
        )
        acc = term if acc is None else acc + term
    return acc


def _md5_le_sql(expr: str, n_bytes: int) -> str:
    """DuckDB twin of _md5_le."""
    return f"(md5_number_lower({expr}) % {256 ** n_bytes})"


# =================================================================
# Group L — corpus construction / dedup / embeddings
# =================================================================

#: chunk size (words) for sub-document dedup
PARA_CHUNK_WORDS = 20


def q_dedup_paragraph(spark, sf_dir):
    """Sub-document (paragraph-level) exact dedup — the RefinedWeb/
    CCNet-style pass that removes boilerplate chunks ACROSS documents
    while keeping the containing docs: split every document into fixed
    20-word chunks (the fixture's documents are single-line word
    streams, so chunking stands in for paragraph splitting), keep each
    distinct chunk only at its first (doc_id, chunk_idx) occurrence, and
    report per-document survival.

    100 TB shape: one explode (rows = chunks, each carries ~20 words,
    never the whole doc body twice), one first-occurrence window keyed
    by the chunk HASH (16-byte md5 shuffles, not chunk text), one
    per-doc re-aggregation.  All JVM-side expressions."""
    load_tables(spark, sf_dir)
    d = spark.table("documents")
    words = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(words) / float(PARA_CHUNK_WORDS)).cast("int")
    chunks = (
        d.select(
            "doc_id",
            F.posexplode(
                F.expr(
                    "transform(sequence(0, int(ceil(size(split(text,' '))"
                    f"/{PARA_CHUNK_WORDS}.0)) - 1), i -> "
                    f"array_join(slice(split(text,' '), i*{PARA_CHUNK_WORDS}+1, "
                    f"{PARA_CHUNK_WORDS}), ' '))"
                )
            ).alias("chunk_idx", "chunk"),
        )
        .withColumn("h", F.md5("chunk"))
    )
    w = Window.partitionBy("h").orderBy("doc_id", "chunk_idx")
    kept = chunks.withColumn(
        "is_first", (F.row_number().over(w) == 1).cast("long")
    )
    return (
        kept.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("is_first").alias("n_kept"),
        )
        .withColumn(
            "keep_ratio",
            F.round(F.col("n_kept") / F.col("n_chunks"), 4),
        )
    )


def q_pipeline_importance_sample(spark, sf_dir):
    """Deterministic importance sampling by a per-document acceptance
    probability (longer docs kept more often: p = min(n_chars, 1000)/
    1000) — the quality-weighted downsampling step of a corpus mixer,
    made engine-independent by the portable md5 coin: accept iff
    (md5_le16(doc_id) * 1000) < (p * 1000) * 65536, compared entirely in
    integers.  Unlike rand()-based sampling this is reproducible across
    engines, retries and repartitioning, and pushes down as a scan
    filter at 100 TB."""
    load_tables(spark, sf_dir)
    d = spark.table("documents")
    coin = _md5_le(F.col("doc_id").cast("string"), 2)  # 0..65535
    p_millis = F.least(F.col("n_chars"), F.lit(1000))  # p * 1000
    return (
        d.filter(coin * 1000 < p_millis * 65536)
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").alias("sampled_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


def q_text_vocab_growth(spark, sf_dir):
    """Vocabulary growth (Heaps'-law) curve: scanning documents in
    doc_id order, the cumulative token count and cumulative DISTINCT
    vocabulary size after each document.  The tokenizer-budget planning
    stat for corpus construction.

    Distributed shape: 'running distinct' is NOT computed with a global
    running set — each word contributes at its FIRST document
    (min(doc_id) per word, one partial+final agg over exploded tokens),
    then the per-doc first-word counts prefix-sum over the doc spine via
    the chunked-offset construction (operators/ranking.py:
    global_running_sum) — the doc spine SCALES WITH DATA, so an
    unpartitioned cumulative window here would be the classic
    single-partition scale bug.  Token explosion shuffles bounded words,
    never doc bodies."""
    from ..operators.ranking import global_running_sum

    load_tables(spark, sf_dir)
    d = spark.table("documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("w")
    ).filter(F.col("w") != "")
    first = toks.groupBy("w").agg(F.min("doc_id").alias("first_doc"))
    new_per_doc = first.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("new_words")
    )
    toks_per_doc = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_toks")
    )
    per_doc = (
        toks_per_doc.join(new_per_doc, "doc_id", "left")
        .fillna(0, ["new_words"])
    )
    return global_running_sum(per_doc, ["doc_id"], ["n_toks", "new_words"]).select(
        "doc_id",
        F.col("cum_n_toks").alias("cum_tokens"),
        F.col("cum_new_words").alias("vocab_size"),
    )


#: Matryoshka prefix lengths probed (full dim is 64 in the fixture)
MATRYOSHKA_DIMS = [8, 16, 32, 64]


def q_embedding_matryoshka_truncate(spark, sf_dir):
    """Matryoshka-style truncation audit: for each embedding and each
    prefix length d in {8,16,32,64}, the share of the vector's L2 energy
    captured by the first d dimensions — the measurement behind choosing
    a truncated serving dimension.  Per-vector output (no cross-row
    float aggregation, so the only floats are one fold per row of
    identical operands on both engines: float32 elements are cast to
    DOUBLE before squaring, per the cross-engine list-math contract)."""
    load_tables(spark, sf_dir)
    e = spark.table("embeddings")
    sq = (
        "aggregate(slice(embedding, 1, {d}), CAST(0.0 AS DOUBLE), "
        "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
    )
    full = F.expr(sq.format(d=64))
    rows = [
        e.select(
            "vec_id",
            F.lit(d).alias("dim"),
            F.round(F.expr(sq.format(d=d)) / full, 6).alias("energy_share"),
        )
        for d in MATRYOSHKA_DIMS
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


#: MMR parameters: fixed bounded query set, candidate pool, picks
MMR_N_QUERIES = 20
MMR_CANDS = 8
MMR_K = 3
MMR_LAMBDA = 0.7


def q_sim_mmr_rerank(spark, sf_dir):
    """Maximal Marginal Relevance re-ranking — the diversity-aware
    selection used when sampling near-duplicate-free exemplars from a
    candidate pool: for each of a bounded query set (vec_id < 20), take
    the top-8 cosine candidates, then greedily pick 3 maximizing
    λ·sim(q,c) − (1−λ)·max_{s∈picked} sim(c,s), λ=0.7.

    Plan: the bounded query block broadcasts against the corpus (one
    pass, no all-pairs), per-query top-8 via ranked window on the
    (query × corpus) sims, then the 8-candidate greedy runs inside one
    applyInPandas group per query (8x8 numpy matmul — trivially
    bounded).  Rows-only by design (greedy argmax chains are not
    SQL-expressible); pytest replays the greedy in pure numpy and
    asserts identical picks."""
    import numpy as np
    import pandas as pd

    load_tables(spark, sf_dir)
    e = spark.table("embeddings")
    q = e.filter(F.col("vec_id") < MMR_N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    dot = F.expr(
        "aggregate(zip_with(q_vec, embedding, (a, b) -> "
        "CAST(a AS DOUBLE) * CAST(b AS DOUBLE)), "
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    nrm = (
        "sqrt(aggregate({v}, CAST(0.0 AS DOUBLE), "
        "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    )
    sims = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
        .withColumn(
            "sim",
            dot / (F.expr(nrm.format(v="q_vec")) * F.expr(nrm.format(v="embedding"))),
        )
        .select("q_id", "q_vec", "vec_id", "embedding", "sim")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), "vec_id")
    cands = sims.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= MMR_CANDS
    )

    def mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rn").reset_index(drop=True)
        V = np.stack(pdf["embedding"].map(np.asarray)).astype(np.float64)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        cc = Vn @ Vn.T  # candidate-candidate cosine
        rel = pdf["sim"].to_numpy()
        picked: list[int] = []
        for _ in range(min(MMR_K, len(pdf))):
            best, best_score = None, None
            for i in range(len(pdf)):
                if i in picked:
                    continue
                div = max(cc[i][j] for j in picked) if picked else 0.0
                score = MMR_LAMBDA * rel[i] - (1 - MMR_LAMBDA) * div
                if best is None or score > best_score:
                    best, best_score = i, score
            picked.append(best)
        return pd.DataFrame(
            {
                "q_id": pdf["q_id"].iloc[0],
                "rank": range(1, len(picked) + 1),
                "picked_id": pdf["vec_id"].iloc[picked].to_numpy(),
            }
        )

    return cands.groupBy("q_id").applyInPandas(
        mmr, schema="q_id long, rank int, picked_id long"
    )


# =================================================================
# Group D — sketches / weighted aggregation
# =================================================================

#: count-min sketch geometry: d rows x w buckets
CMS_DEPTH = 4
CMS_WIDTH = 256
CMS_TOPK = 10


def q_agg_count_min_sketch(spark, sf_dir):
    """Count-Min sketch heavy-hitter estimation, built portably: d=4
    hash rows x w=256 buckets, bucket_i(key) = byte i of md5(key)'s
    lower 8 bytes (w=256 means one digest BYTE per depth row, so all
    four bucket choices come from ONE md5 per fact row — the r8 rewrite
    of the original md5(key||'#i')-per-depth form, which hashed the
    fact d times for the same sketch quality; at 100 TB the fact-scan
    hash cost is the build cost).  Sketch cell = count per (row,
    bucket) — a mergeable O(d·w) summary whose build is ONE
    partial+final aggregate over the fact (map-side combine; each
    executor emits at most d·w=1024 partial cells).  Estimates for the
    exact top-10 parts: est(k) = min_i cell[i][bucket_i(k)].  The
    portable byte extraction (Spark conv/substring of the md5 hex ==
    DuckDB md5_number_lower byte shifts) keeps estimates BIT-IDENTICAL
    across engines (hash-checked, unlike the usual rows-only sketch
    keys); the CMS guarantee est-true <= eps·N is pytest-asserted."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem")
    key = F.col("l_partkey").cast("string")

    def depth_buckets(key_col):
        # one md5; depth i reads hex chars 17+2i..18+2i (byte i of the
        # lower 8 bytes, the same bytes md5_number_lower exposes)
        h = F.md5(key_col)
        return F.array(
            *[
                F.struct(
                    F.lit(i).alias("depth"),
                    F.conv(F.substring(h, 17 + 2 * i, 2), 16, 10)
                    .cast("long")
                    .alias("bucket"),
                )
                for i in range(CMS_DEPTH)
            ]
        )

    # sketch build: ONE fact scan — the d bucket choices explode to
    # (depth, bucket) rows (x d, but map-side combine collapses each
    # task's output to <= d*w partial cells), one partial+final agg.
    # A per-depth groupBy would re-scan the fact d times.
    cells = (
        li.select(F.explode(depth_buckets(key)).alias("db"))
        .groupBy("db.depth", "db.bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # exact top-10 parts (ties -> smaller key): the second (and last)
    # fact scan; the d probe buckets explode from the 10-row result
    top = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(F.col("true_cnt").desc(), "l_partkey")
            ),
        )
        .filter(F.col("rn") <= CMS_TOPK)
        .drop("rn")
    )
    probes = top.select(
        "l_partkey",
        "true_cnt",
        F.explode(depth_buckets(F.col("l_partkey").cast("string"))).alias(
            "db"
        ),
    ).select("l_partkey", "true_cnt", "db.depth", "db.bucket")
    return (
        probes.join(cells, ["depth", "bucket"])
        .groupBy("l_partkey", "true_cnt")
        .agg(F.min("cnt").alias("est_cnt"))
    )


def q_agg_weighted_percentile(spark, sf_dir):
    """Quantity-weighted price percentiles per return flag (lower
    weighted percentile: the smallest price whose cumulative weight
    reaches q·W) — the weighted distribution summary behind
    'what price point covers 75% of shipped units'.  Entirely exact:
    weights are integer quantities, thresholds compare 100·cumw >= q·W
    in integers, and the picked price is a data value (no
    interpolation), so both engines agree bit-for-bit."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").cast("decimal(18,2)").alias("price"),
        F.col("l_quantity").cast("decimal(9,0)").cast("long").alias("qty"),
    )
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("price")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = Window.partitionBy("l_returnflag")
    # pre-aggregate to one row per (flag, price): the window then runs
    # over distinct prices, not raw lineitems
    g = (
        li.groupBy("l_returnflag", "price")
        .agg(F.sum("qty").alias("qsum"))
        .select(
            "l_returnflag",
            "price",
            F.sum("qsum").over(w).alias("cumw"),
            F.sum("qsum").over(tot).alias("totw"),
        )
    )
    out = None
    for pct in (25, 50, 75):
        p = (
            g.filter(100 * F.col("cumw") >= pct * F.col("totw"))
            .groupBy("l_returnflag")
            .agg(F.min("price").alias("v"))
            .select(
                "l_returnflag",
                F.lit(pct).alias("pct"),
                F.col("v").cast("double").alias("value"),
            )
        )
        out = p if out is None else out.unionByName(p)
    return out


# =================================================================
# Group T — time-series statistics
# =================================================================


def q_ts_cusum_changepoint(spark, sf_dir):
    """CUSUM change-point detection per event type: over the daily value
    sums, the day k maximizing |S_k| where S_k = Σ_{i<=k}(x_i - mean).
    Exact-arithmetic formulation: x_i are DECIMAL(18,6) day sums (cast
    before summing — order-free), and S_k is compared via T_k =
    n·cumsum_k − k·total (all exact DECIMAL; the only double is the
    final reported statistic).  The day grain bounds the window input at
    any SF (span days, not fact rows)."""
    load_tables(spark, sf_dir)
    e = spark.table("events")
    daily = e.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("x"))
    wtot = Window.partitionBy("event_type")
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    scored = daily.select(
        "event_type",
        "day",
        (
            F.count(F.lit(1)).over(wtot) * F.sum("x").over(wcum)
            - F.row_number().over(Window.partitionBy("event_type").orderBy("day"))
            * F.sum("x").over(wtot)
        ).alias("t"),
        F.count(F.lit(1)).over(wtot).alias("n"),
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("t")).desc(), "day"
    )
    return (
        scored.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("day").alias("change_day"),
            F.round((F.col("t") / F.col("n")).cast("double"), 4).alias(
                "cusum_stat"
            ),
        )
    )


#: cross-correlation lags probed (hours)
XCORR_LAGS = [0, 1, 2, 3]


def q_ts_cross_correlation(spark, sf_dir):
    """Lagged cross-correlation between the hourly click and purchase
    count series: for lag k in 0..3, corr(x_t, y_{t+k}) from the
    integer-sum identity (n·Σxy − ΣxΣy over the sqrt product) — the
    lead/lag co-movement scan behind 'do clicks predict purchases k
    hours later'.  All operands are exact integers; one double division
    per lag.  The hourly spine bounds every window/join at any SF."""
    load_tables(spark, sf_dir)
    e = spark.table("events")
    hourly = (
        e.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(F.date_format("ts", "yyyy-MM-dd HH").alias("hr"))
        .agg(
            F.sum((F.col("event_type") == "click").cast("long")).alias("x"),
            F.sum((F.col("event_type") == "purchase").cast("long")).alias("y"),
        )
        .withColumn("idx", F.row_number().over(Window.orderBy("hr")))
    )
    a = hourly.select("idx", "x")
    out = None
    for k in XCORR_LAGS:
        b = hourly.select((F.col("idx") - k).alias("idx"), F.col("y").alias("yk"))
        j = a.join(b, "idx")
        stats = j.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("yk").alias("sy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("yk") * F.col("yk")).alias("syy"),
            F.sum(F.col("x") * F.col("yk")).alias("sxy"),
        )
        num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
            "double"
        )
        vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
            "double"
        )
        vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
            "double"
        )
        r = stats.select(
            F.lit(k).alias("lag"),
            F.col("n").alias("n_pairs"),
            F.when(
                (vx > 0) & (vy > 0),
                F.round(num / (F.sqrt(vx) * F.sqrt(vy)), 6) + F.lit(0.0),
            ).alias("rho"),
        )
        out = r if out is None else out.unionByName(r)
    return out


def q_ts_mann_kendall(spark, sf_dir):
    """Mann-Kendall trend test per event type over the daily MEAN value:
    S = Σ_{i<j} sign(x_j − x_i), τ = S / (n(n-1)/2) — the standard
    nonparametric 'is this KPI trending' test.  Day means are compared
    via cross-multiplication of exact DECIMAL day sums (s_j·c_i vs
    s_i·c_j), so no float enters the comparison; the O(days²) self-join
    is bounded by the SPAN (31 days at any SF in this fixture; a year is
    ~133k pairs), never by fact rows."""
    load_tables(spark, sf_dir)
    e = spark.table("events")
    daily = e.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,6)")).alias("s"),
        F.count(F.lit(1)).alias("c"),
    )
    a = daily.select(
        "event_type",
        F.col("day").alias("di"),
        F.col("s").alias("si"),
        F.col("c").alias("ci"),
    )
    b = daily.select(
        "event_type",
        F.col("day").alias("dj"),
        F.col("s").alias("sj"),
        F.col("c").alias("cj"),
    )
    pairs = a.join(b, "event_type").filter(F.col("di") < F.col("dj"))
    lhs = F.col("sj") * F.col("ci")
    rhs = F.col("si") * F.col("cj")
    sgn = F.when(lhs > rhs, 1).when(lhs < rhs, -1).otherwise(0)
    return (
        pairs.groupBy("event_type")
        .agg(
            F.sum(sgn).alias("s_stat"),
            F.countDistinct("di").alias("nd"),
        )
        .select(
            "event_type",
            (F.col("nd") + 1).alias("n_days"),
            F.col("s_stat").cast("long").alias("s_stat"),
            F.round(
                F.col("s_stat")
                / ((F.col("nd") + 1) * F.col("nd") / 2.0),
                6,
            ).alias("tau"),
        )
    )


def q_ts_gap_stats(spark, sf_dir):
    """Inter-event gap distribution per event type: p50/p95 of the
    per-user gaps between consecutive events, in integer microseconds
    (exact lag diffs; the percentile interpolation is the engines'
    shared quantile_cont contract).  The session-cadence profile behind
    timeout tuning.  One window partitioned by (user, type) — fact-
    scale but perfectly partitionable — then a day-bounded aggregate."""
    load_tables(spark, sf_dir)
    e = spark.table("events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = (
        e.select(
            "event_type",
            (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.lag(F.unix_micros(F.col("ts").cast("timestamp")), 1).over(w)
            ).alias("gap_us"),
        )
        .filter(F.col("gap_us").isNotNull())
    )
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.expr("percentile(gap_us, 0.5)").alias("p50_gap_us"),
        F.expr("percentile(gap_us, 0.95)").alias("p95_gap_us"),
    )


# =================================================================
# Group W — TA windows
# =================================================================

#: Donchian channel lookback (days)
DONCH_N = 20


def q_window_donchian(spark, sf_dir):
    """Donchian channel breakouts over the daily-revenue series: 20-day
    rolling high/low of the PRIOR window (frame excludes the current
    row, as the breakout definition requires) and each day classified
    breakout_high / breakout_low / inside.  Unlike Bollinger this is
    min/max arithmetic — exact at any scale, no float discipline needed
    beyond the final double cast.  Pre-aggregated to the bounded day
    grain before the ordered window (the percent_of_total pattern)."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    daily = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    w = Window.orderBy("day").rowsBetween(-DONCH_N, -1)
    framed = daily.select(
        "day",
        "rev",
        F.count(F.lit(1)).over(w).alias("n"),
        F.max("rev").over(w).alias("hi"),
        F.min("rev").over(w).alias("lo"),
    ).filter(F.col("n") == DONCH_N)
    return framed.select(
        "day",
        F.col("rev").cast("double").alias("revenue"),
        F.col("hi").cast("double").alias("upper"),
        F.col("lo").cast("double").alias("lower"),
        F.when(F.col("rev") > F.col("hi"), "breakout_high")
        .when(F.col("rev") < F.col("lo"), "breakout_low")
        .otherwise("inside")
        .alias("signal"),
    )


def q_window_vwap(spark, sf_dir):
    """Cumulative VWAP (volume-weighted average price) over the ship-day
    axis, per return flag: cum(Σ price·qty)/cum(Σ qty) with both
    cumulative sums exact integer CENTS (day-grain pre-aggregation,
    ordered running frames are sequential and engine-identical), plus
    the day's own avg price and its position vs VWAP.  The execution-
    quality benchmark of every trading system, over the lineitem fact.
    Float discipline: both reported 4-dp values round HALF-UP in integer
    space ((2x+y) div (2y), the RSI trick — p/n quotients land exactly
    on 4-dp ties, which double-rounding flips per engine), and the
    above/below/at classification is a cross-multiplied integer
    comparison (pc·cq vs cpqc·n·100) — no float anywhere."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem")
    daily = li.groupBy(
        "l_returnflag", F.date_format("l_shipdate", "yyyy-MM-dd").alias("day")
    ).agg(
        F.sum(
            (
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_quantity").cast("decimal(9,0)")
                * 100
            ).cast("long")
        ).alias("pqc"),
        F.sum(F.col("l_quantity").cast("decimal(9,0)").cast("long")).alias("q"),
        F.sum(
            (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
        ).alias("pc"),
        F.count(F.lit(1)).alias("n"),
    )
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # cumulative price-cent-quantity sums and their x10^4 products run
    # in DECIMAL(38,0) (r10 extreme-magnitude sweep): cpqc alone passes
    # 1e19 at 1e6-scaled prices — and at plain sf1000 the lifetime
    # cumulative would too; the div quotients (4-dp prices) stay small
    cum = daily.select(
        "l_returnflag",
        "day",
        F.sum(F.col("pqc").cast("decimal(38,0)")).over(w).alias("cpqc"),
        F.sum("q").over(w).alias("cq"),
        "pc",
        "n",
    )
    return cum.select(
        "l_returnflag",
        "day",
        # vwap = cpqc/(100*cq); x10^4 half-up in integers
        (
            F.expr(
                "((2 * cpqc * 10000 + 100 * cq) "
                " - (2 * cpqc * 10000 + 100 * cq) % (2 * 100 * cq)) "
                "/ (2 * 100 * cq)"
            )
            / 10000.0
        ).alias("vwap"),
        # day avg = pc/(100*n); x10^4 half-up -> x = pc*100, y = n
        (
            F.expr(
                "((2 * CAST(pc AS DECIMAL(38,0)) * 100 + n) "
                " - (2 * CAST(pc AS DECIMAL(38,0)) * 100 + n) % (2 * n)) "
                "/ (2 * n)"
            )
            / 10000.0
        ).alias("day_avg_price"),
        # pc/(100n) vs cpqc/(100cq)  <=>  pc*cq vs cpqc*n
        F.when(
            F.col("pc").cast("decimal(38,0)") * F.col("cq")
            > F.col("cpqc") * F.col("n"),
            "above",
        )
        .when(
            F.col("pc").cast("decimal(38,0)") * F.col("cq")
            < F.col("cpqc") * F.col("n"),
            "below",
        )
        .otherwise("at")
        .alias("vs_vwap"),
    )


# =================================================================
# Group X — scalar data-layout / identity primitives
# =================================================================

ZORDER_BITS = 8


def q_fn_zorder_interleave(spark, sf_dir):
    """Morton (Z-order) curve interleaving of (partkey%256, suppkey%256)
    — the multi-dimensional clustering key data-layout engines sort by
    so range predicates on EITHER dimension prune row groups.  Pure bit
    arithmetic (shift/and/or), identical in both engines; emitted for a
    bounded order range with the z-ordered rank."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem").filter(F.col("l_orderkey") < 400)
    terms = []
    for i in range(ZORDER_BITS):
        terms.append(
            f"shiftleft(shiftright(l_partkey % 256, {i}) & 1, {2 * i})"
        )
        terms.append(
            f"shiftleft(shiftright(l_suppkey % 256, {i}) & 1, {2 * i + 1})"
        )
    z = F.expr(" + ".join(terms))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_partkey").alias("x"),
        F.col("l_suppkey").alias("y"),
        z.alias("zcode"),
    )


def q_fn_uuid_deterministic(spark, sf_dir):
    """Deterministic name-based UUIDs (md5 name-hash with version-3 and
    RFC-variant nibbles patched in, the UUIDv3 layout) for part names —
    the reproducible surrogate-key primitive: unlike uuid(), identical
    on every engine, every retry and every partitioning."""
    load_tables(spark, sf_dir)
    p = spark.table("part").filter(F.col("p_partkey") <= 100)
    h = F.md5(F.col("p_name"))
    uuid = F.concat(
        F.substring(h, 1, 8), F.lit("-"),
        F.substring(h, 9, 4), F.lit("-3"),
        F.substring(h, 14, 3), F.lit("-8"),
        F.substring(h, 18, 3), F.lit("-"),
        F.substring(h, 21, 12),
    )
    return p.select("p_partkey", "p_name", uuid.alias("uuid3"))


# =================================================================
# Group S — ingestion semantics
# =================================================================


def q_source_csv_multiline(spark, sf_dir):
    """Multi-line CSV parsing semantics (ref op A7, quoted-embedded-
    newline case): part names are rewritten with real newlines,
    written as a quoted CSV, and read back with multiLine=true — the
    parser mode that cannot split files (a whole-file read unit), which
    is exactly why the check matters: the roundtrip must preserve row
    count and content despite records spanning physical lines."""
    load_tables(spark, sf_dir)
    p = spark.table("part").filter(F.col("p_partkey") <= 200)
    staged = p.select(
        "p_partkey",
        F.regexp_replace(F.col("p_name"), " ", "\n").alias("name_multi"),
    )
    out_dir = os.path.join(
        tempfile.gettempdir(), f"i2mr_csv_multiline_{os.path.basename(sf_dir)}"
    )
    (
        staged.coalesce(1)
        .write.mode("overwrite")
        .option("header", True)
        .option("quoteAll", True)
        .csv(out_dir)
    )
    back = (
        spark.read.option("header", True)
        .option("multiLine", True)
        .schema("p_partkey long, name_multi string")
        .csv(out_dir)
    )
    return back.select(
        "p_partkey",
        F.size(F.split(F.col("name_multi"), "\n")).alias("n_lines"),
        F.regexp_replace(F.col("name_multi"), "\n", " ").alias("restored"),
    )


# =================================================================
# Group C — join shapes
# =================================================================

BLOOM_BITS = 1024
BLOOM_HASHES = 3
BLOOM_TOPN = 5


def q_join_bloom_prefilter(spark, sf_dir):
    """Bloom-filter pre-filtered semi join — the runtime-filter pattern:
    the dim side (top-5 customers by total order value) builds a tiny
    bit set (3 portable md5 hashes into 1024 bits, collected as a
    BOUNDED driver list of set bit positions — the broadcast runtime
    filter), the fact side drops rows whose 3 probe bits are not all
    set BEFORE the shuffle, and an exact semi join afterwards removes
    bloom false positives — so the RESULT equals the plain semi join
    (hash-checked) while the plan ships only pre-filtered rows.  At
    100 TB this is Spark's own runtime-filtering shape, spelled
    explicitly."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    # NULL custkeys are not customers and can never equi-match the semi
    # join — drop them BEFORE the top-N ranking so they neither burn a
    # rank slot (engine NULL-ordering divergence on ties) nor reach the
    # driver-side bit-position collect as None
    top = (
        o.filter(F.col("o_custkey").isNotNull())
        .groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("v"))
        .withColumn(
            "rn", F.row_number().over(Window.orderBy(F.col("v").desc(), "o_custkey"))
        )
        .filter(F.col("rn") <= BLOOM_TOPN)
        .select("o_custkey")
    )
    key = F.col("o_custkey").cast("string")
    pos_cols = [
        (_md5_le(F.concat(key, F.lit(f"@{i}")), 4) % BLOOM_BITS).alias(f"p{i}")
        for i in range(BLOOM_HASHES)
    ]
    # bounded collect: <= TOPN * HASHES bit positions (the runtime filter)
    bits = sorted(
        {
            r[f"p{i}"]
            for r in top.select(*pos_cols).collect()
            for i in range(BLOOM_HASHES)
        }
    )
    bit_arr = F.array(*[F.lit(b) for b in bits])
    probe_ok = None
    for i in range(BLOOM_HASHES):
        c = F.array_contains(
            bit_arr, _md5_le(F.concat(key, F.lit(f"@{i}")), 4) % BLOOM_BITS
        )
        probe_ok = c if probe_ok is None else (probe_ok & c)
    return (
        o.filter(probe_ok)  # bloom pre-filter: false positives possible
        .join(top, "o_custkey", "left_semi")  # exact: removes them
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast(
                    "double"
                ),
                2,
            ).alias("total_value"),
        )
    )


QUERIES = {
    "dedup_paragraph": q_dedup_paragraph,
    "pipeline_importance_sample": q_pipeline_importance_sample,
    "text_vocab_growth": q_text_vocab_growth,
    "embedding_matryoshka_truncate": q_embedding_matryoshka_truncate,
    "sim_mmr_rerank": q_sim_mmr_rerank,
    "agg_count_min_sketch": q_agg_count_min_sketch,
    "agg_weighted_percentile": q_agg_weighted_percentile,
    "ts_cusum_changepoint": q_ts_cusum_changepoint,
    "ts_cross_correlation": q_ts_cross_correlation,
    "ts_mann_kendall": q_ts_mann_kendall,
    "ts_gap_stats": q_ts_gap_stats,
    "window_donchian": q_window_donchian,
    "window_vwap": q_window_vwap,
    "fn_zorder_interleave": q_fn_zorder_interleave,
    "fn_uuid_deterministic": q_fn_uuid_deterministic,
    "source_csv_multiline": q_source_csv_multiline,
    "join_bloom_prefilter": q_join_bloom_prefilter,
}


def _zorder_sql() -> str:
    # each term fully parenthesized: DuckDB's << binds LOOSER than +, so
    # an unwrapped `a + b << k` parses as `(a + b) << k` and overflows
    terms = []
    for i in range(ZORDER_BITS):
        terms.append(f"((((l_partkey % 256) >> {i}) & 1) << {2 * i})")
        terms.append(f"((((l_suppkey % 256) >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


ORACLES = {
    "dedup_paragraph": (
        "WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), "
        "c AS (SELECT doc_id, CAST(i AS INT) AS chunk_idx, "
        f"array_to_string(ws[(i*{PARA_CHUNK_WORDS}+1):(i*{PARA_CHUNK_WORDS}+{PARA_CHUNK_WORDS})], ' ') AS chunk "
        f"FROM w, unnest(range(CAST(ceil(len(ws)/{PARA_CHUNK_WORDS}.0) AS BIGINT))) AS t(i)), "
        "k AS (SELECT doc_id, chunk_idx, CASE WHEN row_number() OVER "
        "(PARTITION BY md5(chunk) ORDER BY doc_id, chunk_idx) = 1 "
        "THEN 1 ELSE 0 END AS is_first FROM c) "
        "SELECT doc_id, count(*) AS n_chunks, "
        "CAST(sum(is_first) AS BIGINT) AS n_kept, "
        "round(sum(is_first) * 1.0 / count(*), 4) AS keep_ratio "
        "FROM k GROUP BY doc_id"
    ),
    "pipeline_importance_sample": (
        "SELECT count(*) AS n_sampled, CAST(sum(n_chars) AS BIGINT) AS sampled_chars, "
        "min(doc_id) AS min_doc, max(doc_id) AS max_doc FROM documents "
        f"WHERE {_md5_le_sql('CAST(doc_id AS VARCHAR)', 2)} * 1000 "
        "< least(n_chars, 1000) * 65536"
    ),
    "text_vocab_growth": (
        "WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w "
        "FROM documents), "
        "tf AS (SELECT doc_id, w FROM toks WHERE w <> ''), "
        "first AS (SELECT w, min(doc_id) AS first_doc FROM tf GROUP BY w), "
        "npd AS (SELECT first_doc AS doc_id, count(*) AS new_words "
        "FROM first GROUP BY 1), "
        "tpd AS (SELECT doc_id, count(*) AS n_toks FROM tf GROUP BY 1) "
        "SELECT tpd.doc_id, "
        "CAST(sum(n_toks) OVER (ORDER BY tpd.doc_id) AS BIGINT) AS cum_tokens, "
        "CAST(sum(coalesce(new_words, 0)) OVER (ORDER BY tpd.doc_id) AS BIGINT) "
        "AS vocab_size FROM tpd LEFT JOIN npd ON tpd.doc_id = npd.doc_id"
    ),
    "embedding_matryoshka_truncate": (
        "WITH d AS (SELECT unnest([" +
        ", ".join(str(d) for d in MATRYOSHKA_DIMS) + "]) AS dim) "
        "SELECT vec_id, CAST(dim AS INT) AS dim, "
        "round(list_sum(list_transform(embedding[1:dim], "
        "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) / "
        "list_sum(list_transform(embedding[1:64], "
        "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS energy_share "
        "FROM embeddings, d"
    ),
    "agg_count_min_sketch": (
        # bucket_i = byte i of md5's lower 8 bytes: md5_number_lower is
        # the little-endian integer of those bytes, so byte i is
        # (n // 256^i) % 256 — matches Spark's conv(substring(hex)) form
        "WITH cells AS ("
        + " UNION ALL ".join(
            f"SELECT {i} AS depth, "
            f"((md5_number_lower(CAST(l_partkey AS VARCHAR)) "
            f"// {256 ** i}) % 256) AS bucket, count(*) AS cnt "
            "FROM lineitem GROUP BY 2"
            for i in range(CMS_DEPTH)
        )
        + "), top AS (SELECT l_partkey, count(*) AS true_cnt, "
        "row_number() OVER (ORDER BY count(*) DESC, l_partkey) AS rn "
        f"FROM lineitem GROUP BY l_partkey QUALIFY rn <= {CMS_TOPK}), "
        "probes AS ("
        + " UNION ALL ".join(
            f"SELECT l_partkey, true_cnt, {i} AS depth, "
            f"((md5_number_lower(CAST(l_partkey AS VARCHAR)) "
            f"// {256 ** i}) % 256) AS bucket FROM top"
            for i in range(CMS_DEPTH)
        )
        + ") SELECT p.l_partkey, p.true_cnt, min(c.cnt) AS est_cnt "
        "FROM probes p JOIN cells c ON p.depth = c.depth AND p.bucket = c.bucket "
        "GROUP BY 1, 2"
    ),
    "agg_weighted_percentile": (
        "WITH g AS (SELECT l_returnflag, CAST(l_extendedprice AS DECIMAL(18,2)) "
        "AS price, sum(CAST(CAST(l_quantity AS DECIMAL(9,0)) AS BIGINT)) AS qsum "
        "FROM lineitem GROUP BY 1, 2), "
        "cw AS (SELECT l_returnflag, price, "
        "sum(qsum) OVER (PARTITION BY l_returnflag ORDER BY price "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw, "
        "sum(qsum) OVER (PARTITION BY l_returnflag) AS totw FROM g) "
        + " UNION ALL ".join(
            f"SELECT l_returnflag, {pct} AS pct, "
            "CAST(min(price) AS DOUBLE) AS value FROM cw "
            f"WHERE 100 * cumw >= {pct} * totw GROUP BY l_returnflag"
            for pct in (25, 50, 75)
        )
    ),
    "ts_cusum_changepoint": (
        "WITH daily AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, "
        "sum(CAST(value AS DECIMAL(18,6))) AS x FROM events GROUP BY 1, 2), "
        "scored AS (SELECT event_type, day, "
        "count(*) OVER (PARTITION BY event_type) * "
        "sum(x) OVER (PARTITION BY event_type ORDER BY day "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
        "- row_number() OVER (PARTITION BY event_type ORDER BY day) * "
        "sum(x) OVER (PARTITION BY event_type) AS t, "
        "count(*) OVER (PARTITION BY event_type) AS n FROM daily), "
        "pick AS (SELECT *, row_number() OVER (PARTITION BY event_type "
        "ORDER BY abs(t) DESC, day) AS rn FROM scored) "
        "SELECT event_type, day AS change_day, "
        "round(CAST(t AS DOUBLE) / n, 4) AS cusum_stat FROM pick WHERE rn = 1"
    ),
    "ts_cross_correlation": (
        "WITH hourly AS (SELECT strftime(ts, '%Y-%m-%d %H') AS hr, "
        "sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x, "
        "sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y "
        "FROM events WHERE event_type IN ('click', 'purchase') GROUP BY 1), "
        "idxd AS (SELECT row_number() OVER (ORDER BY hr) AS idx, x, y "
        "FROM hourly) "
        + " UNION ALL ".join(
            f"SELECT {k} AS lag, count(*) AS n_pairs, "
            "CASE WHEN count(*) * sum(a.x * a.x) - sum(a.x) * sum(a.x) > 0 "
            "AND count(*) * sum(b.y * b.y) - sum(b.y) * sum(b.y) > 0 THEN "
            "round(CAST(count(*) * sum(a.x * b.y) - sum(a.x) * sum(b.y) AS DOUBLE) / "
            "(sqrt(CAST(count(*) * sum(a.x * a.x) - sum(a.x) * sum(a.x) AS DOUBLE)) * "
            "sqrt(CAST(count(*) * sum(b.y * b.y) - sum(b.y) * sum(b.y) AS DOUBLE))), 6) "
            "+ 0.0 END AS rho "
            f"FROM idxd a JOIN idxd b ON b.idx = a.idx + {k}"
            for k in XCORR_LAGS
        )
    ),
    "ts_mann_kendall": (
        "WITH daily AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, "
        "sum(CAST(value AS DECIMAL(18,6))) AS s, count(*) AS c "
        "FROM events GROUP BY 1, 2) "
        "SELECT a.event_type, count(DISTINCT a.day) + 1 AS n_days, "
        "CAST(sum(CASE WHEN b.s * a.c > a.s * b.c THEN 1 "
        "WHEN b.s * a.c < a.s * b.c THEN -1 ELSE 0 END) AS BIGINT) AS s_stat, "
        "round(sum(CASE WHEN b.s * a.c > a.s * b.c THEN 1 "
        "WHEN b.s * a.c < a.s * b.c THEN -1 ELSE 0 END) / "
        "((count(DISTINCT a.day) + 1) * count(DISTINCT a.day) / 2.0), 6) AS tau "
        "FROM daily a JOIN daily b ON a.event_type = b.event_type "
        "AND a.day < b.day GROUP BY 1"
    ),
    "ts_gap_stats": (
        "WITH g AS (SELECT event_type, epoch_us(ts) - lag(epoch_us(ts), 1) "
        "OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS gap_us "
        "FROM events) "
        "SELECT event_type, count(*) AS n_gaps, "
        "quantile_cont(gap_us, 0.5) AS p50_gap_us, "
        "quantile_cont(gap_us, 0.95) AS p95_gap_us "
        "FROM g WHERE gap_us IS NOT NULL GROUP BY 1"
    ),
    "window_donchian": (
        "WITH daily AS (SELECT strftime(o_orderdate, '%Y-%m-%d') AS day, "
        "sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev FROM orders "
        "GROUP BY 1), "
        "framed AS (SELECT day, rev, count(*) OVER w AS n, "
        "max(rev) OVER w AS hi, min(rev) OVER w AS lo FROM daily "
        f"WINDOW w AS (ORDER BY day ROWS BETWEEN {DONCH_N} PRECEDING "
        "AND 1 PRECEDING)) "
        "SELECT day, CAST(rev AS DOUBLE) AS revenue, "
        "CAST(hi AS DOUBLE) AS upper, CAST(lo AS DOUBLE) AS lower, "
        "CASE WHEN rev > hi THEN 'breakout_high' WHEN rev < lo THEN "
        f"'breakout_low' ELSE 'inside' END AS signal FROM framed WHERE n = {DONCH_N}"
    ),
    "window_vwap": (
        "WITH daily AS (SELECT l_returnflag, "
        "strftime(l_shipdate, '%Y-%m-%d') AS day, "
        "sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * "
        "CAST(l_quantity AS DECIMAL(9,0)) * 100 AS BIGINT)) AS pqc, "
        "sum(CAST(CAST(l_quantity AS DECIMAL(9,0)) AS BIGINT)) AS q, "
        "sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS pc, "
        "count(*) AS n FROM lineitem GROUP BY 1, 2), "
        "cum AS (SELECT l_returnflag, day, "
        "sum(pqc::HUGEINT) OVER w AS cpqc, sum(q) OVER w AS cq, pc, n FROM daily "
        "WINDOW w AS (PARTITION BY l_returnflag ORDER BY day "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) "
        "SELECT l_returnflag, day, "
        "((2 * cpqc * 10000 + 100 * cq) // (2 * 100 * cq)) / 10000.0 AS vwap, "
        "((2 * pc::HUGEINT * 100 + n) // (2 * n)) / 10000.0 AS day_avg_price, "
        "CASE WHEN pc::HUGEINT * cq > cpqc * n THEN 'above' "
        "WHEN pc::HUGEINT * cq < cpqc * n THEN 'below' ELSE 'at' END AS vs_vwap "
        "FROM cum"
    ),
    "fn_zorder_interleave": (
        "SELECT l_orderkey, l_linenumber, l_partkey AS x, l_suppkey AS y, "
        f"{_zorder_sql()} AS zcode FROM lineitem WHERE l_orderkey < 400"
    ),
    "fn_uuid_deterministic": (
        "SELECT p_partkey, p_name, "
        "substr(md5(p_name), 1, 8) || '-' || substr(md5(p_name), 9, 4) || "
        "'-3' || substr(md5(p_name), 14, 3) || '-8' || "
        "substr(md5(p_name), 18, 3) || '-' || substr(md5(p_name), 21, 12) "
        "AS uuid3 FROM part WHERE p_partkey <= 100"
    ),
    "source_csv_multiline": (
        # oracle recomputes from the base table: the roundtrip must not
        # lose rows or content, so line counts and the reassembled text
        # match the pre-split values
        "SELECT p_partkey, len(string_split(p_name, ' ')) AS n_lines, "
        "p_name AS restored FROM part WHERE p_partkey <= 200"
    ),
    "join_bloom_prefilter": (
        "WITH top AS (SELECT o_custkey, "
        "row_number() OVER (ORDER BY sum(CAST(o_totalprice AS DECIMAL(18,2))) "
        "DESC, o_custkey) AS rn FROM orders "
        "WHERE o_custkey IS NOT NULL GROUP BY o_custkey "
        f"QUALIFY rn <= {BLOOM_TOPN}) "
        "SELECT o.o_custkey, count(*) AS n_orders, "
        "round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) "
        "AS total_value FROM orders o JOIN top USING (o_custkey) "
        "GROUP BY 1"
    ),
}
