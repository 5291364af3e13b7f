"""Group I — MapReduce-core surface queries (SURVEY §2B).

Declared through :mod:`i2mapreduce_spark.mapred`, the library that
re-expresses the reference's own paradigm (ref ops A1/A2/A4/A5/A6).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from .. import mapred
from ..catalog import load_tables
from ..operators import ranking


def _words(spark):
    """documents -> (doc_id, word) via the canonical map/flatMap."""
    d = spark.table("documents")
    return mapred.flat_map(
        d, F.split(F.col("text"), " "), "word", keep=["doc_id"]
    ).filter(F.col("word") != "")


def q_mr_wordcount(spark, sf_dir):
    """The canonical MapReduce program: split -> explode -> count.

    map = flat_map(split), combine+reduce = reduce_by_key(count);
    top-100 under a total order (cnt DESC, word).
    """
    load_tables(spark, sf_dir)
    counts = mapred.reduce_by_key(_words(spark), ["word"], cnt=F.count("*"))
    return counts.orderBy(F.col("cnt").desc(), F.col("word")).limit(100)


def q_mr_flatmap_posexplode(spark, sf_dir):
    """Tokens with 1-based position (posexplode; ref op A1 expanding)."""
    load_tables(spark, sf_dir)
    d = spark.table("documents")
    toks = mapred.flat_map(
        d, F.split(F.col("text"), " "), "word", keep=["doc_id"], with_pos=True
    )
    return toks.filter(F.col("word") != "").select("doc_id", "word", "pos")


def q_mr_partition_custom(spark, sf_dir):
    """Custom partition routing (ref op A5): repartition(8, user_id) and
    count rows per physical partition. Rows-only: partition ids are not
    portable to another engine."""
    load_tables(spark, sf_dir)
    ev = mapred.partition_by(spark.table("events"), 8, "user_id")
    return (
        ev.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.count("*").alias("n"))
    )


def q_mr_secondary_sort(spark, sf_dir):
    """Per-key ordered fold (ref op A6): first/last event type per user in
    (ts, event_id) order, via ordered window first/last."""
    load_tables(spark, sf_dir)
    ev = spark.table("events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        ev.select(
            "user_id",
            F.first("event_type").over(w).alias("first_type"),
            F.last("event_type").over(w).alias("last_type"),
            F.count("*").over(Window.partitionBy("user_id")).alias("n"),
        )
        .distinct()
    )


def q_mr_salted_skew_agg(spark, sf_dir):
    """Skew-resistant two-phase salted reduce (A2+A5 at 100TB): a hot
    key's rows spread over 8 salted partial groups before the final
    per-key merge.  The salt must not change the answer — hash-checked
    against the plain one-phase GROUP BY."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    out = mapred.salted_reduce_by_key(
        li,
        ["l_returnflag"],
        8,
        sum_qty=(F.sum("l_quantity"), F.sum("sum_qty")),
        n_items=(F.count("*"), F.sum("n_items")),
        max_price=(F.max("l_extendedprice"), F.max("max_price")),
    )
    return out.select(
        "l_returnflag",
        F.round("sum_qty", 2).alias("sum_qty"),
        "n_items",
        F.round("max_price", 2).alias("max_price"),
    )


def q_mr_chain_jobs(spark, sf_dir):
    """The reference's JobChain pattern (map->reduce->map->reduce, the
    multi-stage MapReduce idiom) as ONE declarative pipeline with no
    materialization between 'jobs': job 1 = per-(doc, word) term counts;
    job 2 = per-word doc-frequency + max in-doc count, then the top-50
    words by doc frequency under a total order.  In MapReduce this is
    two full disk round trips; here Catalyst fuses it into one DAG."""
    load_tables(spark, sf_dir)
    tf = mapred.reduce_by_key(_words(spark), ["doc_id", "word"], tf=F.count("*"))
    stats = mapred.reduce_by_key(
        tf, ["word"], n_docs=F.count("*"), max_tf=F.max("tf")
    )
    return stats.orderBy(F.col("n_docs").desc(), F.col("word")).limit(50)


#: heavy-hitter support: report words with count*HH_SUPPORT > total tokens
HH_SUPPORT = 100
#: Misra-Gries counters per partition; k+1 > HH_SUPPORT gives the
#: no-false-negative guarantee (see docstring)
HH_MG_K = 199


def q_mr_heavy_hitters(spark, sf_dir):
    """Exact heavy hitters WITHOUT shuffling the full token stream: a
    two-phase candidate-pruned count, the canonical map-side-sketch
    pattern for 100 TB frequency queries.

    Phase 1 runs BATCHED Misra-Gries(k=199) inside each partition
    (mapInPandas, one dict of counters per task — constant memory): each
    Arrow batch folds in as one vectorized value_counts() (the per-word
    work is C-side; Python touches only the ≤ k + distinct-per-batch
    counter dict), then if the dict holds k+m counters (m>0) every
    counter drops by d = the m-th smallest value and non-positive
    counters are evicted — the batch generalization of the classic
    decrement-all step.  Guarantee unchanged: each eviction event
    subtracts d from ≥ k+1 counters that held ≥ d, consuming ≥ d·(k+1)
    inserted mass, so total decrement D ≤ n_p/(k+1) and any word with
    partition count > n_p/(k+1) survives.  By pigeonhole a word with
    global count > N/(k+1) exceeds that bound in some partition, so with
    support N/100 > N/(k+1) (k=199) the candidate set provably contains
    every true heavy hitter.  Phase 2 exactly recounts ONLY the
    candidates (broadcast semi-join, a few hundred words) and filters
    count·100 > N in integer arithmetic.  The full word shuffle — the
    wordcount bottleneck at scale — never happens; what crosses the wire
    is ≤ k rows per partition."""
    load_tables(spark, sf_dir)
    words = _words(spark).select("word")

    def mg_partition(batches):
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            for w, c in pdf["word"].value_counts().items():
                counters[w] = counters.get(w, 0) + int(c)
            m = len(counters) - HH_MG_K
            if m > 0:
                d = sorted(counters.values())[m - 1]
                counters = {w: c - d for w, c in counters.items() if c > d}
        yield pd.DataFrame({"word": list(counters.keys())})

    cands = words.mapInPandas(mg_partition, "word string").distinct()
    total = words.groupBy().agg(F.count(F.lit(1)).alias("n_total"))
    counts = (
        words.join(F.broadcast(cands), "word", "left_semi")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("n_occ") * HH_SUPPORT > F.col("n_total"))
        .select("word", "n_occ")
    )


#: the side-data lookup a DistributedCache job ships to every task
RETURNFLAG_DESC = {"A": "accepted", "N": "none", "R": "returned"}
#: pagination-index stride for the total-order sort
SORT_PAGE = 2500


def q_mr_distributed_cache(spark, sf_dir):
    """The reference's DistributedCache pattern (ref A1 side data):
    a small lookup table shipped to EVERY task and consulted inside the
    map function, never joined.  Spark-first realization: the lookup is
    a literal `create_map` folded into the row expression — Catalyst
    constant-folds it into codegen, the exact analog of reading the
    cached file in Mapper.setup().  The query enriches lineitem rows
    with the returnflag description and aggregates per description.

    100 TB: zero shuffle for the enrichment (map-side expression), one
    partial+final aggregate for the report.  A lookup too big for a
    literal becomes sparkContext.broadcast — same no-shuffle plan."""
    load_tables(spark, sf_dir)
    lut = F.create_map(
        *[F.lit(x) for kv in RETURNFLAG_DESC.items() for x in kv]
    )
    li = spark.table("lineitem")
    return (
        li.withColumn("flag_desc", F.element_at(lut, F.col("l_returnflag")))
        .groupBy("flag_desc")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


def q_mr_total_order_sort(spark, sf_dir):
    """TeraSort's total-order partitioning (the reference's
    TotalOrderPartitioner, ref A5): a GLOBALLY sorted output produced
    without ever sorting on one node — range-partition on the sort key,
    sort within partitions, then stitch per-partition row_numbers into
    the global rank with chunked offsets (operators/ranking).  The
    output is the pagination index a sorted export publishes: every
    2500th row's key with its exact global rank.

    100 TB: this IS the scalable sort — each partition sorts locally in
    parallel and only n_partitions counts coordinate; the single-node
    alternative (a global ORDER BY window) is the anti-pattern the
    plan-hygiene tests reject.

    NULL join keys (r10): NULL sort keys are excluded on both sides —
    a total order over NULL keys is engine-divergent (Spark NULLS FIRST
    asc vs DuckDB NULLS LAST), and the reference TotalOrderPartitioner
    contract assumes well-defined keys (NULL-key records route to a
    reject channel, not into the sorted export)."""
    load_tables(spark, sf_dir)
    li = (
        spark.table("lineitem")
        .filter(F.col("l_orderkey").isNotNull())
        .select("l_orderkey", "l_linenumber")
    )
    ranked = ranking.global_row_number(
        li, ["l_orderkey", "l_linenumber"], out_col="rnk"
    )
    return ranked.filter((F.col("rnk") - 1) % SORT_PAGE == 0).select(
        "rnk", "l_orderkey", "l_linenumber"
    )


#: mr_multiple_outputs value split point / mr_counters high-value cutoff
#: (interpolated into BOTH the Spark side and the oracle SQL — retune in
#: one place)
MO_HI_CUTOFF = 300_000


def q_mr_counters(spark, sf_dir):
    """Hadoop Counters surface — the reference's per-job metric channel
    (records in/out, bad records, custom counters), realized the Spark
    way: AccumulatorV2 counters incremented inside ONE map pass over the
    fact table, surfaced as (counter, value) rows.

    The pass classifies each order once (records in, high-value,
    urgent-or-high priority) exactly as a Mapper.map() would bump
    context.getCounter(...).  Accumulators are the idiomatic Spark
    mirror: executor-side adds merged at the driver, one add per Arrow
    batch — at 100 TB the counter traffic is O(batches), not O(rows),
    and the per-batch tally is vectorized pandas.  The driver-side
    values become a tiny DataFrame; the oracle recomputes the same
    counts declaratively."""
    load_tables(spark, sf_dir)
    sc = spark.sparkContext
    n_in = sc.accumulator(0)
    n_high = sc.accumulator(0)
    n_urgent = sc.accumulator(0)

    def tally(batches):
        # vectorized per-Arrow-batch tallies, ONE accumulator add per
        # batch — counter traffic is O(batches), the per-row work is
        # pandas/numpy, never a Python loop.  (Like Hadoop counters,
        # adds inside a re-run task would repeat; Spark dedups action-
        # stage retries, and production treats counters as metrics, not
        # exactly-once facts.)
        for pdf in batches:
            n_in.add(len(pdf))
            n_high.add(int((pdf["o_totalprice"] > MO_HI_CUTOFF).sum()))
            n_urgent.add(
                int(pdf["o_orderpriority"].isin(["1-URGENT", "2-HIGH"]).sum())
            )
            yield pdf.iloc[:0][["o_totalprice"]]

    spark.table("orders").select("o_totalprice", "o_orderpriority").mapInPandas(
        tally, schema="o_totalprice double"
    ).count()  # the action; yields no rows, but the kernel must run
    return spark.createDataFrame(
        [
            ("records_in", n_in.value),
            ("high_value", n_high.value),
            ("urgent_or_high", n_urgent.value),
        ],
        "counter string, value long",
    )


def q_mr_multiple_outputs(spark, sf_dir):
    """MultipleOutputs pattern — one MapReduce pass routing each record
    to one of several named output files.  Spark-first realization: a
    single partitionBy('route') parquet write IS the one-pass multi-way
    split (each route lands in its own directory, exactly the named
    outputs); both sinks are then read back independently and profiled.

    Hash-checked end to end: the per-route stats come FROM THE SINKS, so
    a row routed to the wrong file or dropped would break the oracle."""
    load_tables(spark, sf_dir)
    from .scans import _scratch_dir

    root = _scratch_dir("i2mr_multiout_")
    o = spark.table("orders")
    routed = o.withColumn(
        "route",
        F.when(F.col("o_totalprice") >= MO_HI_CUTOFF, "hi").otherwise("lo"),
    )
    routed.write.partitionBy("route").mode("overwrite").parquet(root)
    # read the SINK back with an explicit schema (best practice on a
    # partitioned dataset, and the only way a legitimately EMPTY sink —
    # zero routes written — reads back instead of failing schema
    # inference); grouping on the partition column profiles each named
    # output from its own directory, so a row routed to the wrong file
    # or dropped still breaks the oracle
    snap = spark.read.schema(routed.schema).parquet(root)
    return (
        snap.groupBy("route")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast(
                    "double"
                ),
                2,
            ).alias("revenue"),
        )
        .select("route", "n_orders", "revenue")
    )


#: inverted-index document-frequency floor (drops hapax noise; keeps the
#: posting strings bounded at fixture scale and the key cheap to grade)
II_MIN_DF = 3


def q_mr_inverted_index(spark, sf_dir):
    """The OTHER canonical MapReduce program (after wordcount): build an
    inverted index — per term, the sorted posting list of documents that
    contain it, plus document frequency.  map = (word, doc_id) pairs,
    reduce = merge postings; Spark-first that is ONE partial+final
    aggregate over distinct (word, doc_id) pairs, with the posting list
    as sort_array(collect_set(...)) flattened to a comma-joined string
    (flat-columns grading contract).

    100 TB shape: the pair-distinct and the posting agg share one
    shuffle key (word); stopword-grade terms make giant postings — a
    production index shards those by (term, doc_id range); here the
    df floor plus fixture vocab keeps lists bounded.  No driver-side
    merge: postings concatenate distributed, exactly the reducer's
    merge step."""
    load_tables(spark, sf_dir)
    pairs = _words(spark).select("word", "doc_id").distinct()
    return (
        pairs.groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.array_join(
                F.sort_array(F.collect_set("doc_id")), ","
            ).alias("postings"),
        )
        .filter(F.col("df") >= II_MIN_DF)
    )


#: matrix-multiply dimensions: A is (i = orderkey%MM_I) x (k = partkey%MM_K),
#: B is (k = partkey%MM_K) x (j = size%MM_J)
MM_I, MM_K, MM_J = 50, 40, 10


def q_mr_matrix_multiply(spark, sf_dir):
    """Sparse matrix multiplication, the textbook two-job MapReduce
    (map: emit by shared dimension k; reduce: multiply+sum) and the
    GIM-V building block.  A is built from lineitem (i=orderkey mod 50,
    k=partkey mod 40, v=quantity), B from part (k=partkey mod 40,
    j=size mod 10, w=partkey mod 7 + 1); C[i,j] = Σ_k A[i,k]·B[k,j].
    All-integer values make every product and sum exact.

    Spark-first: BOTH matrices pre-aggregate to their cell grain before
    the join (the classic combiner step), so the k-join fans out
    |A_cells|x|B_cells per k| not raw-rows², then one partial+final agg
    on (i,j).  At 100 TB the same plan holds with k as the shuffle key;
    a dense-k hot spot would salt k exactly like mr_salted_skew_agg."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem")
    p = spark.table("part")
    a = (
        li.select(
            (F.col("l_orderkey") % MM_I).alias("i"),
            (F.col("l_partkey") % MM_K).alias("k"),
            F.col("l_quantity").cast("long").alias("v"),
        )
        .groupBy("i", "k")
        .agg(F.sum("v").alias("a_val"))
    )
    b = (
        p.select(
            (F.col("p_partkey") % MM_K).alias("k"),
            (F.col("p_size") % MM_J).alias("j"),
            ((F.col("p_partkey") % 7) + 1).alias("w"),
        )
        .groupBy("k", "j")
        .agg(F.sum("w").alias("b_val"))
    )
    return (
        a.join(b, "k")
        .groupBy("i", "j")
        .agg(F.sum(F.col("a_val") * F.col("b_val")).alias("c_val"))
    )


QUERIES = {
    "mr_inverted_index": q_mr_inverted_index,
    "mr_matrix_multiply": q_mr_matrix_multiply,
    "mr_counters": q_mr_counters,
    "mr_multiple_outputs": q_mr_multiple_outputs,
    "mr_distributed_cache": q_mr_distributed_cache,
    "mr_total_order_sort": q_mr_total_order_sort,
    "mr_heavy_hitters": q_mr_heavy_hitters,
    "mr_chain_jobs": q_mr_chain_jobs,
    "mr_wordcount": q_mr_wordcount,
    "mr_flatmap_posexplode": q_mr_flatmap_posexplode,
    "mr_partition_custom": q_mr_partition_custom,
    "mr_secondary_sort": q_mr_secondary_sort,
    "mr_salted_skew_agg": q_mr_salted_skew_agg,
}

ORACLES = {
    "mr_inverted_index": (
        "WITH pairs AS (SELECT DISTINCT w AS word, doc_id "
        "FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w "
        "FROM documents) t WHERE w <> '') "
        "SELECT word, count(*) AS df, "
        "string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) "
        "AS postings FROM pairs GROUP BY word "
        f"HAVING count(*) >= {II_MIN_DF}"
    ),
    "mr_matrix_multiply": (
        "WITH a AS (SELECT l_orderkey % "
        f"{MM_I} AS i, l_partkey % {MM_K} AS k, "
        "sum(CAST(l_quantity AS BIGINT)) AS a_val "
        "FROM lineitem GROUP BY 1, 2), "
        f"b AS (SELECT p_partkey % {MM_K} AS k, p_size % {MM_J} AS j, "
        "sum(p_partkey % 7 + 1) AS b_val FROM part GROUP BY 1, 2) "
        "SELECT i, j, CAST(sum(a_val * b_val) AS BIGINT) AS c_val "
        "FROM a JOIN b USING (k) GROUP BY i, j"
    ),
    "mr_counters": (
        "SELECT 'records_in' AS counter, count(*) AS value FROM orders "
        "UNION ALL SELECT 'high_value', count(*) FROM orders "
        f"WHERE o_totalprice > {MO_HI_CUTOFF} "
        "UNION ALL SELECT 'urgent_or_high', count(*) FROM orders "
        "WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')"
    ),
    "mr_multiple_outputs": (
        f"SELECT CASE WHEN o_totalprice >= {MO_HI_CUTOFF} THEN 'hi' ELSE 'lo' END "
        "AS route, count(*) AS n_orders, "
        "round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) "
        "AS revenue FROM orders GROUP BY route"
    ),
    "mr_distributed_cache": (
        "SELECT CASE l_returnflag WHEN 'A' THEN 'accepted' "
        "WHEN 'N' THEN 'none' WHEN 'R' THEN 'returned' END AS flag_desc, "
        "count(*) AS n_lines, round(sum(l_quantity), 2) AS sum_qty "
        "FROM lineitem GROUP BY 1"
    ),
    "mr_total_order_sort": (
        "WITH r AS (SELECT l_orderkey, l_linenumber, "
        "row_number() OVER (ORDER BY l_orderkey, l_linenumber) AS rnk "
        "FROM lineitem WHERE l_orderkey IS NOT NULL) "
        f"SELECT rnk, l_orderkey, l_linenumber FROM r WHERE (rnk - 1) % {SORT_PAGE} = 0"
    ),
    "mr_heavy_hitters": (
        "WITH tok AS (SELECT "
        "unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word "
        "FROM documents), "
        "tot AS (SELECT count(*) AS n FROM tok) "
        f"SELECT word, count(*) AS n_occ FROM tok, tot "
        f"GROUP BY word, n HAVING count(*) * {HH_SUPPORT} > n"
    ),
    "mr_chain_jobs": (
        "WITH tok AS (SELECT doc_id, "
        "unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word "
        "FROM documents), "
        "tf AS (SELECT doc_id, word, count(*) AS tf FROM tok GROUP BY 1, 2) "
        "SELECT word, count(*) AS n_docs, max(tf) AS max_tf FROM tf "
        "GROUP BY word ORDER BY n_docs DESC, word LIMIT 50"
    ),
    "mr_wordcount": (
        "SELECT w AS word, count(*) AS cnt "
        "FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t "
        "WHERE w <> '' GROUP BY w ORDER BY cnt DESC, w LIMIT 100"
    ),
    "mr_flatmap_posexplode": (
        "SELECT doc_id, w AS word, CAST(p AS INT) AS pos "
        "FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w, "
        "generate_subscripts(string_split(text, ' '), 1) AS p FROM documents) t "
        "WHERE w <> ''"
    ),
    "mr_salted_skew_agg": (
        "SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty, "
        "count(*) AS n_items, round(max(l_extendedprice), 2) AS max_price "
        "FROM lineitem GROUP BY l_returnflag"
    ),
    # mr_partition_custom: rows-only (partition ids not portable)
    "mr_secondary_sort": (
        "SELECT DISTINCT user_id, "
        "first_value(event_type) OVER w AS first_type, "
        "last_value(event_type) OVER w AS last_type, "
        "count(*) OVER (PARTITION BY user_id) AS n "
        "FROM events "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
    ),
}
