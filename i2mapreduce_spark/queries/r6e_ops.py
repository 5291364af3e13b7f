"""Round-6 additions, batch 5: strongly connected components (the last
classic distributed-graph algorithm missing from group J) and weighted
reservoir sampling (Efraimidis-Spirakis A-Res) for group P.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_tables
from ..operators import algorithms
from .r6_ops import _md5_le, _md5_le_sql

#: edge-sampling modulus for the SCC digraph: the raw part-sequence
#: graph is one giant SCC (measured: 2000 nodes / 29k edges, a single
#: component at sf0.01) — keeping each directed edge with probability
#: 1/8 via the portable md5 coin yields a graph with real SCC structure
#: (measured sf0.01: 1934 nodes, 3560 edges, 892 SCCs — one 1043-node
#: giant plus singletons).
SCC_EDGE_MOD = 8

RES_K = 50  #: weighted-reservoir sample size
RES_SCALE = float(2 ** 56)


def _sequence_digraph(spark):
    """Directed part-transition graph: an edge a→b for consecutive line
    numbers within an order, md5-coin-sampled at 1/SCC_EDGE_MOD.  One
    self-join on (orderkey, linenumber) — co-partitioned on the shuffle
    key, linear in the fact table."""
    li = spark.table("lineitem").select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
        F.col("l_partkey").alias("pk"),
    )
    nxt = li.select(
        "ok", (F.col("ln") - 1).alias("ln"), F.col("pk").alias("pk2")
    )
    raw = (
        li.join(nxt, ["ok", "ln"])
        .filter(F.col("pk") != F.col("pk2"))
        .select(F.col("pk").alias("src"), F.col("pk2").alias("dst"))
        .distinct()
    )
    coin = _md5_le(
        F.concat(
            F.col("src").cast("string"), F.lit(">"), F.col("dst").cast("string")
        ),
        4,
    )
    return raw.filter(coin % SCC_EDGE_MOD == 0)


def q_iter_scc(spark, sf_dir):
    """Strongly connected components of the sampled part-transition
    digraph via Trim + Forward-Backward min-label coloring
    (operators/algorithms.py::scc): trim peels in/out-degree-0 nodes as
    singleton SCCs to fixpoint, then fwd/bwd pointer-doubling min-reach
    labels certify scc = m where fwd == bwd == m (mutual reachability),
    repeating on the residual.  Deterministic fixpoints, no randomness.
    Rows-only key (SCC is a recursive property SQL can't express at
    this size); correctness = python Tarjan replay in pytest, identical
    component sets at sf0.001 AND sf0.01."""
    load_tables(spark, sf_dir)
    return algorithms.scc(_sequence_digraph(spark)).select(
        "node", "scc"
    )


def q_sample_weighted_reservoir(spark, sf_dir):
    """Weighted reservoir sample (Efraimidis-Spirakis A-Res) of 50 docs
    with probability ∝ token count: key_i = u_i^(1/w_i) ranked
    descending, realized as ln(u_i)/w_i with u_i = (md5_56(doc)+1)/2^56
    — the PORTABLE md5 makes the sample (and the reported keys)
    bit-reproducible across engines AND across runs, which uuid()/rand()
    sampling cannot be.  The top-k is a distributed TakeOrdered
    (per-partition heads + k-row merge); A-Res keys are mergeable, so
    the same construction shards at 100 TB."""
    load_tables(spark, sf_dir)
    d = spark.table("documents")
    toks = d.select(
        "doc_id",
        F.size(
            F.filter(F.split(F.col("text"), " "), lambda w: w != "")
        ).alias("w"),
    ).filter(F.col("w") > 0)
    h = _md5_le(F.col("doc_id").cast("string"), 7)
    scored = toks.select(
        "doc_id",
        "w",
        (F.log((h + 1) / F.lit(RES_SCALE)) / F.col("w")).alias("score"),
    )
    picked = scored.orderBy(F.col("score").desc(), "doc_id").limit(RES_K)
    return picked.select("doc_id", "w", F.round("score", 6).alias("score"))


QUERIES = {
    "iter_scc": q_iter_scc,
    "sample_weighted_reservoir": q_sample_weighted_reservoir,
}

ORACLES = {
    # iter_scc: rows-only by design (recursive mutual-reachability);
    # python Tarjan golden in tests/test_r6e_ops.py.
    "sample_weighted_reservoir": (
        "WITH toks AS (SELECT doc_id, "
        "len(list_filter(string_split(text, ' '), w -> w <> '')) AS w "
        "FROM documents), "
        "scored AS (SELECT doc_id, w, "
        "ln((" + _md5_le_sql("CAST(doc_id AS VARCHAR)", 7) + " + 1) / "
        f"{RES_SCALE!r}) / w AS score FROM toks WHERE w > 0) "
        f"SELECT doc_id, CAST(w AS BIGINT) AS w, round(score, 6) AS score "
        f"FROM scored ORDER BY score DESC, doc_id LIMIT {RES_K}"
    ),
}
