"""Round-6 additions, batch 7: data-quality profiling (cross-column
correlation matrix, primary-key candidate discovery) and product
quantization over the embedding corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..catalog import load_tables

# =================================================================
# Group Q — profiling audits
# =================================================================

#: lineitem numeric columns profiled by the correlation matrix
CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def q_dq_corr_matrix(spark, sf_dir):
    """Pearson correlation matrix cells across the lineitem numeric
    columns — the multicollinearity / redundant-column audit.  ONE
    partial+final agg computes every exact-DECIMAL moment (n, Sx, Sxx
    per column, Sxy per pair); each of the 6 upper-triangle cells is
    then one double expression over those identical exact operands —
    the same knife-edge-free recipe as ts_autocorr, generalized to a
    column matrix.  Output grain = column pairs (bounded), never an
    unordered float reduction."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem")
    # integer CENTS moments (r10 extreme-magnitude sweep): the DECIMAL
    # value-unit form overflowed DuckDB's DECIMAL(18) multiply at
    # 1e6-scaled prices and its cross-products left exactness past
    # width 38; cents moments keep every term an exact integer
    # (cents^2 sums ~1e31 << DECIMAL(38,0)/HUGEINT range) and the
    # correlation ratio is unit-free, so cells are value-identical
    cen = {
        c: (F.col(c).cast("decimal(18,2)") * 100).cast("long")
        for c in CORR_COLS
    }
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in CORR_COLS:
        aggs.append(F.sum(cen[c].cast("decimal(38,0)")).alias(f"s_{c}"))
        aggs.append(
            F.sum(cen[c].cast("decimal(19,0)") * cen[c]).alias(f"ss_{c}")
        )
    pairs = [
        (a, b) for i, a in enumerate(CORR_COLS) for b in CORR_COLS[i + 1:]
    ]
    for a, b in pairs:
        aggs.append(
            F.sum(cen[a].cast("decimal(19,0)") * cen[b]).alias(f"sp_{a}_{b}")
        )
    row = li.agg(*aggs)
    cells = []
    for a, b in pairs:
        num = (
            F.col("n") * F.col(f"sp_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")
        ).cast("double")
        da = (
            F.col("n") * F.col(f"ss_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}")
        ).cast("double")
        db = (
            F.col("n") * F.col(f"ss_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}")
        ).cast("double")
        cells.append(
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                # try_divide: one row -> zero variance -> correlation
                # undefined, NULL on both engines (DuckDB x/0 is NULL)
                F.round(F.try_divide(num, F.sqrt(da * db)), 6).alias("corr"),
            )
        )
    return row.select(F.explode(F.array(*cells)).alias("c"), "n").select(
        F.col("c.col_a").alias("col_a"),
        F.col("c.col_b").alias("col_b"),
        F.col("c.corr").alias("corr"),
        F.col("n").alias("n_rows"),
    )


#: orders columns profiled for key candidacy
PK_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
           "o_orderdate", "o_orderpriority"]


def q_dq_pk_profile(spark, sf_dir):
    """Primary-key candidate discovery over `orders`: per column the
    row count, exact distinct count, null count and the PK verdict
    (distinct == rows AND no nulls) — the schema-inference audit every
    ingestion pipeline runs first.  One pass; exact count(distinct)
    per the repo's hash-key rule (never approx in checked keys)."""
    load_tables(spark, sf_dir)
    o = spark.table("orders")
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in PK_COLS:
        aggs.append(F.countDistinct(c).alias(f"d_{c}"))
        # coalesce: on a zero-row table the null COUNT is 0, not NULL
        # (sum over empty) — the PK verdict stays boolean
        aggs.append(
            F.coalesce(
                F.sum(F.col(c).isNull().cast("long")), F.lit(0)
            ).alias(f"z_{c}")
        )
    row = o.agg(*aggs)
    cells = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col(f"d_{c}").alias("n_distinct"),
            F.col(f"z_{c}").alias("n_nulls"),
        )
        for c in PK_COLS
    ]
    return row.select(F.explode(F.array(*cells)).alias("c"), "n").select(
        F.col("c.col_name").alias("col_name"),
        F.col("n").alias("n_rows"),
        F.col("c.n_distinct").alias("n_distinct"),
        F.col("c.n_nulls").alias("n_nulls"),
        (
            (F.col("c.n_distinct") == F.col("n")) & (F.col("c.n_nulls") == 0)
        ).alias("pk_candidate"),
    )


# =================================================================
# Group L — product quantization
# =================================================================

PQ_M = 8        #: subspaces (64 dims -> 8 x 8)
PQ_K = 16       #: codebook entries per subspace (4-bit codes)
PQ_ITERS = 8    #: k-means refinement iterations
PQ_SAMPLE = 256  #: driver-side training sample (smallest vec_ids)

_PQ_SCHEMA = StructType(
    [StructField("vec_id", LongType())]
    + [StructField(f"code_{m}", IntegerType()) for m in range(PQ_M)]
    + [StructField("recon_err", DoubleType())]
)


def _pq_train(sample: np.ndarray) -> np.ndarray:
    """Deterministic per-subspace Lloyd k-means: init = the first PQ_K
    sample subvectors (ids are sorted, so the seed is reproducible),
    argmin ties -> lowest centroid index, empty clusters keep their
    previous centroid.  Returns (M, K, dsub) float64 codebooks."""
    n, dim = sample.shape
    dsub = dim // PQ_M
    books = np.empty((PQ_M, PQ_K, dsub))
    for m in range(PQ_M):
        X = sample[:, m * dsub: (m + 1) * dsub]
        C = X[:PQ_K].copy()
        for _ in range(PQ_ITERS):
            d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)  # ties -> lowest index (numpy argmin)
            for k in range(PQ_K):
                if (a == k).any():
                    C[k] = X[a == k].mean(axis=0)
        books[m] = C
    return books


def q_embedding_pq_codes(spark, sf_dir):
    """Product-quantization encoding of the embedding corpus — the
    codebook compression behind billion-scale vector stores (a 64-dim
    float vector becomes 8 4-bit codes, 64x smaller): codebooks train
    on a bounded driver-side sample (the IVF pattern — sample size, not
    corpus size, bounds driver memory), broadcast to executors, and
    encoding is one Arrow-batched argmin kernel per subspace; the
    reported reconstruction error is the L2 distance to the decoded
    vector.  Deterministic end-to-end (sorted-sample init, fixed
    iterations, argmin tie -> lowest index).  Rows-only key (the
    codebook is a trained float artifact SQL can't replay); pytest
    replays the exact numpy computation."""
    load_tables(spark, sf_dir)
    emb = spark.table("embeddings")
    sample = emb.orderBy("vec_id").limit(PQ_SAMPLE).select("embedding").collect()
    if not sample:  # empty corpus: no codebooks to train, nothing to encode
        return spark.createDataFrame([], _PQ_SCHEMA)
    S = np.stack([np.asarray(r[0], dtype=np.float64) for r in sample])
    books = _pq_train(S)
    bc = spark.sparkContext.broadcast(books)

    def encode(batches):
        B = bc.value
        dsub = B.shape[2]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            A = np.stack(pdf["embedding"].values).astype(np.float64)
            out = {"vec_id": pdf["vec_id"].values}
            err2 = np.zeros(len(pdf))
            for m in range(PQ_M):
                X = A[:, m * dsub: (m + 1) * dsub]
                d2 = ((X[:, None, :] - B[m][None, :, :]) ** 2).sum(axis=2)
                codes = d2.argmin(axis=1)
                out[f"code_{m}"] = codes.astype("int32")
                err2 += d2[np.arange(len(pdf)), codes]
            out["recon_err"] = np.round(np.sqrt(err2), 4)
            yield pd.DataFrame(out)

    return emb.select("vec_id", "embedding").mapInPandas(encode, _PQ_SCHEMA)


QUERIES = {
    "dq_corr_matrix": q_dq_corr_matrix,
    "dq_pk_profile": q_dq_pk_profile,
    "embedding_pq_codes": q_embedding_pq_codes,
}


def _corr_cell_sql(a: str, b: str) -> str:
    return (
        f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
        f"round(CAST(n * sp_{a}_{b} - s_{a} * s_{b} AS DOUBLE) / "
        f"sqrt(CAST(n * ss_{a} - s_{a} * s_{a} AS DOUBLE) * "
        f"CAST(n * ss_{b} - s_{b} * s_{b} AS DOUBLE)), 6) AS corr, "
        "n AS n_rows FROM moments"
    )


_CORR_PAIRS = [
    (a, b) for i, a in enumerate(CORR_COLS) for b in CORR_COLS[i + 1:]
]

_CORR_MOMENTS = ", ".join(
    ["count(*) AS n"]
    + [
        f"sum(CAST(CAST({c} AS DECIMAL(18,2)) * 100 AS BIGINT)::HUGEINT) "
        f"AS s_{c}, "
        f"sum(CAST(CAST({c} AS DECIMAL(18,2)) * 100 AS BIGINT)::HUGEINT * "
        f"CAST(CAST({c} AS DECIMAL(18,2)) * 100 AS BIGINT)) AS ss_{c}"
        for c in CORR_COLS
    ]
    + [
        f"sum(CAST(CAST({a} AS DECIMAL(18,2)) * 100 AS BIGINT)::HUGEINT * "
        f"CAST(CAST({b} AS DECIMAL(18,2)) * 100 AS BIGINT)) AS sp_{a}_{b}"
        for a, b in _CORR_PAIRS
    ]
)

_PK_CELLS = " UNION ALL ".join(
    f"SELECT '{c}' AS col_name, n AS n_rows, d_{c} AS n_distinct, "
    f"z_{c} AS n_nulls, d_{c} = n AND z_{c} = 0 AS pk_candidate FROM p"
    for c in PK_COLS
)

ORACLES = {
    "dq_corr_matrix": (
        f"WITH moments AS (SELECT {_CORR_MOMENTS} FROM lineitem) "
        + " UNION ALL ".join(_corr_cell_sql(a, b) for a, b in _CORR_PAIRS)
    ),
    "dq_pk_profile": (
        "WITH p AS (SELECT count(*) AS n, "
        + ", ".join(
            f"count(DISTINCT {c}) AS d_{c}, "
            # coalesce mirrors the Spark side: 0 nulls on a 0-row table
            f"CAST(coalesce(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END), 0) "
            f"AS BIGINT) AS z_{c}"
            for c in PK_COLS
        )
        + f" FROM orders) {_PK_CELLS}"
    ),
    # embedding_pq_codes: rows-only by design (trained codebook); numpy
    # replay in tests/test_r6g_ops.py.
}
