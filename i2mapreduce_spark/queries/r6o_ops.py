"""Round-6 additions, batch 15: ALS matrix factorization — the classic
iterative-ML workload on Spark (the algorithm MLlib made famous),
expressed over this repo's co-purchase data with the repo's
determinism discipline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from ..catalog import load_tables

ALS_ITEMS = 64   #: factorize the top-64 parts by popularity (bounded →
                 #: the item-factor matrix broadcasts at any SF)
ALS_RANK = 8     #: latent dimensions
ALS_ITERS = 3    #: alternating sweeps
ALS_LAMBDA = 0.1  #: L2 regularization


def _init_item_factors() -> np.ndarray:
    """Deterministic item-factor init: a fixed rational lattice in
    [-0.5, 0.5) — no RNG anywhere, so every run (and every engine
    replay) trains the identical model."""
    j = np.arange(ALS_ITEMS)[:, None] + 1
    f = np.arange(ALS_RANK)[None, :] + 1
    return ((j * f) % 97) / 97.0 - 0.5


def _solve_side(ratings, key_col, other_col, other_factors, spark):
    """One ALS half-sweep: for each `key_col` entity, ridge-solve its
    factor against the fixed `other` side.  other_factors is a
    {id: vector} broadcast (bounded: items always; users only appear
    as the DISTRIBUTED join side).  Rows are sorted inside each group
    so float sums are order-deterministic."""
    bc = spark.sparkContext.broadcast(other_factors)

    out_schema = StructType(
        [StructField("id", LongType())]
        + [StructField(f"f{i}", DoubleType()) for i in range(ALS_RANK)]
    )

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        fac = bc.value
        pdf = pdf.sort_values(other_col)
        V = np.stack([fac[o] for o in pdf[other_col].values])
        r = pdf["rating"].values.astype(np.float64)
        A = V.T @ V + ALS_LAMBDA * len(r) * np.eye(ALS_RANK)
        u = np.linalg.solve(A, V.T @ r)
        row = {"id": [int(pdf[key_col].iloc[0])]}
        for i in range(ALS_RANK):
            row[f"f{i}"] = [float(u[i])]
        return pd.DataFrame(row)

    return (
        ratings.groupBy(key_col)
        .applyInPandas(solve, out_schema)
        .collect()
    )


def q_iter_als_topitems(spark, sf_dir, iters=ALS_ITERS):
    """ALS matrix factorization (implicit co-purchase strength) over the
    top-64 parts: rating(u, i) = total quantity customer u ordered of
    part i; 3 alternating ridge sweeps at rank 8, deterministic lattice
    init, no RNG.  Outputs the trained ITEM factors with per-item
    training RMSE — the model artifact a recommender pipeline ships.

    Scale shape: the item side is BOUNDED by construction (top-k
    popularity cut → its factor matrix broadcasts), the user side is
    unbounded and stays DISTRIBUTED — each half-sweep is one
    groupBy(entity).applyInPandas ridge solve (8×8 normal equations per
    group, rows sorted for order-deterministic float sums).  User
    factors are collected here only because the item side needs them as
    a broadcast for the NEXT half-sweep — at 100 TB the V-step instead
    joins user factors to ratings and groups by item (both distributed),
    which this key's item-grouped solve already demonstrates.  Rows-only
    key (a trained float artifact SQL can't replay); pytest pins
    convergence (RMSE strictly decreases) and run-to-run determinism."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem")
    o = spark.table("orders")
    top = (
        li.groupBy("l_partkey")
        .agg(F.sum("l_quantity").alias("pop"))
        .orderBy(F.col("pop").desc(), "l_partkey")
        .limit(ALS_ITEMS)
        .select("l_partkey")
    )
    ratings = (
        li.join(F.broadcast(top), "l_partkey")
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("user"),
            F.col("l_partkey").alias("item"),
        )
        .agg(F.sum("l_quantity").cast("double").alias("rating"))
        .localCheckpoint(eager=True)
    )
    item_ids = sorted(r["l_partkey"] for r in top.collect())
    V0 = _init_item_factors()
    item_fac = {iid: V0[k] for k, iid in enumerate(item_ids)}

    for _ in range(iters):
        u_rows = _solve_side(ratings, "user", "item", item_fac, spark)
        user_fac = {
            r["id"]: np.array([r[f"f{i}"] for i in range(ALS_RANK)])
            for r in u_rows
        }
        i_rows = _solve_side(ratings, "item", "user", user_fac, spark)
        item_fac = {
            r["id"]: np.array([r[f"f{i}"] for i in range(ALS_RANK)])
            for r in i_rows
        }

    bc_u = spark.sparkContext.broadcast(user_fac)
    bc_i = spark.sparkContext.broadcast(item_fac)

    err_schema = StructType(
        [
            StructField("item", LongType()),
            StructField("n_ratings", LongType()),
            StructField("rmse", DoubleType()),
        ]
    )

    def per_item_err(pdf: pd.DataFrame) -> pd.DataFrame:
        uf, itf = bc_u.value, bc_i.value
        pdf = pdf.sort_values("user")
        v = itf[int(pdf["item"].iloc[0])]
        U = np.stack([uf[u] for u in pdf["user"].values])
        pred = U @ v
        err = pdf["rating"].values - pred
        return pd.DataFrame(
            {
                "item": [int(pdf["item"].iloc[0])],
                "n_ratings": [len(pdf)],
                "rmse": [float(np.sqrt((err**2).mean()))],
            }
        )

    errs = ratings.groupBy("item").applyInPandas(per_item_err, err_schema)
    fac_rows = [
        (int(iid), *[round(float(x), 4) for x in item_fac[iid][:4]])
        for iid in item_ids
    ]
    fac_df = spark.createDataFrame(
        fac_rows, ["item", "f0", "f1", "f2", "f3"]
    )
    return errs.join(fac_df, "item").select(
        "item",
        "n_ratings",
        F.round("rmse", 4).alias("rmse"),
        "f0",
        "f1",
        "f2",
        "f3",
    )


QUERIES = {"iter_als_topitems": q_iter_als_topitems}

# rows-only: trained float artifact — tests/test_r6o_ops.py pins
# convergence (RMSE decreases over sweeps) and determinism
ORACLES: dict[str, str] = {}
