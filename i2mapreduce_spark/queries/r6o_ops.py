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

_FCOLS = [f"f{i}" for i in range(ALS_RANK)]

_FAC_SCHEMA = StructType(
    [StructField("id", LongType())]
    + [StructField(c, DoubleType()) for c in _FCOLS]
)


def _init_item_factors() -> np.ndarray:
    """Deterministic item-factor init: a fixed rational lattice in
    [-0.5, 0.5) — no RNG anywhere, so every run (and every engine
    replay) trains the identical model."""
    j = np.arange(ALS_ITEMS)[:, None] + 1
    f = np.arange(ALS_RANK)[None, :] + 1
    return ((j * f) % 97) / 97.0 - 0.5


def _ridge(V: np.ndarray, r: np.ndarray) -> np.ndarray:
    A = V.T @ V + ALS_LAMBDA * len(r) * np.eye(ALS_RANK)
    return np.linalg.solve(A, V.T @ r)


def _solve_users(ratings, item_fac, spark):
    """U half-sweep: per-user ridge solve against the BROADCAST item
    factors (the item side is bounded by the top-k cut).  Returns a
    DISTRIBUTED (user, f0..f7) frame — user factors never land on the
    driver.  Rows sort inside each group so float sums are
    order-deterministic under any partitioning."""
    bc = spark.sparkContext.broadcast(item_fac)

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        fac = bc.value
        pdf = pdf.sort_values("item")
        V = np.stack([fac[i] for i in pdf["item"].values])
        u = _ridge(V, pdf["rating"].values.astype(np.float64))
        row = {"id": [int(pdf["user"].iloc[0])]}
        for i, c in enumerate(_FCOLS):
            row[c] = [float(u[i])]
        return pd.DataFrame(row)

    return (
        ratings.groupBy("user")
        .applyInPandas(solve, _FAC_SCHEMA)
        .withColumnRenamed("id", "user")
        .localCheckpoint(eager=True)
    )


def _solve_items(ratings, user_fac_df):
    """V half-sweep, FULLY DISTRIBUTED: user factors join onto the
    ratings (both sides shuffle on `user`), then one
    groupBy(item).applyInPandas ridge solve per item — no collect of
    the unbounded user side anywhere; only the resulting ITEM factors
    (bounded by the top-k cut) ever reach the driver."""
    joined = ratings.join(user_fac_df, "user")

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("user")
        U = pdf[_FCOLS].to_numpy(dtype=np.float64)
        v = _ridge(U, pdf["rating"].values.astype(np.float64))
        row = {"id": [int(pdf["item"].iloc[0])]}
        for i, c in enumerate(_FCOLS):
            row[c] = [float(v[i])]
        return pd.DataFrame(row)

    rows = joined.groupBy("item").applyInPandas(solve, _FAC_SCHEMA).collect()
    return {r["id"]: np.array([r[c] for c in _FCOLS]) for r in rows}


def q_iter_als_topitems(spark, sf_dir, iters=ALS_ITERS):
    """ALS matrix factorization (implicit co-purchase strength) over the
    top-64 parts: rating(u, i) = total quantity customer u ordered of
    part i; 3 alternating ridge sweeps at rank 8, deterministic lattice
    init, no RNG.  Outputs the trained ITEM factors with per-item
    training RMSE — the model artifact a recommender pipeline ships.

    Scale shape: the item side is BOUNDED by construction (top-k
    popularity cut → its 64×8 factor matrix broadcasts), the user side
    is unbounded and stays DISTRIBUTED end-to-end — the U-step is a
    per-user grouped solve against broadcast item factors, the V-step
    joins the user-factor frame to the ratings and groups by item, and
    only item factors (bounded) are ever collected.  In-group rows sort
    before each solve, so float sums are order-deterministic under any
    partitioning.  Rows-only key (a trained float artifact SQL can't
    replay); pytest pins convergence (RMSE strictly decreases over
    sweeps) and bit-identical retrains."""
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

    user_fac_df = None
    for _ in range(iters):
        user_fac_df = _solve_users(ratings, item_fac, spark)
        item_fac = _solve_items(ratings, user_fac_df)

    bc_i = spark.sparkContext.broadcast(item_fac)

    err_schema = StructType(
        [
            StructField("item", LongType()),
            StructField("n_ratings", LongType()),
            StructField("rmse", DoubleType()),
        ]
    )

    def per_item_err(pdf: pd.DataFrame) -> pd.DataFrame:
        itf = bc_i.value
        pdf = pdf.sort_values("user")
        v = itf[int(pdf["item"].iloc[0])]
        U = pdf[_FCOLS].to_numpy(dtype=np.float64)
        err = pdf["rating"].values - U @ v
        return pd.DataFrame(
            {
                "item": [int(pdf["item"].iloc[0])],
                "n_ratings": [len(pdf)],
                "rmse": [float(np.sqrt((err**2).mean()))],
            }
        )

    errs = (
        ratings.join(user_fac_df, "user")
        .groupBy("item")
        .applyInPandas(per_item_err, err_schema)
    )
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
