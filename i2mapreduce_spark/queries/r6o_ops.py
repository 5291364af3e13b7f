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
    driver.

    BATCHED, not per-group: ratings arrive hash-partitioned on `user`
    (set once at build time) and sorted within partitions, so one
    mapInPandas pass solves EVERY user in an Arrow batch with a single
    batched ``np.linalg.solve`` over segment sums (``np.add.reduceat``)
    — the per-group pandas overhead of groupBy().applyInPandas was 4ms
    x n_users, 11s of a 25s run at sf0.1 for ~50us of actual solve
    work per user.  A user whose rows straddle an Arrow batch boundary
    is carried into the next batch (partitioning guarantees all their
    rows share the partition).  Rows are pre-sorted by (user, item), so
    the in-order segment sums are order-deterministic under any
    partitioning."""
    ids = sorted(item_fac)
    idx = {iid: k for k, iid in enumerate(ids)}
    Vmat = np.stack([item_fac[iid] for iid in ids])
    bc = spark.sparkContext.broadcast((idx, Vmat))
    eye = ALS_LAMBDA * np.eye(ALS_RANK)

    def solve_batches(batches):
        ix, V = bc.value

        def solve_block(users, items, r):
            starts = np.r_[0, 1 + np.flatnonzero(users[1:] != users[:-1])]
            counts = np.diff(np.r_[starts, len(users)])
            Vr = V[[ix[i] for i in items]]
            b = np.add.reduceat(Vr * r[:, None], starts, axis=0)
            A = np.add.reduceat(
                np.einsum("ni,nj->nij", Vr, Vr).reshape(len(users), -1),
                starts, axis=0,
            ).reshape(-1, ALS_RANK, ALS_RANK)
            A += counts[:, None, None] * eye
            u = np.linalg.solve(A, b)
            out = {"user": users[starts]}
            for i, c in enumerate(_FCOLS):
                out[c] = u[:, i]
            return pd.DataFrame(out)

        carry = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if len(pdf) == 0:
                continue
            users = pdf["user"].values
            # hold back the last user: their rows may continue in the
            # next Arrow batch of this partition
            tail = users == users[-1]
            carry = pdf[tail]
            head = pdf[~tail]
            if len(head):
                yield solve_block(
                    head["user"].values, head["item"].values,
                    head["rating"].values.astype(np.float64),
                )
        if carry is not None and len(carry):
            yield solve_block(
                carry["user"].values, carry["item"].values,
                carry["rating"].values.astype(np.float64),
            )

    return ratings.sortWithinPartitions("user", "item").mapInPandas(
        solve_batches, "user long, " + ", ".join(f"{c} double" for c in _FCOLS)
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
    # NULL keys are not entities: a NULL l_partkey is not an item (and
    # would crash the sorted() over collected item ids), a NULL
    # o_custkey is not a user — both drop before the ratings matrix
    top = (
        li.filter(F.col("l_partkey").isNotNull())
        .groupBy("l_partkey")
        .agg(F.sum("l_quantity").alias("pop"))
        .orderBy(F.col("pop").desc(), "l_partkey")
        .limit(ALS_ITEMS)
        .select("l_partkey")
    )
    # Projector-style co-partitioning (plans/iterate.py): the ratings
    # frame is grouped/joined on `user` SEVEN times across the sweeps
    # (3 U-solves, 3 V-step joins, 1 error pass) — repartition it on
    # `user` ONCE before the checkpoint so the checkpointed LogicalRDD
    # carries hashpartitioning(user) and every downstream
    # groupBy(user)/join(user) reuses the exchange instead of
    # re-shuffling the big side per sweep (r7 verdict item 5).
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ratings = (
        li.join(F.broadcast(top), "l_partkey")
        .join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("o_custkey").isNotNull())
        .groupBy(
            F.col("o_custkey").alias("user"),
            F.col("l_partkey").alias("item"),
        )
        .agg(F.sum("l_quantity").cast("double").alias("rating"))
        .repartition(n_part, "user")
        .localCheckpoint(eager=True)
    )
    item_ids = sorted(r["l_partkey"] for r in top.collect())
    # empty ratings matrix (no items, or no lineitem⋈orders matches at
    # all): nothing to factorize, no model to ship.  The limit(1) probe
    # is a narrow read of the already-checkpointed frame.
    if not item_ids or ratings.limit(1).count() == 0:
        return spark.createDataFrame(
            [],
            "item long, n_ratings long, rmse double, "
            "f0 double, f1 double, f2 double, f3 double",
        )
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
