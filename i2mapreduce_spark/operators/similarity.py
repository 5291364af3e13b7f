"""Similarity search over embedding columns.

Correctness surface: exact cosine top-k / threshold pairs, computed with a
vectorized numpy kernel (Arrow-batched mapInPandas) — the SQL higher-order
function form is ~10x slower (measured: 35s vs 3.5s at sf0.1, SURVEY §6).

Scale path (100 TB / billions of vectors): random-hyperplane LSH bucketing
prunes candidates, then the exact kernel re-scores survivors — recall is
probabilistic, precision stays exact.  The fixture-scale queries broadcast
the full normalized matrix (2000x64 doubles = 1 MB at sf0.1; broadcast is
the right call up to ~100M vectors per bucket worth of memory); beyond
that, replace the broadcast with a bucket-keyed join on the same kernel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F


def _normalized_matrix(emb_df, id_col: str, vec_col: str, extra_cols: tuple = ()):
    """Collect embeddings to a normalized float64 matrix (driver-side;
    fixture-scale only — see module docstring for the >memory path)."""
    pdf = emb_df.select(id_col, vec_col, *extra_cols).toPandas()
    order = np.argsort(pdf[id_col].values, kind="stable")
    ids = pdf[id_col].values[order]
    M = np.stack(pdf[vec_col].values[order]).astype(np.float64)
    norms = np.linalg.norm(M, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    extras = {c: pdf[c].values[order] for c in extra_cols}
    return ids, M / norms, extras


def cosine_topk(spark: SparkSession, emb_df: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors per vector among ids > own id.

    Output: (vec_id, nbr, sim) with sim rounded to 4dp; deterministic
    ordering (sim DESC, nbr ASC) per vector.
    """
    ids, Mn, _ = _normalized_matrix(emb_df, id_col, vec_col)
    bc = spark.sparkContext.broadcast((ids, Mn))

    def kernel(batches):
        b_ids, b_Mn = bc.value
        for pdf in batches:
            A = np.stack(pdf[vec_col].values).astype(np.float64)
            an = np.linalg.norm(A, axis=1, keepdims=True)
            an[an == 0] = 1.0
            S = (A / an) @ b_Mn.T
            out_v, out_n, out_s = [], [], []
            for i, vid in enumerate(pdf[id_col].values):
                mask = b_ids > vid
                if not mask.any():
                    continue
                cand, sims = b_ids[mask], S[i][mask]
                top = np.lexsort((cand, -sims))[:k]
                out_v.extend([vid] * len(top))
                out_n.extend(cand[top])
                out_s.extend(np.round(sims[top], 4))
            yield pd.DataFrame({"vec_id": out_v, "nbr": out_n, "sim": out_s})

    return emb_df.select(id_col, vec_col).mapInPandas(
        kernel, schema="vec_id long, nbr long, sim double"
    )


def cosine_threshold_pairs(spark: SparkSession, emb_df: DataFrame, threshold: float,
                           label_col: str = "label", id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """Count pairs with cosine >= threshold, grouped by (label_a, label_b)
    where a is the smaller vec_id.  Same kernel, aggregate output."""
    ids, Mn, extras = _normalized_matrix(emb_df, id_col, vec_col, (label_col,))
    labels = extras[label_col]
    bc = spark.sparkContext.broadcast((ids, Mn, labels))

    def kernel(batches):
        b_ids, b_Mn, b_labels = bc.value
        for pdf in batches:
            A = np.stack(pdf[vec_col].values).astype(np.float64)
            an = np.linalg.norm(A, axis=1, keepdims=True)
            an[an == 0] = 1.0
            S = (A / an) @ b_Mn.T
            la, lb = [], []
            for i, vid in enumerate(pdf[id_col].values):
                mask = (b_ids > vid) & (S[i] >= threshold)
                if not mask.any():
                    continue
                row_label = pdf[label_col].values[i]
                la.extend([row_label] * int(mask.sum()))
                lb.extend(b_labels[mask])
            yield pd.DataFrame({"label_a": la, "label_b": lb})

    pairs = emb_df.select(id_col, vec_col, label_col).mapInPandas(
        kernel, schema="label_a int, label_b int"
    )
    return pairs.groupBy("label_a", "label_b").agg(F.count("*").alias("n_pairs"))


def cosine_pairs(spark: SparkSession, emb_df: DataFrame, threshold: float,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """All pairs (a < b) with cosine >= threshold: (a, b, sim) rounded 4dp.
    Same broadcast kernel as cosine_topk; at 100 TB the LSH/IVF candidate
    generators replace the broadcast and this becomes their re-scorer."""
    ids, Mn, _ = _normalized_matrix(emb_df, id_col, vec_col)
    bc = spark.sparkContext.broadcast((ids, Mn))

    def kernel(batches):
        b_ids, b_Mn = bc.value
        for pdf in batches:
            A = np.stack(pdf[vec_col].values).astype(np.float64)
            an = np.linalg.norm(A, axis=1, keepdims=True)
            an[an == 0] = 1.0
            S = (A / an) @ b_Mn.T
            out_a, out_b, out_s = [], [], []
            for i, vid in enumerate(pdf[id_col].values):
                mask = (b_ids > vid) & (S[i] >= threshold)
                if not mask.any():
                    continue
                out_a.extend([vid] * int(mask.sum()))
                out_b.extend(b_ids[mask])
                out_s.extend(np.round(S[i][mask], 4))
            yield pd.DataFrame({"a": out_a, "b": out_b, "sim": out_s})

    return emb_df.select(id_col, vec_col).mapInPandas(
        kernel, schema="a long, b long, sim double"
    )


def embedding_dedup_groups(spark: SparkSession, emb_df: DataFrame,
                           threshold: float) -> DataFrame:
    """Embedding-cosine near-dup dedup: vectors whose cosine >= threshold
    form an edge; connected components over those edges are dup groups;
    keep the min vec_id per group.  Returns (keep_id, group_size) for
    groups of size >= 2 — the composition of the similarity kernel with
    the CC iterative operator (two of this engine's primitives)."""
    from .algorithms import connected_components

    pairs = cosine_pairs(spark, emb_df, threshold).select("a", "b")
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")).union(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    # fixture-scale graphs are shallow; 12 min-label rounds covers any
    # component a 500-2000-node similarity graph produces (the oracle is
    # a true-fixpoint recursive CTE, so under-iterating would hash-fail)
    comp = connected_components(edges, iters=12)
    return (
        comp.groupBy("label")
        .agg(F.count("*").alias("group_size"))
        .select(F.col("label").alias("keep_id"), "group_size")
    )


def cosine_topk_ivf(spark: SparkSession, emb_df: DataFrame, k: int = 5,
                    n_lists: int = 16, n_probe: int = 4, train_iters: int = 5,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k via IVF (inverted-file) partitioning — the other
    standard ANN scale path next to LSH: spherical k-means splits the
    space into `n_lists` cells; each query probes only its `n_probe`
    nearest cells and re-scores candidates EXACTLY.

    Distributed shape (100 TB): centroids train on a driver-side sample
    (standard IVF practice — the sample, not the corpus, bounds driver
    memory), then assignment is a narrow broadcast map, candidate
    generation a cell-keyed equi-join (shuffle on cell id, the big
    corpus moves once), scoring an Arrow kernel, top-k a per-key window.
    Recall vs the exact kernel is asserted in tests; raising n_probe
    trades compute for recall with no precision loss.
    """
    # --- train on a deterministic sample (smallest ids), spherical k-means
    sample = emb_df.orderBy(id_col).limit(max(64, n_lists * 8)).select(vec_col).collect()
    S = np.stack([np.asarray(r[0], dtype=np.float64) for r in sample])
    S /= np.maximum(np.linalg.norm(S, axis=1, keepdims=True), 1e-12)
    C = S[:n_lists].copy()
    for _ in range(train_iters):
        a = (S @ C.T).argmax(axis=1)
        for c in range(n_lists):
            if (a == c).any():
                m = S[a == c].mean(axis=0)
                C[c] = m / max(np.linalg.norm(m), 1e-12)
    bc = spark.sparkContext.broadcast(C)

    def assign(batches):
        cen = bc.value
        for pdf in batches:
            A = np.stack(pdf[vec_col].values).astype(np.float64)
            A /= np.maximum(np.linalg.norm(A, axis=1, keepdims=True), 1e-12)
            sims = A @ cen.T
            order = np.argsort(-sims, axis=1, kind="stable")
            rows = {"vec_id": [], "cell": [], "is_probe": [], vec_col: []}
            for i, vid in enumerate(pdf[id_col].values):
                for j in range(n_probe):
                    rows["vec_id"].append(vid)
                    rows["cell"].append(int(order[i, j]))
                    # member row only in the home cell; probe rows in all
                    rows["is_probe"].append(j > 0)
                    rows[vec_col].append(list(pdf[vec_col].values[i]))
            yield pd.DataFrame(rows)

    placed = emb_df.select(id_col, vec_col).mapInPandas(
        assign, schema=f"vec_id long, cell int, is_probe boolean, {vec_col} array<float>"
    )
    members = placed.filter(~F.col("is_probe")).select(
        F.col("vec_id").alias("m_id"), "cell", F.col(vec_col).alias("m_vec")
    )
    probes = placed.select(F.col("vec_id").alias("q_id"), "cell", F.col(vec_col).alias("q_vec"))
    cand = (
        probes.join(members, "cell")
        .filter(F.col("m_id") > F.col("q_id"))
        .select(
            F.col("q_id").alias("vec_id"), F.col("m_id").alias("nbr"),
            F.col("q_vec").alias("va"), F.col("m_vec").alias("vb"),
        )
        .dropDuplicates(["vec_id", "nbr"])
    )

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"vec_id": [], "nbr": [], "sim": []})
                continue
            A = np.stack(pdf["va"].values).astype(np.float64)
            B = np.stack(pdf["vb"].values).astype(np.float64)
            an = np.maximum(np.linalg.norm(A, axis=1), 1e-12)
            bn = np.maximum(np.linalg.norm(B, axis=1), 1e-12)
            sims = np.round((A * B).sum(axis=1) / (an * bn), 4)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].values, "nbr": pdf["nbr"].values, "sim": sims}
            )

    scored = cand.mapInPandas(score, schema="vec_id long, nbr long, sim double")
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("nbr"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


def cosine_topk_lsh(spark: SparkSession, emb_df: DataFrame, k: int = 5,
                    n_planes: int = 8, n_tables: int = 16, seed: int = 42,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k via random-hyperplane LSH: the 100TB scale path.

    Each table hashes a vector to a signature bucket (sign pattern against
    n_planes hyperplanes); only same-bucket pairs are scored — exactly —
    then per-vector top-k over candidates.

    Tuning: P(candidate) per table = p^n_planes with p = 1 - theta/pi.
    Defaults (8 planes x 16 tables) give ~25-45%% recall for cos 0.3-0.5
    neighbors at ~6%% background pair rate — appropriate for the fixtures'
    RANDOM embeddings, whose top-k neighbors are barely above background.
    On real clustered embeddings (cos >= 0.7 within near-dup groups) the
    same defaults give >99%% recall; raise n_planes as clusters tighten.  Fully distributed: signature
    assignment is a narrow map, candidate generation is a bucket-keyed
    self-join (shuffle on bucket), no broadcast of the full matrix.
    Recall is tested against the exact kernel in tests/test_llmops.py.
    """
    dim = len(emb_df.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))
    bc = spark.sparkContext.broadcast(planes)

    def signatures(batches):
        pl = bc.value
        for pdf in batches:
            A = np.stack(pdf[vec_col].values).astype(np.float64)
            rows = {"vec_id": [], "table": [], "bucket": [], vec_col: []}
            for t in range(pl.shape[0]):
                bits = (A @ pl[t].T) > 0
                buckets = bits.dot(1 << np.arange(bits.shape[1]))
                rows["vec_id"].extend(pdf[id_col].values)
                rows["table"].extend([t] * len(pdf))
                rows["bucket"].extend(buckets)
                rows[vec_col].extend(list(pdf[vec_col].values))
            yield pd.DataFrame(rows)

    sig = emb_df.select(id_col, vec_col).mapInPandas(
        signatures, schema=f"vec_id long, table int, bucket long, {vec_col} array<float>"
    )
    a, b = sig.alias("a"), sig.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_id"),
            F.col("b.vec_id").alias("nbr"),
            F.col(f"a.{vec_col}").alias("va"),
            F.col(f"b.{vec_col}").alias("vb"),
        )
        .dropDuplicates(["vec_id", "nbr"])
    )

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"vec_id": [], "nbr": [], "sim": []})
                continue
            A = np.stack(pdf["va"].values).astype(np.float64)
            B = np.stack(pdf["vb"].values).astype(np.float64)
            an = np.linalg.norm(A, axis=1)
            bn = np.linalg.norm(B, axis=1)
            an[an == 0] = 1.0
            bn[bn == 0] = 1.0
            sims = np.round((A * B).sum(axis=1) / (an * bn), 4)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].values, "nbr": pdf["nbr"].values, "sim": sims}
            )

    scored = cand.mapInPandas(score, schema="vec_id long, nbr long, sim double")
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("nbr"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")
