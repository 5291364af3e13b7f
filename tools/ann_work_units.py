"""Work-unit accounting for the ANN scale path (r11 verdict item 4).

sim_ann_lsh read 93.3 s at sf100 (4.8x/decade) — the worst in-gate
decade ratio.  This tool separates the components that MUST grow with
the corpus (output contract = k rows per member, the duplicate-collapse
shuffle over all N members) from the candidate volume inside the LSH
kernel (which runs on collapsed-unique representatives and must stay
~linear in uniques via the planes autoscale).  A super-linear candidate
count here is the signal to tighten banding; linear-or-flat counts
adjudicate the wall-clock ratio as contract growth, not algorithmic
blow-up.

Usage: python tools/ann_work_units.py <sf_dir> [<sf_dir> ...]
Prints one table row per sf_dir; measurement-only (no query-path code).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from i2mapreduce_spark.catalog import load_tables  # noqa: E402
from i2mapreduce_spark.operators import similarity  # noqa: E402
from i2mapreduce_spark.session import get_spark  # noqa: E402


def counts_for(spark, sf_dir: str) -> dict:
    load_tables(spark, sf_dir)
    emb = spark.table("embeddings")
    n_total = emb.count()
    keyed = emb.filter(F.col("embedding").isNotNull()).select(
        F.col("vec_id"), F.md5(F.to_json(F.col("embedding"))).alias("gid")
    )
    grp = keyed.groupBy("gid").agg(F.count("*").alias("gsize"))
    gstats = grp.agg(
        F.count("*").alias("uniq"), F.max("gsize").alias("max_gsize")
    ).collect()[0]
    n_uniq, max_gsize = gstats["uniq"], gstats["max_gsize"]

    # knobs exactly as the kernel resolves them on the UNIQUE count
    n_planes = max(8, int(n_uniq).bit_length() - 3)
    n_flip = max(0, n_planes - 8)
    n_tables = 16

    # rep-level candidate pairs: rebuild the kernel's candidate stage on
    # one representative per group (same signature fan-out) and count
    reps = (
        emb.filter(F.col("embedding").isNotNull())
        .withColumn("gid", F.md5(F.to_json(F.col("embedding"))))
        .groupBy("gid")
        .agg(F.min("vec_id").alias("vec_id"),
             F.first("embedding").alias("embedding"))
        .select("vec_id", "embedding")
    )
    rng = np.random.default_rng(42)
    probe_row = reps.select("embedding").first()
    if probe_row is None:
        return {"sf_dir": sf_dir, "n_total": n_total, "n_uniq": 0}
    dim = len(probe_row[0])
    planes = rng.standard_normal((n_tables, n_planes, dim))
    bc = spark.sparkContext.broadcast(planes)

    def signatures(batches):
        pl = bc.value
        w = 1 << np.arange(pl.shape[1])
        for pdf in batches:
            if len(pdf) == 0:
                continue
            A = np.stack(pdf["embedding"].values).astype(np.float64)
            ids = pdf["vec_id"].values
            T = pl.shape[0]
            proj = np.einsum("nd,tpd->tnp", A, pl)
            home = (proj > 0).dot(w)
            out_ids = [np.tile(ids, T)]
            out_tbl = [np.repeat(np.arange(T, dtype=np.int32), len(ids))]
            out_bkt = [home.reshape(-1)]
            out_prb = [np.zeros(T * len(ids), dtype=bool)]
            if n_flip:
                order = np.argsort(np.abs(proj), axis=2,
                                   kind="stable")[:, :, :n_flip]
                flips = home[:, :, None] ^ w[order]
                out_ids.append(np.tile(np.repeat(ids, n_flip), T))
                out_tbl.append(np.repeat(np.arange(T, dtype=np.int32),
                                         len(ids) * n_flip))
                out_bkt.append(flips.reshape(-1))
                out_prb.append(np.ones(T * len(ids) * n_flip, dtype=bool))
            yield pd.DataFrame({
                "vec_id": np.concatenate(out_ids),
                "table": np.concatenate(out_tbl),
                "bucket": np.concatenate(out_bkt),
                "is_probe": np.concatenate(out_prb),
            })

    sig = reps.mapInPandas(
        signatures, schema="vec_id long, table int, bucket long, is_probe boolean"
    )
    members = sig.filter(~F.col("is_probe")).drop("is_probe")
    probes = sig.drop("is_probe")
    a, b = probes.alias("a"), members.alias("b")
    raw_pairs = a.join(
        b,
        (F.col("a.table") == F.col("b.table"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") != F.col("b.vec_id")),
    ).count()
    cand_pairs = (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(
            F.least("a.vec_id", "b.vec_id").alias("vec_id"),
            F.greatest("a.vec_id", "b.vec_id").alias("nbr"),
        )
        .dropDuplicates(["vec_id", "nbr"])
        .count()
    )
    out_rows = similarity.cosine_topk_lsh(spark, emb, k=5).count()
    return {
        "sf_dir": sf_dir,
        "n_total": n_total,
        "n_uniq": n_uniq,
        "max_gsize": max_gsize,
        "n_planes": n_planes,
        "n_flip": n_flip,
        "sig_rows": n_uniq * n_tables * (1 + n_flip),
        "raw_bucket_pairs": raw_pairs,
        "cand_pairs_deduped": cand_pairs,
        "output_rows": out_rows,
    }


def main() -> None:
    spark = get_spark(app_name="ann-work-units")
    rows = [counts_for(spark, d) for d in sys.argv[1:]]
    cols = ["sf_dir", "n_total", "n_uniq", "max_gsize", "n_planes",
            "n_flip", "sig_rows", "raw_bucket_pairs",
            "cand_pairs_deduped", "output_rows"]
    print("\t".join(cols))
    for r in rows:
        print("\t".join(str(r.get(c, "")) for c in cols))


if __name__ == "__main__":
    main()
