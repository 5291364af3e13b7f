"""Synthesize a Zipf-SKEWED 10x stress fixture for the scale sweep.

The r7 sf1 fixture (tools/make_sf1.py) scales VOLUME 10x but keeps every
key distribution uniform; real 100 TB corpora are Zipf-skewed, and the
skew-handling keys (`mr_salted_skew_agg`, `join_skew_salted`) had never
been exercised at the scale they exist for (r7 verdict item 4).  This
tool derives a skewed variant FROM the sf1 fixture:

- lineitem: 20% of rows (chosen by a deterministic hash of
  (l_orderkey, l_linenumber)) have l_partkey remapped onto the 1% of
  partkeys divisible by 100, Zipf(s=1.2)-distributed over those 200 hot
  keys — the hottest partkey ends up with ~1.5% of ALL lineitem rows
  (~90k at sf1 vs a uniform mean of 300: a 300x hot key).  l_suppkey is
  remapped consistently (hot part i -> supplier (i*100) % max_supp) so
  part-supplier co-joins stay FK-valid.
- events: same treatment for user_id onto the 1% of user ids divisible
  by 100 — sessionization/window keys see one user with ~1.5% of all
  events.
- every other table is copied as-is (same layout; catalog-compatible).

All remapping is JVM-side: the Zipf inverse-CDF is a 1000-row broadcast
lookup table (bucket -> hot key), joined on hash(row) % 1000 — no Python
in the row path.

Usage:  python tools/make_skew.py [src_dir] [out_dir]
        (defaults /tmp/testdata/sf1 -> /tmp/testdata/sf1skew)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from i2mapreduce_spark.session import get_spark  # noqa: E402

HOT_FRACTION = 0.20   #: share of rows remapped onto hot keys
HOT_MODULUS = 100     #: keys divisible by this are the hot 1%
ZIPF_S = 1.2          #: Zipf exponent over the hot-key ranks
N_BUCKETS = 1000      #: inverse-CDF lookup granularity

COPY_TABLES = ["region", "nation", "customer", "supplier", "part",
               "orders", "documents", "embeddings"]


def _zipf_lookup(spark, hot_keys: list[int]):
    """(bucket -> hot key) rows realizing the Zipf(s) inverse CDF over
    the given keys, hottest first."""
    weights = [1.0 / (r + 1) ** ZIPF_S for r in range(len(hot_keys))]
    total = sum(weights)
    rows, b = [], 0
    acc = 0.0
    for key, w in zip(hot_keys, weights):
        acc += w / total
        while b < N_BUCKETS and (b + 0.5) / N_BUCKETS <= acc:
            rows.append((b, key))
            b += 1
    while b < N_BUCKETS:  # float-tail rounding
        rows.append((b, hot_keys[-1]))
        b += 1
    return spark.createDataFrame(rows, "bucket int, hot_key long")


def _skew_column(df, key_col: str, hash_cols: list[str], lookup, extra=None):
    """Remap `key_col` of HOT_FRACTION of rows (deterministic hash
    selection) through the broadcast Zipf lookup."""
    h = F.abs(F.xxhash64(*[F.col(c) for c in hash_cols]))
    df = df.withColumn("__u", h % 1_000_000).withColumn(
        "bucket", ((h / F.lit(1_000_000)).cast("long") % N_BUCKETS).cast("int")
    )
    df = df.join(F.broadcast(lookup), "bucket")
    is_hot = F.col("__u") < int(HOT_FRACTION * 1_000_000)
    df = df.withColumn(key_col, F.when(is_hot, F.col("hot_key")).otherwise(F.col(key_col)))
    if extra is not None:  # consistent secondary remap (e.g. l_suppkey)
        name, expr = extra
        df = df.withColumn(name, F.when(is_hot, expr).otherwise(F.col(name)))
    return df.drop("__u", "bucket", "hot_key")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata/sf1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/testdata/sf1skew"
    os.makedirs(out, exist_ok=True)
    spark = get_spark(app_name="i2mr-make-skew", shuffle_partitions=32)

    for name in COPY_TABLES:
        df = spark.read.parquet(f"{src}/{name}.parquet")
        df.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        print(f"{name}: copied", flush=True)

    part = spark.read.parquet(f"{src}/part.parquet")
    supp = spark.read.parquet(f"{src}/supplier.parquet")
    hot_parts = sorted(
        r[0] for r in part.filter(F.col("p_partkey") % HOT_MODULUS == 0)
        .select("p_partkey").collect()
    )
    max_supp = supp.agg(F.max("s_suppkey")).first()[0] + 1
    li = spark.read.parquet(f"{src}/lineitem.parquet")
    li_skew = _skew_column(
        li, "l_partkey", ["l_orderkey", "l_linenumber"],
        _zipf_lookup(spark, hot_parts),
        extra=("l_suppkey", (F.col("hot_key") % F.lit(max_supp))),
    )
    li_skew.repartition(16, "l_orderkey").write.mode("overwrite").parquet(
        f"{out}/lineitem.parquet"
    )
    top = (
        li_skew.groupBy("l_partkey").count().orderBy(F.col("count").desc()).first()
    )
    print(f"lineitem: skewed; hottest partkey {top[0]} has {top[1]} rows "
          f"of {li_skew.count()}", flush=True)

    ev = spark.read.parquet(f"{src}/events.parquet")
    hot_users = sorted(
        r[0] for r in ev.filter(F.col("user_id") % HOT_MODULUS == 0)
        .select("user_id").distinct().collect()
    )
    ev_skew = _skew_column(
        ev, "user_id", ["event_id"], _zipf_lookup(spark, hot_users)
    )
    ev_skew.repartition(16, "event_id").write.mode("overwrite").parquet(
        f"{out}/events.parquet"
    )
    topu = ev_skew.groupBy("user_id").count().orderBy(F.col("count").desc()).first()
    print(f"events: skewed; hottest user {topu[0]} has {topu[1]} rows "
          f"of {ev_skew.count()}", flush=True)
    print(f"skew fixture at {out}")


if __name__ == "__main__":
    main()
