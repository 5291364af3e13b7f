"""Synthesize a ~sf1 stress fixture (10x sf0.1) for the scale sweep.

/root/testdata tops out at sf0.1 — 100x below the 100 TB design
narrative (r6 verdict item 3).  This tool manufactures a 10x dataset by
unioning 10 key-shifted copies of each SCALE table from sf0.1, writing
parquet with the SAME file layout the catalog expects
(`<out>/<table>.parquet`) so every registry key runs on it unchanged:

- dimension tables (region, nation) are fixed-size in TPC-H — copied.
- every copy i shifts each table's surrogate/foreign keys by
  i * ceil(max_key+1), so PK uniqueness AND join fan-out are preserved
  (an orders copy joins exactly its own lineitem copy, 10x rows, same
  per-key cardinality — the honest scale-up shape).
- events shifts event_id/user_id and staggers ts by i seconds so the
  time spine densifies (per-day counts grow 10x, day count stays put —
  matching how real traffic scales).
- documents/embeddings shift doc_id/vec_id; text/vectors repeat, which
  leaves dedup/similarity keys with 10x candidates per bucket — the
  WORST case for those kernels, which is what a stress sweep wants.

Usage:  python tools/make_sf1.py [out_dir] [--copies N] [--src DIR]
        (default /tmp/testdata/sf1, 10 copies of /root/testdata/sf0.1)

r9: --copies/--src generalize the same derivation one more decade —
`python tools/make_sf1.py /tmp/testdata/sf10 --copies 10 --src
/tmp/testdata/sf1` builds the ~sf10 canary fixture (strides re-derived
from the src's own max keys, so chained scale-ups stay join-consistent).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from i2mapreduce_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"   # overridable via --src
COPIES = 10                     # overridable via --copies

#: key DOMAINS: each domain's shift stride is derived once, from the
#: PK-OWNING table's max key, and applied to the PK and every
#: referencing FK alike.  (r7 advice: deriving each FK's stride from the
#: FK column's own max only stays join-consistent when every PK value
#: happens to appear as an FK — true of this fixture by luck, false on
#: stock TPC-H where a third of customers have no orders, which would
#: silently join copy-i orders to the wrong customer copy.)
DOMAINS = {
    "custkey": ("customer", "c_custkey"),
    "orderkey": ("orders", "o_orderkey"),
    "partkey": ("part", "p_partkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}

#: per-table integer id columns to shift per copy, mapped to their key
#: domain; nationkey/regionkey FKs point at fixed dims and stay put.
SHIFT_COLS = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey",
                 "l_suppkey": "suppkey"},
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}
COPY_TABLES = ["region", "nation"]


def _domain_strides(spark, src: str) -> dict[str, int]:
    strides = {}
    for dom, (table, pk) in DOMAINS.items():
        df = spark.read.parquet(f"{src}/{table}.parquet")
        strides[dom] = int(df.agg(F.max(pk)).first()[0]) + 1
    return strides


def _scaled(df: DataFrame, cols: dict[str, str], strides: dict[str, int],
            stagger_ts: bool, copies: int) -> DataFrame:
    parts = []
    for i in range(copies):
        p = df
        for c, dom in cols.items():
            p = p.withColumn(
                c, (F.col(c) + F.lit(i * strides[dom])).cast(df.schema[c].dataType)
            )
        if stagger_ts and i:
            p = p.withColumn(
                "ts", F.col("ts") + F.make_interval(secs=F.lit(float(i)))
            )
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    argv = sys.argv[1:]
    src, copies = SRC, COPIES
    if "--src" in argv:
        i = argv.index("--src"); src = argv[i + 1]; del argv[i:i + 2]
    if "--copies" in argv:
        i = argv.index("--copies"); copies = int(argv[i + 1]); del argv[i:i + 2]
    out_dir = argv[0] if argv else "/tmp/testdata/sf1"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="i2mr-make-sf1", shuffle_partitions=32)
    strides = _domain_strides(spark, src)
    print(f"domain strides: {strides}", flush=True)
    for name in COPY_TABLES:
        df = spark.read.parquet(f"{src}/{name}.parquet")
        df.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
        print(f"{name}: copied {df.count()} rows", flush=True)
    for name, cols in SHIFT_COLS.items():
        df = spark.read.parquet(f"{src}/{name}.parquet")
        big = _scaled(df, cols, strides, stagger_ts=(name == "events"),
                      copies=copies)
        # ~128MB-target files: repartition by first key so downstream
        # scans start from a sane layout, like a real sf1 export would
        first_key = next(iter(cols))
        big.repartition(16, first_key).write.mode("overwrite").parquet(
            f"{out_dir}/{name}.parquet"
        )
        print(f"{name}: {df.count()} -> {big.count()} rows", flush=True)
    print(f"scaled fixture ({copies}x {src}) at {out_dir}")


if __name__ == "__main__":
    main()
