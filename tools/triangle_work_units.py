"""Exact work-unit counts for iter_triangle_count (r12).

The triangle kernel (queries/iterative.py::q_iter_triangle_count) joins
each oriented edge against BOTH endpoints' sorted out-neighbor arrays
and intersects JVM-side — so its shuffle volume and intersection work
are Sum over oriented edges of |N+(src)| + |N+(dst)| array entries
(NOT the materialized-wedge row count; that form was measured worse in
r7).  This counter computes that sum with two narrow degree joins (no
arrays travel), so it runs cheaply at any SF and separates
data-volume growth (edges, work units) from host limits (a local disk
that cannot hold the leg's spill).

Usage: python tools/triangle_work_units.py /tmp/testdata/sf10 [...]
Prints one JSON line per sf_dir.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from i2mapreduce_spark.catalog import load_tables  # noqa: E402
from i2mapreduce_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark(app_name="triangle-work-units")
    for sf_dir in sys.argv[1:]:
        load_tables(spark, sf_dir)
        e = spark.table("edges_pp").filter(F.col("src") < F.col("dst"))
        deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
        work = (
            e.join(deg.withColumnRenamed("src", "u"), F.col("src") == F.col("u"))
            .withColumnRenamed("d", "du")
            .join(deg.withColumnRenamed("src", "v"), F.col("dst") == F.col("v"),
                  "left")
            .withColumnRenamed("d", "dv")
            .agg(
                F.count(F.lit(1)).alias("oriented_edges"),
                F.sum(F.col("du") + F.coalesce(F.col("dv"), F.lit(0)))
                .alias("array_entries_shuffled"),
                F.max(F.greatest(F.col("du"), F.coalesce(F.col("dv"), F.lit(0))))
                .alias("max_adj_width"),
            )
            .collect()[0]
        )
        print(json.dumps({
            "sf_dir": sf_dir,
            "oriented_edges": work["oriented_edges"],
            "array_entries_shuffled": work["array_entries_shuffled"],
            "max_adj_width": work["max_adj_width"],
        }), flush=True)


if __name__ == "__main__":
    main()
